"""Escalating serving path measured under load at 250k (VERDICT r4 #5).

Round 4 shipped the escalation-override POLICY with a cost *model* (rigid
4.6 ms + esc_rate x ~7x); the serving path itself (serve.MatchServer)
still served rigid-only. This measures the real thing: an
EscalatingMatchServer (PCM in, two dispatch classes — clean traffic never
queues behind scans host-side) under open-loop Poisson arrivals of a
production-shaped mix (default 80% in-tempo / 20% stretched ±3%), at
250k tracks on the real chip:

    python benchmarks/serve_escalating_250k.py [rate_qps ...]
        (default sweep: 25 50 100 150; 30 s per rate after warmup)

Reports per rate: achieved QPS, p50/p99 latency split by resolution class
(rigid-confident vs escalated), escalation rate on each traffic class,
top-1 accuracy by class, shed fraction. Artifacts reuse
/tmp/hpfw_real_cat/250000_60.
"""

import os
import sys
import threading
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.real_catalog import NOISE_DB, QUERY_SECONDS, paths
from benchmarks.robustness_250k import (N_Q, N_TRACKS, TRACK_S, _query_plan,
                                        _two_stage)
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth_jax
from hpfw_tpu.serve import EscalatingMatchServer

MIX_STRETCHED = 0.20
DURATION_S = 30.0
RATES = [25.0, 50.0, 100.0, 150.0]
N_UNIQUE = 100          # unique query PCMs per class, cycled


def _queries(cfg):
    """N_UNIQUE clean + N_UNIQUE stretched(+3%) PCM windows + truths."""
    truths, starts, nseeds = _query_plan()
    out = {}
    for name, stretch in [("clean", 1.0), ("stretch", 1.03)]:
        pcms = []
        for i in range(0, N_UNIQUE, 16):
            sl = slice(i, min(i + 16, N_UNIQUE))
            pcms.append(np.asarray(synth_jax.live_query_batch(
                truths[sl], starts[sl], TRACK_S, QUERY_SECONDS, cfg,
                stretch=stretch, noise_db=NOISE_DB, noise_seeds=nseeds[sl])))
        out[name] = (np.concatenate(pcms, axis=0), truths[:N_UNIQUE])
    return out


def run(rates=None):
    cfg = HpfwConfig.catalog_scale(stretch_span=0.03)
    d = paths(N_TRACKS, TRACK_S)
    filters = np.load(os.path.join(d, "filters.npy"))
    prints = np.load(os.path.join(d, "prints.npy"), mmap_mode="r")
    ts = _two_stage(cfg, prints, filters)
    qs = _queries(cfg)
    log("queries rendered")
    sg = os.environ.get("HPFW_SERVE_STRUCT")
    ou = os.environ.get("HPFW_OVERRIDE_UNSTRUCT")
    srv = EscalatingMatchServer(
        ts, filters, qs["clean"][0].shape[1], max_batch=16,
        max_wait_ms=5.0, depth=2, top_k=1, max_queue=512,
        rank_workers=4, structure_gate=float(sg) if sg else None,
        override_unstructured=float(ou) if ou is not None else None)
    t0 = time.time()
    srv.warmup(qs["clean"][0][0])
    log(f"server warm in {time.time() - t0:.0f}s "
        f"(V={len(srv.hyps)}, scan_batch={srv.scan_batch})")

    results = {}
    rng = np.random.default_rng(99)
    for rate in (rates or RATES):
        recs = []            # (class, escalated, correct, latency_s)
        lock = threading.Lock()
        shed = 0

        def submit_one(cls, idx):
            nonlocal shed
            pcm, truths = qs[cls]
            i = idx % N_UNIQUE
            t_sub = time.monotonic()

            def done(fut, cls=cls, truth=truths[i], t_sub=t_sub):
                nonlocal shed
                lat = time.monotonic() - t_sub
                try:
                    ids, sc, off, esc = fut.result()
                except Exception:
                    with lock:
                        shed += 1
                    return
                with lock:
                    recs.append((cls, esc, int(ids[0]) == truth, lat))

            srv.submit(pcm[i]).add_done_callback(done)

        n = int(rate * DURATION_S)
        gaps = rng.exponential(1.0 / rate, n)
        classes = rng.random(n) < MIX_STRETCHED
        t_start = time.monotonic()
        t_next = t_start
        for j in range(n):
            t_next += gaps[j]
            now = time.monotonic()
            if t_next > now:
                time.sleep(t_next - now)
            submit_one("stretch" if classes[j] else "clean", j)
        # drain
        deadline = time.monotonic() + 60.0
        while time.monotonic() < deadline:
            with lock:
                if len(recs) + shed >= n:
                    break
            time.sleep(0.2)
        wall = time.monotonic() - t_start
        row = {"offered_qps": rate, "achieved_qps": round(len(recs) / wall, 1),
               "shed_frac": round(shed / n, 4)}
        for cls in ("clean", "stretch"):
            sub = [r for r in recs if r[0] == cls]
            if not sub:
                continue
            lats = np.array([r[3] for r in sub]) * 1e3
            esc = np.mean([r[1] for r in sub])
            row[cls] = {
                "n": len(sub), "esc_rate": round(float(esc), 3),
                "top1": round(float(np.mean([r[2] for r in sub])), 3),
                "p50_ms": round(float(np.percentile(lats, 50)), 1),
                "p99_ms": round(float(np.percentile(lats, 99)), 1)}
            el = np.array([r[3] for r in sub if r[1]]) * 1e3
            if el.size:
                row[cls]["esc_p50_ms"] = round(float(np.percentile(el, 50)), 1)
        results[f"qps{int(rate)}"] = row
        log(f"rate {rate}: {row}")
    srv.close()
    st = dict(srv.stats)
    emit("serve_escalating_250k",
         max(r["achieved_qps"] for r in results.values()), "qps",
         n_tracks=N_TRACKS, mix_stretched=MIX_STRETCHED,
         duration_s=DURATION_S, structure_gate=float(sg) if sg else None,
         override_unstructured=float(ou) if ou is not None else None,
         stats=st, **results)
    return results


if __name__ == "__main__":
    run([float(a) for a in sys.argv[1:]] or None)
