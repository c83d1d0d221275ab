"""BASELINE config 4 at FULL SCALE: 1,000,000 tracks on ONE v5e chip by
executing the four v4-8 shards SEQUENTIALLY.

No pod is available in this harness, so the 1M-track / v4-8 target
(BASELINE.json:10) is demonstrated as the real thing decomposed: the
catalog is split into 4 x 250k-track shards — exactly the per-chip share a
v4-8 holds — and each shard runs the byte-identical per-chip program of the
sharded path (coarse Pallas scan + exact pool + Pallas fine rescan; the
all-gather candidate merge itself is CPU-sim-verified in tests/test_sharded
.py and the merge below is its host-side equivalent: concatenate the
fixed-size per-shard candidate blocks, rank globally).

Reported metrics:
  - per-shard device-side ms/query: what each v4-8 chip does IN PARALLEL —
    the pod's p50 is this plus ~0.1 ms of all-gather, on a chip with 1.5x
    this chip's HBM bandwidth;
  - merged top-1 recall + exact offsets over the full 1,000,000 tracks.

Usage: python benchmarks/config4_1m.py [n_shards] [per_shard] [n_queries]
                                        [stride] [pool]
"""

import gc
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.config4_scale import noisy_excerpt, synth_print_db
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.match.scaled import TwoStageDB, _rank_dedup


def main(n_shards=4, per_shard=250_000, n_queries=10, stride=32, pool=None,
         track_seconds=60, query_seconds=10):
    import jax
    import jax.numpy as jnp

    cfg = HpfwConfig()
    fps = cfg.frames_per_second
    n_prints = int(track_seconds * fps)
    n_q = int(query_seconds * fps)
    n_total = n_shards * per_shard
    log(f"1M demo: {n_shards} x {per_shard} tracks x {track_seconds}s "
        f"({n_total * n_prints * 8 / 1e9:.1f} GB packed total), "
        f"sequential shards on {jax.devices()[0].device_kind}")

    # Plant each query in a (shard, track, offset) chosen up front.
    rng = np.random.default_rng(0)
    plant = [(int(rng.integers(0, n_shards)),
              int(rng.integers(0, per_shard)),
              int(rng.integers(0, n_prints - n_q)))
             for _ in range(n_queries)]
    queries = [None] * n_queries

    per_query_ms = []
    shard_results = [[] for _ in range(n_queries)]  # (scores, gidx, offs)
    t_all = time.time()
    for s in range(n_shards):
        t0 = time.time()
        srng = np.random.default_rng(1000 + s)
        prints = synth_print_db(srng, per_shard, n_prints)
        # Cut the planted queries that live in this shard (before upload).
        for qi, (ps, tid, off) in enumerate(plant):
            if ps == s:
                queries[qi] = noisy_excerpt(rng, prints[tid], off, n_q)
        db = api.FingerprintDB(
            cfg, np.zeros((cfg.context_dim, 64), np.float32),
            [str(s * per_shard + i) for i in range(per_shard)],
            prints, np.full(per_shard, n_prints, np.int32))
        ts = TwoStageDB(db, stride=stride)
        del prints, db
        gc.collect()
        log(f"shard {s}: db ready in {time.time() - t0:.1f}s "
            f"(tile {ts.coarse_tile})")
        if s == 0:
            # All queries must exist before shard 0 can be queried: cut the
            # rest from their shards' print streams without uploading them.
            for qi, (ps, tid, off) in enumerate(plant):
                if queries[qi] is None:
                    r2 = np.random.default_rng(1000 + ps)
                    p2 = synth_print_db(r2, per_shard, n_prints)
                    for qj, (ps2, tid2, off2) in enumerate(plant):
                        if ps2 == ps and queries[qj] is None:
                            queries[qj] = noisy_excerpt(rng, p2[tid2],
                                                        off2, n_q)
                    del p2
                    gc.collect()
        qs_dev = [jnp.asarray(q) for q in queries]
        for q in qs_dev:
            q.block_until_ready()
        ts.match(queries[0], top_k=10, pool=pool)          # compile + warm
        t0 = time.perf_counter()
        outs = [ts.dispatch(q, pool=pool or cfg.fine_candidates)
                for q in qs_dev]
        np.asarray(outs[-1])
        ms = (time.perf_counter() - t0) / len(qs_dev) * 1e3
        per_query_ms.append(ms)
        # Also time the real-audio-pinned operating point (stride 32 needs
        # pool 1024 for ceiling recall — benchmarks/recall_study.py).
        ts.match(queries[0], top_k=10, pool=1024)
        t0 = time.perf_counter()
        big = [ts.dispatch(q, pool=1024) for q in qs_dev]
        np.asarray(big[-1])
        ms_1024 = (time.perf_counter() - t0) / len(qs_dev) * 1e3
        log(f"shard {s}: {ms:.2f} ms/query device-side "
            f"(pool 1024: {ms_1024:.2f} ms)")
        for qi, out in enumerate(outs):
            scores, idx, offs = np.asarray(out)
            real = idx < ts.n_real
            shard_results[qi].append((scores[real],
                                      s * per_shard + idx[real], offs[real]))
        del ts, qs_dev, outs
        gc.collect()

    # Host-side equivalent of the all-gather top-k merge.
    track_ids = {i: str(i) for i in range(n_total)}
    hits = 0
    for qi, (ps, tid, off) in enumerate(plant):
        scores = np.concatenate([r[0] for r in shard_results[qi]])
        gidx = np.concatenate([r[1] for r in shard_results[qi]])
        offs = np.concatenate([r[2] for r in shard_results[qi]])
        ids, sc, of = _rank_dedup(scores, gidx, offs, track_ids, 10)
        truth = ps * per_shard + tid
        ok = ids[0] == str(truth) and int(of[0]) == off
        hits += ok
        if not ok:
            log(f"MISS q{qi}: got {ids[0]}@{int(of[0])} want {truth}@{off}")
    shard_ms = float(np.mean(per_query_ms))
    emit("config4_1m_per_shard_ms", round(shard_ms, 2), "ms",
         recall_top1_at_1m=hits / n_queries, n_tracks=n_total,
         shards=n_shards, per_shard=per_shard, stride=stride,
         pool=pool or cfg.fine_candidates,
         note=("four v4-8 shard programs executed sequentially on one v5e; "
               "pod p50 = per-shard ms (parallel) + ~0.1 ms all-gather "
               "merge, on v4 HBM 1.5x faster than v5e"))
    log(f"1M-track demo: recall {hits}/{n_queries} at {n_total} tracks, "
        f"per-shard {shard_ms:.2f} ms/query, wall {time.time() - t_all:.0f}s")


if __name__ == "__main__":
    args = [int(float(a)) for a in sys.argv[1:]]
    main(*args)
