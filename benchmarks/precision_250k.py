"""Extraction-precision rungs validated at 250k tracks (VERDICT r3 weak #5).

RESULTS r3 measured the precision ladder's speed (x6 contract 73k x rt /
316 s cold compile; x3 83k x rt / ~16 s; default-bf16 129k x rt / 12 s) but
accuracy only on a 16-track catalog. This extracts the SAME 250k real-audio
catalog and query plan under a cheaper rung and runs the standard noise
eval at the catalog_scale() point, so the rung's top-1 can be compared
directly to the x6 contract run (RESULTS r3: 0.865).

    HPFW_DOT_ALGO=x3      python benchmarks/precision_250k.py
    HPFW_DOT_ALGO=default python benchmarks/precision_250k.py

Catalog and queries are extracted with the SAME rung (the realistic
deployment: whoever ingests also serves). Artifacts land next to the
contract run's (/tmp/hpfw_real_cat/250000_60/prints_<algo>.npy).
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.real_catalog import NOISE_DB, QUERY_SECONDS, paths
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth_jax
from hpfw_tpu.match.scaled import TwoStageDB

N_TRACKS = 250_000
TRACK_S = 60.0
N_Q = 200
BATCH = 16


def main():
    algo = os.environ.get("HPFW_DOT_ALGO", "x6").lower()
    cfg = HpfwConfig.catalog_scale()
    d = paths(N_TRACKS, TRACK_S)
    filters = np.load(os.path.join(d, "filters.npy"))
    import jax.numpy as jnp

    fdev = jnp.asarray(filters)
    npq = cfg.n_hashprints(int(TRACK_S * cfg.sample_rate))

    ppath = os.path.join(d, f"prints_{algo}.npy")
    if algo == "x6":
        ppath = os.path.join(d, "prints.npy")  # the contract catalog
    if not os.path.exists(ppath + ".done") and not (
            algo == "x6" and os.path.exists(os.path.join(d, "prints.done"))):
        log(f"extracting 250k catalog at HPFW_DOT_ALGO={algo}...")
        prints = np.lib.format.open_memmap(
            ppath, mode="w+", dtype=np.uint32, shape=(N_TRACKS, npq, 2))
        fp_fn = api._fingerprint_batch_jit(
            cfg, int(TRACK_S * cfg.sample_rate), False)
        t0 = time.time()
        pending = []
        for s0 in range(0, N_TRACKS, BATCH):
            ids = np.arange(s0, min(s0 + BATCH, N_TRACKS))
            pcm = synth_jax.synth_batch(ids, TRACK_S, cfg)
            pending.append((s0, ids.shape[0], fp_fn(pcm, fdev)))
            if len(pending) >= 2:
                a, b, r = pending.pop(0)
                prints[a:a + b] = np.asarray(r)[:b, :npq]
            if s0 and s0 % 4096 == 0:
                log(f"  {s0}/{N_TRACKS} ({time.time() - t0:.0f}s)")
        for a, b, r in pending:
            prints[a:a + b] = np.asarray(r)[:b, :npq]
        prints.flush()
        open(ppath + ".done", "w").write("ok")
        log(f"catalog extracted in {time.time() - t0:.0f}s")

    prints = np.load(ppath, mmap_mode="r")
    lengths = np.full(N_TRACKS, npq, np.int32)
    db = api.FingerprintDB(cfg, filters, [str(i) for i in range(N_TRACKS)],
                           prints, lengths)
    t0 = time.time()
    ts = TwoStageDB(db)
    log(f"two-stage ready in {time.time() - t0:.0f}s")

    # same deterministic query plan as real_catalog.queries (seed 11),
    # extracted under THIS rung
    rng = np.random.default_rng(11)
    truths = rng.integers(0, N_TRACKS, N_Q)
    starts = rng.integers(0, int((TRACK_S - QUERY_SECONDS - 1)
                                 * cfg.sample_rate), N_Q)
    nseeds = rng.integers(0, 1 << 30, N_Q)
    qs_samples = int(QUERY_SECONDS * cfg.sample_rate)
    fp_fn = api._fingerprint_batch_jit(cfg, qs_samples, False)
    qp = []
    for i in range(0, N_Q, BATCH):
        sl = slice(i, min(i + BATCH, N_Q))
        pcm = synth_jax.query_batch(truths[sl], starts[sl], TRACK_S,
                                    QUERY_SECONDS, cfg, noise_db=NOISE_DB,
                                    noise_seeds=nseeds[sl])
        qp.append(np.asarray(fp_fn(pcm, fdev)))
    qprints = np.concatenate(qp, axis=0)

    correct = 0
    t0 = time.time()
    for i in range(0, N_Q, 10):
        res = ts.match_batch(qprints[i:i + 10], top_k=1)
        for j, (tid, s, o) in enumerate(res):
            correct += int(tid[0]) == truths[i + j]
    top1 = correct / N_Q
    emit("precision_250k_top1", round(top1, 4), "top1_accuracy",
         dot_algo=algo, n_tracks=N_TRACKS, n_queries=N_Q,
         noise_db=NOISE_DB, preset="catalog_scale",
         eval_s=round(time.time() - t0, 1))
    log(f"HPFW_DOT_ALGO={algo}: top-1 {top1:.4f} at 250k")


if __name__ == "__main__":
    main()
