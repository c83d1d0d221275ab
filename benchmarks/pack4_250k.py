"""Nibble-packed pass-1 at 250k: end-to-end preset latency + identity.

The pass-1 probe (pass1_tune.py pack4) measured the packed sweep at 1.67x
the int8 baseline and 93% of the load-only DMA floor (same session). This
measures what that buys the SHIPPED operating point: the catalog_scale
preset (stride 16, C=64, pool 1024, phases 8, prefilter 8192x2, C1=32)
on the real 250k-track catalog, prefilter_pack4 off vs on —
single-query and batched (B=16) dispatch latency, with top-1 identity
asserted on 50 excerpt queries (the packing is exact by construction and
by tests/test_scaled.py; this re-checks it on the real DB).

Protocol: queue-then-materialize-once (CLAUDE.md house timing), best of 2
rounds of 50 queued dispatches. The two DBs are built sequentially (the
chip can't hold both).

Run: python benchmarks/pack4_250k.py [n_tracks] [iters]
"""

import gc
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.real_catalog import paths
from hpfw_tpu.config import HpfwConfig

N_TRACKS = 250_000
TRACK_S = 60.0
NQ_PRINTS = 430        # ~10 s of audio at the 23.2 ms hop
B = 16


def _queries(prints, rng, n=50):
    qs = []
    for k in range(n):
        t = int(rng.integers(0, prints.shape[0]))
        off = int(rng.integers(0, prints.shape[1] - NQ_PRINTS))
        q = np.array(prints[t, off:off + NQ_PRINTS])
        flip = (rng.integers(0, 1 << 32, (NQ_PRINTS, 2), dtype=np.uint32)
                & rng.integers(0, 1 << 32, (NQ_PRINTS, 2), dtype=np.uint32)
                & rng.integers(0, 1 << 32, (NQ_PRINTS, 2), dtype=np.uint32))
        qs.append(np.bitwise_xor(q, flip))
    return qs


def _measure(ts, qs, iters):
    import jax.numpy as jnp

    q_dev = [jnp.asarray(q) for q in qs]
    tops = [np.asarray(ts.dispatch(q)) for q in q_dev]   # compile + identity
    best_single = None
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [ts.dispatch(q_dev[i % len(q_dev)]) for i in range(iters)]
        np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / iters
        best_single = dt if best_single is None else min(best_single, dt)
    qb = jnp.asarray(np.stack(qs[:B]))
    np.asarray(ts.dispatch_batch(qb))
    best_batch = None
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [ts.dispatch_batch(qb) for _ in range(max(4, iters // 8))]
        np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / max(4, iters // 8) / B
        best_batch = dt if best_batch is None else min(best_batch, dt)
    return best_single, best_batch, tops


def main(n_tracks=N_TRACKS, iters=50):
    from hpfw_tpu import api
    from hpfw_tpu.match.scaled import TwoStageDB

    cfg = HpfwConfig.catalog_scale()
    d = paths(n_tracks, TRACK_S)
    filters = np.load(os.path.join(d, "filters.npy"))
    prints = np.load(os.path.join(d, "prints.npy"), mmap_mode="r")
    lengths = np.full(n_tracks, prints.shape[1], np.int32)
    rng = np.random.default_rng(5)
    qs = _queries(prints, rng)
    db = api.FingerprintDB(cfg, filters,
                           [str(i) for i in range(n_tracks)],
                           prints, lengths)

    results = {}
    tops_ref = None
    for tag, pack in (("int8", False), ("pack4", True)):
        t0 = time.time()
        ts = TwoStageDB(db, prefilter_pack4=pack)
        log(f"{tag}: two-stage ready in {time.time() - t0:.0f}s "
            f"(db_c1 {ts.db_c1.nbytes / 1e9:.2f} GB)")
        single, batch, tops = _measure(ts, qs, iters)
        results[f"{tag}_single_ms"] = round(single * 1e3, 3)
        results[f"{tag}_batch_ms"] = round(batch * 1e3, 3)
        log(f"{tag}: single {single * 1e3:.2f} ms, "
            f"batched(B={B}) {batch * 1e3:.2f} ms/query")
        if tops_ref is None:
            tops_ref = tops
        else:
            same = all(np.array_equal(a, b) for a, b in zip(tops_ref, tops))
            results["identical_results"] = bool(same)
            log(f"results identical across all {len(tops)} queries: {same}")
        del ts
        gc.collect()

    if "pack4_single_ms" in results and "int8_single_ms" in results:
        results["speedup_single"] = round(
            results["int8_single_ms"] / results["pack4_single_ms"], 3)
        results["speedup_batch"] = round(
            results["int8_batch_ms"] / results["pack4_batch_ms"], 3)
    emit("pack4_250k", results.get("pack4_single_ms"), "ms",
         n_tracks=n_tracks, **results)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
