"""BASELINE config 4: catalog-scale sharded matching — XOR+popcount scan per
shard + all-gather top-k merge; here via the two-stage coarse->fine matcher.

Synthesizing a million real audio tracks is not feasible in the harness, so
the DB is random packed prints with planted noisy query excerpts — exactly
the matcher's workload. Metrics: QPS (queued) and p50/p99 per-query latency.

On this machine one TPU chip is available; the sharded code path itself is
validated on an 8-device CPU sim (tests/test_scaled.py). Numbers here are
single-chip; a v4-8 shards the DB 4x, so per-chip work (the reported
bottleneck) divides accordingly — flagged in the emitted extrapolation.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.match.scaled import TwoStageDB


def synth_print_db(rng, n_tracks, n_prints):
    """Random packed prints (iid bits). NOTE: iid prints are EASIER than
    real-audio prints — the 10k-track recall study (RESULTS.md) shows real
    catalogs have correlated prints that need a larger fine pool. This
    benchmark measures matcher PERFLOOR; real-audio-statistics recall at
    catalog scale is measured by benchmarks/real_catalog.py."""
    return rng.integers(0, 2 ** 32, (n_tracks, n_prints, 2), dtype=np.uint32)


def noisy_excerpt(rng, track_prints, start, n, flip_rate=0.15):
    """Excerpt with `flip_rate` of bits flipped — a realistic noisy query."""
    q = track_prints[start:start + n].copy()
    shifts = np.arange(32, dtype=np.uint32)
    flip = np.stack([
        np.bitwise_or.reduce(
            (rng.random((n, 32)) < flip_rate).astype(np.uint32) << shifts, axis=1),
        np.bitwise_or.reduce(
            (rng.random((n, 32)) < flip_rate).astype(np.uint32) << shifts, axis=1),
    ], axis=1)
    return np.bitwise_xor(q, flip)


def main(n_tracks=100_000, track_seconds=60, query_seconds=10, n_queries=20,
         stride=None, pool=None, channels=64):
    import jax

    cfg = HpfwConfig(coarse_channels=channels)
    fps = cfg.frames_per_second
    n_prints = int(track_seconds * fps)
    n_q = int(query_seconds * fps)
    rng = np.random.default_rng(0)
    log(f"backend={jax.default_backend()}; DB {n_tracks} tracks x {n_prints} prints "
        f"({n_tracks * n_prints * 8 / 1e9:.2f} GB packed)")
    prints = synth_print_db(rng, n_tracks, n_prints)
    lengths = np.full(n_tracks, n_prints, np.int32)

    db = api.FingerprintDB(cfg, np.zeros((cfg.context_dim, 64), np.float32),
                           [str(i) for i in range(n_tracks)], prints, lengths)
    log("uploading + deriving coarse prints...")
    t0 = time.time()
    ts = TwoStageDB(db, stride=stride if stride else cfg.db_downsample)
    log(f"db ready in {time.time() - t0:.1f}s")

    # Planted queries
    queries, truths, true_offs = [], [], []
    for i in range(n_queries):
        tid = int(rng.integers(0, n_tracks))
        off = int(rng.integers(0, n_prints - n_q))
        queries.append(noisy_excerpt(rng, prints[tid], off, n_q))
        truths.append(tid)
        true_offs.append(off)

    log(f"warmup/compile... (pool={pool or cfg.fine_candidates})")
    t0 = time.time()
    ids, scores, offs = ts.match(queries[0], top_k=10, pool=pool)
    log(f"first query {time.time() - t0:.1f}s -> top1 {ids[0]} (truth {truths[0]})")

    lat = []
    hits = 0
    for i in range(n_queries):
        t0 = time.perf_counter()
        ids, scores, offs = ts.match(queries[i], top_k=10, pool=pool)
        lat.append((time.perf_counter() - t0) * 1e3)
        if ids[0] == str(truths[i]) and int(offs[0]) == true_offs[i]:
            hits += 1
    lat = np.array(lat)
    emit("config4_match_p50_ms", round(float(np.percentile(lat, 50)), 2), "ms",
         p99=round(float(np.percentile(lat, 99)), 2),
         qps=round(1000.0 / float(np.mean(lat)), 1),
         recall_top1=hits / n_queries, n_tracks=n_tracks,
         note=("single v5e chip incl. ~32ms host-relay roundtrip; "
               "v4-8 shards tracks 4x across chips"))
    log(f"config4: p50 {np.percentile(lat, 50):.1f}ms recall {hits}/{n_queries}")

    # Device-side throughput: queue all queries (device-resident inputs),
    # materialize once — what a pipelined serving stack sees per query.
    # ts.dispatch is the exact jit match() runs (same statics, no recompile).
    import jax.numpy as jnp

    qs_dev = [jnp.asarray(q) for q in queries]
    for q in qs_dev:
        q.block_until_ready()
    t0 = time.perf_counter()
    outs = [ts.dispatch(q, pool=pool) for q in qs_dev]
    np.asarray(outs[-1])
    per_ms = (time.perf_counter() - t0) / len(qs_dev) * 1e3
    emit("config4_device_ms_per_query", round(per_ms, 2), "ms",
         qps_device=round(1000.0 / per_ms, 1), n_tracks=n_tracks,
         pool=pool or cfg.fine_candidates, stride=ts.stride)
    log(f"config4 device-side: {per_ms:.2f} ms/query")

    # Batched serving: B queries share one coarse-DB sweep (the batched
    # Pallas coarse kernel revisits each track tile across queries).
    if ts.use_pallas_fine:
        b = min(16, len(queries))
        batch = np.stack(queries[:b])
        res = ts.match_batch(batch, top_k=10, pool=pool)  # correctness + compile
        hits_b = sum(res[i][0][0] == str(truths[i])
                     and int(res[i][2][0]) == true_offs[i] for i in range(b))
        qb_dev = jnp.asarray(batch)
        qb_dev.block_until_ready()
        iters = 8
        t0 = time.perf_counter()
        outs = [ts.dispatch_batch(qb_dev, pool=pool) for _ in range(iters)]
        np.asarray(outs[-1])
        per_q = (time.perf_counter() - t0) / (iters * b) * 1e3
        emit("config4_batched_ms_per_query", round(per_q, 2), "ms",
             qps_device=round(1000.0 / per_q, 1), batch=b,
             recall_top1=hits_b / b, n_tracks=n_tracks)
        log(f"config4 batched (B={b}): {per_q:.2f} ms/query "
            f"({1000.0 / per_q:.0f} QPS), recall {hits_b}/{b}")


if __name__ == "__main__":
    args = [int(float(a)) for a in sys.argv[1:]]
    main(*args)
