"""Coarse CHANNEL-count study: can top-C PCA channels halve coarse bytes?

The coarse scan is the last DMA-bound stage of the 250k-track match (91% of
the HBM read ceiling — RESULTS.md), so the only remaining single-query
lever is fewer bytes per window. Hashprint channels are PCA-ordered (filter
0 = top eigenvector), so the first C bits of each print are its most
informative — a coarse print of only those channels costs C/64 of the
bytes at the same temporal stride.

This measures the thing that matters for the two-stage design: POOL
RECALL — the probability that the true track's best coarse correlation
ranks inside the fine-rescan pool (the fine stage is exact, so pool
membership is the recall-limiting event). Real-audio catalog with
pitch-shifted covers, same construction (and print cache) as
recall_study.py.

    python benchmarks/channel_study.py [n_tracks] [track_seconds] [n_queries]
                                        [--e2e]

--e2e additionally runs END-TO-END two-stage matching (coarse + exact fine
rescan + ranking) at the chosen operating points against the exhaustive
dense baseline — confirming that pool recall is the recall-limiting event.
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log, make_filters
from benchmarks.recall_study import build_prints
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth

CHANNELS = (64, 48, 32)
STRIDES = (16, 32)
POOLS = (64, 128, 256, 512, 1024, 2048)


E2E_POINTS = (   # (stride, channels, pool)
    (16, 64, 256),   # config default
    (32, 64, 1024),  # prior catalog flagship
    (32, 32, 2048),  # new half-byte recommendation
)


def main(n_tracks=10_000, track_seconds=15, n_queries=300, e2e=False):
    import jax
    import jax.numpy as jnp

    from hpfw_tpu.ops import coarse as coarse_ops

    cfg = HpfwConfig()
    filters = make_filters(cfg)
    cache = f"/tmp/recall_prints_{n_tracks}_{track_seconds}.npz"
    if os.path.exists(cache):
        log(f"loading cached catalog prints from {cache}")
        prints = np.load(cache)["prints"]
    else:
        log(f"building {n_tracks} x {track_seconds}s real-audio catalog...")
        prints = build_prints(n_tracks, float(track_seconds), filters, cfg)
        np.savez(cache, prints=prints)

    rng = np.random.default_rng(11)     # same queries as recall_study.py
    q_secs = min(8.0, track_seconds - 3.0)
    queries, truths = [], []
    t0 = time.time()
    for _ in range(n_queries):
        tid = int(rng.integers(0, n_tracks))
        pcm = synth.synth_track(tid, float(track_seconds), cfg)
        q = synth.make_query(pcm, rng.uniform(0.2, 2.0), q_secs, cfg,
                             noise_db=-10.0, seed=int(rng.integers(1 << 30)))
        qfp = api.fingerprint(q[: int((q_secs - 1) * cfg.sample_rate)],
                              filters, cfg)
        queries.append(np.asarray(qfp))
        truths.append(tid)
    log(f"{n_queries} queries fingerprinted in {time.time() - t0:.0f}s")
    truths = np.array(truths)
    nq = min(q.shape[0] for q in queries)
    qs = np.stack([q[:nq] for q in queries])

    if e2e:
        lengths = np.full(n_tracks, prints.shape[1], np.int32)
        db = api.FingerprintDB(cfg, filters,
                               [str(i) for i in range(n_tracks)],
                               prints, lengths)
        log("exhaustive dense baseline...")
        dense_top = []
        for i in range(n_queries):
            ids, s, o = api.match(qs[i], db, top_k=1)
            dense_top.append((ids[0], int(s[0]), int(o[0])))
        dense_hit = np.mean([d[0] == str(t)
                             for d, t in zip(dense_top, truths)])
        emit("chanstudy_e2e_dense_top1", round(float(dense_hit), 4),
             "accuracy", n_tracks=n_tracks)
        from hpfw_tpu.match.scaled import TwoStageDB

        for stride, c, pool in E2E_POINTS:
            ts = TwoStageDB(db, stride=stride, coarse_channels=c)
            hit = agree = 0
            for i in range(n_queries):
                ids, s, o = ts.match(qs[i], top_k=1, pool=pool)
                hit += ids[0] == str(truths[i])
                d_id, d_s, d_o = dense_top[i]
                agree += (ids[0] == d_id and int(s[0]) == d_s
                          and int(o[0]) == d_o)
            emit(f"chanstudy_e2e_s{stride}_c{c}_p{pool}",
                 round(hit / n_queries, 4), "top1_accuracy",
                 agreement_with_dense=round(agree / n_queries, 4),
                 n_tracks=n_tracks)
            log(f"e2e stride={stride:2d} C={c:2d} pool={pool:4d}: "
                f"top1 {hit / n_queries:.4f} "
                f"dense-agreement {agree / n_queries:.4f}")
            del ts
        return

    prints_dev = jnp.asarray(prints)
    qs_dev = jnp.asarray(qs)

    for stride in STRIDES:
        db_c64 = np.asarray(jax.jit(
            lambda p: coarse_ops.coarse_pm1(p, stride))(prints_dev))
        q_c64 = np.asarray(jax.vmap(
            lambda q: coarse_ops.coarse_pm1(q, stride))(qs_dev))
        for c in CHANNELS:
            db_c = jnp.asarray(db_c64[:, :, :c])
            q_c = jnp.asarray(np.ascontiguousarray(q_c64[:, :, :c]))

            @jax.jit
            def best_of(qc, dbc=db_c):
                corr = coarse_ops.coarse_correlation(qc, dbc)
                return jnp.max(corr, axis=1)

            best = np.stack([np.asarray(best_of(q_c[i]))
                             for i in range(n_queries)])       # (Q, T)
            tb = best[np.arange(n_queries), truths]
            # Rank under the exact pool tie-break (lower index wins ties).
            gt = (best > tb[:, None]).sum(axis=1)
            eq_lower = ((best == tb[:, None])
                        & (np.arange(n_tracks)[None, :] < truths[:, None])
                        ).sum(axis=1)
            rank = gt + eq_lower                                # 0-based
            row = {f"p{p}": round(float((rank < p).mean()), 4) for p in POOLS}
            emit(f"chanstudy_s{stride}_c{c}", row[f"p{POOLS[-1]}"],
                 "pool_recall", **row, median_rank=int(np.median(rank) + 1),
                 n_tracks=n_tracks, bytes_per_track_rel=round(
                     c / 64 * (16 / stride if stride else 1), 3))
            log(f"stride={stride:2d} C={c:2d}: " + "  ".join(
                f"@{p}={row[f'p{p}']:.3f}" for p in POOLS)
                + f"  med_rank={int(np.median(rank) + 1)}")


if __name__ == "__main__":
    main(*[int(float(a)) for a in sys.argv[1:] if not a.startswith("--")],
         e2e="--e2e" in sys.argv)
