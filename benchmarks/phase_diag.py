"""Diagnose the two-stage recall gap at 250k real tracks: coarse PHASE.

Hypothesis: the coarse stage computes the query's majority-vote windows
from the query's own first print, so when the true DB offset o* is not
0 mod stride, every query coarse window straddles two DB windows and the
correlation peak collapses (worst at r = stride/2). The 0.655-vs-0.91
gap would then be mostly phase loss, not pool size.

Test: build a query set whose true offsets are exactly 0 mod stride
(start samples at multiples of stride*hop) and compare two-stage top-1
against the random-phase set at the same pool.

    python benchmarks/phase_diag.py [n_tracks] [track_s] [n_q] [stride] [pool]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.real_catalog import QUERY_SECONDS, NOISE_DB, paths
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth_jax
from hpfw_tpu.match.scaled import TwoStageDB


def main(n_tracks=250_000, secs=60.0, n_q=120, stride=16, pool=256):
    import jax.numpy as jnp

    cfg = HpfwConfig()
    d = paths(n_tracks, secs)
    prints = np.load(os.path.join(d, "prints.npy"), mmap_mode="r")
    filters = np.load(os.path.join(d, "filters.npy"))
    filters_dev = jnp.asarray(filters)
    rng = np.random.default_rng(21)
    truths = rng.integers(0, n_tracks, n_q)
    unit = stride * cfg.hop
    max_u = int((secs - QUERY_SECONDS - 1) * cfg.sample_rate) // unit
    base = rng.integers(1, max_u, n_q) * unit
    nseeds = rng.integers(0, 1 << 30, n_q)
    subhop = rng.integers(1, cfg.hop, n_q)
    qs_samples = int(QUERY_SECONDS * cfg.sample_rate)
    fp_fn = api._fingerprint_batch_jit(cfg, qs_samples, False)

    def extract(starts):
        out = []
        for i in range(0, n_q, 16):
            sl = slice(i, min(i + 16, n_q))
            pcm = synth_jax.query_batch(truths[sl], starts[sl], secs,
                                        QUERY_SECONDS, cfg,
                                        noise_db=NOISE_DB,
                                        noise_seeds=nseeds[sl])
            out.append(np.asarray(fp_fn(pcm, filters_dev)))
        return np.concatenate(out, axis=0)

    db = api.FingerprintDB(cfg, filters, [str(i) for i in range(n_tracks)],
                           prints, np.full(n_tracks, prints.shape[1], np.int32))
    t0 = time.time()
    ts = TwoStageDB(db, stride=stride)
    log(f"db ready {time.time() - t0:.0f}s")

    # variant A: fully aligned (coarse phase r=0 AND frame grid exact)
    # variant B: coarse-aligned but frame-misaligned (realistic print noise,
    #            isolates the coarse-phase effect alone)
    for name, starts in (("aligned", base), ("aligned_subhop", base + subhop)):
        qprints = extract(starts)
        hits = 0
        for i in range(0, n_q, 20):
            res = ts.match_batch(qprints[i:i + 20], top_k=1, pool=pool)
            for j, (tid, s, o) in enumerate(res):
                hits += tid[0] == str(truths[i + j])
        emit(f"phase_diag_{name}_top1", round(hits / n_q, 4), "accuracy",
             n_tracks=n_tracks, n_queries=n_q, stride=stride, pool=pool,
             note="true offsets 0 mod stride"
                  + ("" if name == "aligned" else " + random sub-hop shift")
                  + "; random-phase baseline 0.655 at pool 256, dense 0.91")
        log(f"{name} top1 {hits / n_q:.4f}")


if __name__ == "__main__":
    main(*[int(float(a)) for a in sys.argv[1:]])
