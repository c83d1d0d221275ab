"""Pass-1 selectivity diagnostic for the two-pass coarse matcher.

The two-pass matcher's recall ceiling is P(true track in the pass-1 top-M
prefilter pool). This measures that probability directly on the 250k
real-audio catalog for a given (stride, channels, phases1) pass-1
configuration at several M, by ranking the true track's phase-max coarse
score against the whole catalog — answering whether a CHEAPER pass-1
representation (e.g. stride 32 while pass 2 rescans stride 16) could hold
the measured two-pass recall at a fraction of the sweep bytes/MACs.

    python benchmarks/prefilter_diag.py STRIDE CHANNELS PHASES1 [N_Q]

Uses benchmarks/real_catalog.py artifacts (prints/queries/filters).
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
from hpfw_tpu.match.scaled import TwoStageDB, _coarse_best_batch_phased
from hpfw_tpu.match.scaled import _coarse_best_batch
from hpfw_tpu.ops import coarse as coarse_ops

N_TRACKS, SECS = 250_000, 60.0
MS = (1024, 4096, 8192, 16384, 32768)


def main(stride=32, channels=64, phases1=2, n_q=100):
    import jax
    import jax.numpy as jnp

    d = paths(N_TRACKS, SECS)
    z = np.load(os.path.join(d, "queries.npz"))
    qprints, truths = z["prints"][:n_q], z["truths"][:n_q]
    prints = np.load(os.path.join(d, "prints.npy"), mmap_mode="r")
    filters = np.load(os.path.join(d, "filters.npy"))
    lengths = np.full(N_TRACKS, prints.shape[1], np.int32)
    cfg = HpfwConfig(coarse_channels=channels)
    db = api.FingerprintDB(cfg, filters, [str(i) for i in range(N_TRACKS)],
                           prints, lengths)
    t0 = time.time()
    ts = TwoStageDB(db, stride=stride)
    log(f"db ready {time.time() - t0:.0f}s")

    # Rank of the true track by phase-max coarse score, one batch dispatch
    # per query group; rank = #tracks with score >= true's (pessimistic on
    # ties).
    @jax.jit
    def ranks_fn(qs, tr):
        if phases1 > 1:
            best, _ = _coarse_best_batch_phased(
                qs, ts.db_c, stride=stride, phases=phases1,
                coarse_kind=ts.coarse_kind, coarse_channels=channels,
                lc_true=ts.lc_true, coarse_tile=ts.coarse_tile,
                interpret=False)
        else:
            qc = jax.vmap(lambda q: coarse_ops.coarse_pm1(
                q, stride, kind=ts.coarse_kind, channels=channels))(qs)
            best, _ = _coarse_best_batch(qc, ts.db_c, lc_true=ts.lc_true,
                                         coarse_tile=ts.coarse_tile,
                                         interpret=False)
        true_score = jnp.take_along_axis(best, tr[:, None], axis=1)
        return jnp.sum(best >= true_score, axis=1)

    bsz = min(20, max(1, 128 // phases1))
    ranks = np.empty(n_q, np.int64)
    t0 = time.time()
    for i in range(0, n_q, bsz):
        qs = jnp.asarray(qprints[i:i + bsz])
        tr = jnp.asarray(truths[i:i + bsz].astype(np.int32))
        ranks[i:i + bsz] = np.asarray(ranks_fn(qs, tr))[: len(truths[i:i + bsz])]
        if i == 0:
            log(f"first batch {time.time() - t0:.0f}s (compile)")
    in_pool = {m: float(np.mean(ranks <= m)) for m in MS}
    emit(f"prefilter_recall_s{stride}_c{channels}_ph{phases1}",
         in_pool[8192], "fraction", n_tracks=N_TRACKS, n_queries=n_q,
         by_pool={str(m): round(v, 4) for m, v in in_pool.items()},
         rank_p50=int(np.median(ranks)), rank_p90=int(np.percentile(ranks, 90)),
         eval_s=round(time.time() - t0, 1))
    for m in MS:
        log(f"  P(true in top-{m}) = {in_pool[m]:.4f}")


if __name__ == "__main__":
    main(*[int(float(a)) for a in sys.argv[1:]])
