"""Stage-level device timings for the two-stage matcher (tuning tool).

Times each stage of the catalog-scale match on the current backend with
device-resident inputs, queueing `iters` dispatches and materializing one
result (the only honest timing through the axon relay, where
block_until_ready returns early). Usage:

    python benchmarks/profile_stages.py [n_tracks] [stride] [--xla-coarse]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import log
from benchmarks.config4_scale import noisy_excerpt, synth_print_db
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig


def timed(fn, *args, iters=20, **kw):
    out = fn(*args, **kw)
    np.asarray(jax.tree.leaves(out)[0])  # compile + settle
    t0 = time.perf_counter()
    outs = [fn(*args, **kw) for _ in range(iters)]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main(n_tracks=100_000, stride=32, xla_coarse=False):
    global jax
    import functools

    import jax
    import jax.numpy as jnp

    from hpfw_tpu.match import scaled
    from hpfw_tpu.ops import coarse as coarse_ops
    from hpfw_tpu.ops.pallas_coarse import pallas_coarse_scan
    from hpfw_tpu.ops.pallas_fine import pallas_fine_rescan

    cfg = HpfwConfig()
    n_prints = int(60 * cfg.frames_per_second)   # 60 s tracks
    n_q = int(10 * cfg.frames_per_second)        # 10 s query
    rng = np.random.default_rng(0)
    prints = synth_print_db(rng, n_tracks, n_prints)
    db = api.FingerprintDB(cfg, np.zeros((cfg.context_dim, 64), np.float32),
                           [str(i) for i in range(n_tracks)], prints,
                           np.full(n_tracks, n_prints, np.int32))
    query = noisy_excerpt(rng, prints[123], 500, n_q)
    t0 = time.time()
    ts = scaled.TwoStageDB(db, stride=stride,
                           use_pallas_coarse=not xla_coarse)
    log(f"db ready in {time.time() - t0:.1f}s "
        f"(T={ts.db_c.shape[0]}, coarse {ts.db_c.nbytes / 1e9:.2f} GB, "
        f"pallas_coarse={ts.use_pallas_coarse})")
    q = jnp.asarray(query)

    qc = jax.jit(functools.partial(coarse_ops.coarse_pm1, stride=stride))(q)
    np.asarray(qc)
    nc = qc.shape[0]

    if ts.use_pallas_coarse:
        coarse_ms = timed(
            functools.partial(pallas_coarse_scan, tt=ts.coarse_tile,
                              lc_true=ts.lc_true), qc, ts.db_c)
        bw = ts.db_c.nbytes / (coarse_ms / 1e3) / 1e9
        log(f"pallas coarse scan: {coarse_ms:.2f} ms  ({bw:.0f} GB/s effective)")
        best_corr, best_a = pallas_coarse_scan(qc, ts.db_c, tt=ts.coarse_tile,
                                               lc_true=ts.lc_true)
    else:
        @jax.jit
        def xla_coarse(qc_, dbc_):
            corr = coarse_ops.coarse_correlation(qc_, dbc_)
            return jnp.max(corr, axis=1), jnp.argmax(corr, axis=1).astype(jnp.int32)

        coarse_ms = timed(xla_coarse, qc, ts.db_c)
        bw = ts.db_c.nbytes / (coarse_ms / 1e3) / 1e9
        log(f"XLA coarse+max: {coarse_ms:.2f} ms  ({bw:.0f} GB/s useful)")
        best_corr, best_a = xla_coarse(qc, ts.db_c)
    np.asarray(best_corr)

    pool_prod = jax.jit(functools.partial(scaled._pool_candidates, pool=256))
    log(f"pool (production, exact top_k 256): {timed(pool_prod, best_corr):.2f} ms")

    @jax.jit
    def pool_approx(bc):
        return jax.lax.approx_max_k(bc.astype(jnp.float32), 256)[1].astype(jnp.int32)

    log(f"pool approx_max_k(256): {timed(pool_approx, best_corr):.2f} ms")

    cand = pool_prod(best_corr)
    n_fine = 2 * stride + 1
    span = n_q + n_fine - 1
    starts = jnp.clip(best_a[cand] * stride - stride, 0,
                      max(ts.l_true - span, 0))
    cand, starts = jnp.asarray(cand), jnp.asarray(starts)
    fine = functools.partial(pallas_fine_rescan, n_fine=n_fine, lpad=ts.lpad)
    log(f"fine rescan (K=256): {timed(fine, q, ts.d0, ts.d1, ts.lengths, cand, starts):.2f} ms")

    full = functools.partial(ts.dispatch, pool=256, fine_window=stride)
    log(f"full two-stage jit: {timed(full, q):.2f} ms")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(*(int(a) for a in args[:2]),
         xla_coarse="--xla-coarse" in sys.argv)
