"""Tuning sweeps for the two-stage matcher's device stages (no host upload).

Synthesizes the coarse DB and score vectors directly ON DEVICE (the host
relay makes multi-GB uploads the slow part of profile_stages.py), then
sweeps:
  - coarse kernel track tile (tt) — DMA size vs VMEM pressure
  - pool stage variants — exact lax.top_k vs two-level exact top_k

Usage: python benchmarks/tune_matcher.py [n_tracks] [stride]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import log


def timed(fn, *args, iters=30, **kw):
    import jax

    out = fn(*args, **kw)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args, **kw) for _ in range(iters)]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main(n_tracks=102_400, stride=32):
    import jax
    import jax.numpy as jnp

    from hpfw_tpu.config import HpfwConfig
    from hpfw_tpu.match import scaled
    from hpfw_tpu.ops.pallas_coarse import pallas_coarse_scan

    cfg = HpfwConfig()
    n_prints = int(60 * cfg.frames_per_second)
    n_q = int(10 * cfg.frames_per_second)
    lc = -(-(n_prints // stride) // 2) * 2
    nc = n_q // stride
    key = jax.random.PRNGKey(0)

    @jax.jit
    def synth_db(key):
        bits = jax.random.bernoulli(key, 0.5, (n_tracks, lc * 64))
        return jnp.where(bits, jnp.int8(1), jnp.int8(-1))

    db_c = synth_db(key)
    db_c.block_until_ready()
    qc = jnp.where(jax.random.bernoulli(key, 0.5, (nc, 64)),
                   jnp.int8(1), jnp.int8(-1))
    log(f"on-device coarse DB: T={n_tracks} lc={lc} ({db_c.nbytes / 1e9:.2f} GB)")

    results = {}
    for tt in (128, 256, 512, 1024):
        if n_tracks % tt:
            continue
        fn = functools.partial(pallas_coarse_scan, tt=tt, lc_true=lc)
        ms = timed(fn, qc, db_c)
        bw = db_c.nbytes / (ms / 1e3) / 1e9
        results[tt] = ms
        log(f"coarse tt={tt:5d}: {ms:6.2f} ms  ({bw:5.0f} GB/s)")

    # Pool variants over realistic int32 scores.
    best_corr = jax.random.randint(key, (n_tracks,), -nc * 64, nc * 64,
                                   dtype=jnp.int32)

    pool_1 = jax.jit(functools.partial(scaled._pool_candidates, pool=256))
    log(f"pool exact top_k(256):          {timed(pool_1, best_corr):5.2f} ms")

    for r in (32, 64, 128, 256):
        if n_tracks % r:
            continue

        @functools.partial(jax.jit, static_argnames=("rows",))
        def pool_2lvl(bc, rows=r):
            t = bc.shape[0]
            cols = t // rows
            v2 = bc.reshape(rows, cols)
            k1 = min(256, cols)
            vals, idx = jax.lax.top_k(v2, k1)              # (rows, k1)
            gidx = idx + (jnp.arange(rows, dtype=jnp.int32) * cols)[:, None]
            v, i2 = jax.lax.top_k(vals.reshape(-1), 256)
            return jnp.take(gidx.reshape(-1), i2)

        log(f"pool two-level R={r:3d}:          {timed(pool_2lvl, best_corr):5.2f} ms")


if __name__ == "__main__":
    args = [int(float(a)) for a in sys.argv[1:]]
    main(*args)
