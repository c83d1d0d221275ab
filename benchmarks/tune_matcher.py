"""Tuning sweeps for the two-stage matcher's device stages (no host upload).

Synthesizes the coarse DB and score vectors directly ON DEVICE (the host
relay makes multi-GB uploads the slow part of profile_stages.py), then
sweeps:
  - coarse kernel track tile (tt) — DMA size vs VMEM pressure
  - pool stage variants — exact lax.top_k vs two-level exact top_k
  - with --batch: the stacked batch kernel's phase count s (query-stacked
    N axis keeps the MXU wide, so small s wins — this sweep pinned
    BATCH_PHASES=16)

Usage: python benchmarks/tune_matcher.py [n_tracks] [stride] [--batch]
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


def main(n_tracks=102_400, stride=32, batch=False):
    import jax
    import jax.numpy as jnp

    from hpfw_tpu.config import HpfwConfig
    from hpfw_tpu.match import scaled
    from hpfw_tpu.ops.pallas_coarse import (pallas_coarse_scan,
                                            pallas_coarse_scan_batch_stacked)

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

    if batch:
        rng = np.random.default_rng(1)
        for b in (8, 16, 32):
            qs = jnp.asarray(rng.choice([-1, 1], (b, nc, 64)).astype(np.int8))
            for s in (8, 16, 32, 64):
                fn = functools.partial(pallas_coarse_scan_batch_stacked,
                                       s=s, lc_true=lc)
                try:
                    ms = timed(fn, qs, db_c, iters=10)
                except Exception as e:  # vmem pressure at large b*s
                    log(f"batch B={b:2d} s={s:3d}: FAIL {str(e)[:80]}")
                    continue
                log(f"batch B={b:2d} s={s:3d}: {ms:7.2f} ms ({ms / b:5.2f} ms/q)")
        return

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

    for k in (256, 1024, 2048):
        @functools.partial(jax.jit, static_argnames=("kk",))
        def pool_flat(bc, kk=k):
            return jax.lax.top_k(bc, kk)[1].astype(jnp.int32)

        log(f"pool flat top_k({k:4d}):          {timed(pool_flat, best_corr):5.2f} ms")

        for r in (16, 64, 256):
            if n_tracks % r or n_tracks // r < k:
                continue

            @functools.partial(jax.jit, static_argnames=("rows", "kk"))
            def pool_2lvl(bc, rows=r, kk=k):
                t = bc.shape[0]
                cols = t // rows
                v2 = bc.reshape(rows, cols)
                vals, idx = jax.lax.top_k(v2, kk)          # (rows, kk)
                gidx = idx + (jnp.arange(rows, dtype=jnp.int32) * cols)[:, None]
                v, i2 = jax.lax.top_k(vals.reshape(-1), kk)
                return jnp.take(gidx.reshape(-1), i2)

            log(f"pool two-level R={r:3d} k={k:4d}:    {timed(pool_2lvl, best_corr):5.2f} ms")

        @jax.jit
        def pool_approx(bc, kk=k):
            return jax.lax.approx_max_k(bc.astype(jnp.float32), kk)[1].astype(jnp.int32)

        log(f"pool approx_max_k({k:4d}):        {timed(pool_approx, best_corr):5.2f} ms")


if __name__ == "__main__":
    args = [int(float(a)) for a in sys.argv[1:] if not a.startswith("--")]
    main(*args, batch="--batch" in sys.argv)
