"""Pass-1 sweep tuning probes (VERDICT r3 weak #4: find ~10% so the 1M
shard runs <10 ms on THIS chip, or record the dead end).

The two-pass matcher's cost is dominated by pass 1: a phases1=2 stacked
coarse sweep of the whole catalog's channel-subset DB (C1=32), measured at
~255 GB/s = 77% of this chip's ~335 GB/s practical HBM ceiling with the
round-3 audit attributing ~6.4 us DMA + ~7 us GEMM + ~5 us int8->bf16
convert per 20 us tile — i.e. little DMA/compute overlap. Probes:

  baseline  — time the preset pass-1 kernel shapes, report GB/s
  dma       — a load-only kernel on the same tiles (the DMA floor)
  int4      — the same kernel with int4 storage (values are +-1; HBM bytes
              halve IF Mosaic converts int4->bf16 natively)

    python benchmarks/pass1_tune.py [n_tracks=102400] [probe...]

Timing-only: the DB is random +-1 (bandwidth does not care); the int4
probe additionally asserts exact equality with the int8 kernel's output.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log

N_DEFAULT = 102_400
LC = 164            # ~60 s tracks at stride 16 (2583/16), padded
C1 = 32
NC = 39             # 10 s query at stride 16
PHASES1 = 2


def _setup(n_tracks, dtype="int8"):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    lcw = ((LC * C1 + 127) // 128) * 128
    db = rng.choice([-1, 1], size=(n_tracks, lcw)).astype(np.int8)
    q = rng.choice([-1, 1], size=(PHASES1, NC, C1)).astype(np.int8)
    db_dev = jnp.asarray(db)
    if dtype == "int4":
        db_dev = db_dev.astype(jnp.int4)
    return jnp.asarray(q), db_dev, lcw


def _time_scan(q, db, lc_true, iters=30, **kw):
    import jax.numpy as jnp  # noqa: F401

    from hpfw_tpu.ops.pallas_coarse import pallas_coarse_scan_batch_stacked

    # s=64: the adaptive lane count scaled.py's pass 1 picks for B=2
    # variant lanes (2 groups x 64 = 128 lanes, no duplicate padding).
    kw.setdefault("s", 64)
    best, idx = pallas_coarse_scan_batch_stacked(q, db, lc_true=lc_true, **kw)
    np.asarray(best)
    # Force with a host materialization of the LAST output: on this relay
    # block_until_ready on a jit output can return before queued programs
    # execute (measured: a 537 MB sweep "finished" in 18 us), so the house
    # protocol (CLAUDE.md / bench.py) is queue-then-materialize-once. The
    # ~32 ms relay materialization cost is amortized over iters.
    t0 = time.perf_counter()
    outs = [pallas_coarse_scan_batch_stacked(q, db, lc_true=lc_true, **kw)
            for _ in range(iters)]
    np.asarray(outs[-1][0])
    dt = (time.perf_counter() - t0) / iters
    return dt, (np.asarray(best), np.asarray(idx))


def main(n_tracks=N_DEFAULT, probes=("baseline", "dma", "convert1", "int4")):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, db, lcw = _setup(n_tracks)
    nbytes = db.size  # int8
    lc_true = LC
    results = {}

    if "baseline" in probes:
        dt, ref = _time_scan(q, db, lc_true)
        results["baseline_ms"] = dt * 1e3
        results["baseline_gbs"] = nbytes / dt / 1e9
        log(f"baseline: {dt * 1e3:.3f} ms, {nbytes / dt / 1e9:.0f} GB/s")

    if "dma" in probes:
        # Load-only floor: same tile shapes, one pass, reduce to 1 word so
        # Mosaic can't elide the load.
        tt = 512
        tpad = ((n_tracks + tt - 1) // tt) * tt

        def k(db_ref, o_ref):
            o_ref[:] = jnp.sum(db_ref[:].astype(jnp.int32), axis=1,
                               keepdims=True)

        f = pl.pallas_call(
            k, grid=(tpad // tt,),
            in_specs=[pl.BlockSpec((tt, lcw), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tt, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tpad, 1), jnp.int32))
        dbp = jnp.pad(db, ((0, tpad - n_tracks), (0, 0)))
        np.asarray(f(dbp))
        t0 = time.perf_counter()
        outs = [f(dbp) for _ in range(30)]
        np.asarray(outs[-1])        # materialize-once forcing (see above)
        dt = (time.perf_counter() - t0) / 30
        results["dma_ms"] = dt * 1e3
        results["dma_gbs"] = nbytes / dt / 1e9
        log(f"load+reduce floor: {dt * 1e3:.3f} ms, "
            f"{nbytes / dt / 1e9:.0f} GB/s")

    if "convert1" in probes:
        dtc, outc = _time_scan(q, db, lc_true, convert_once=True)
        results["convert1_ms"] = dtc * 1e3
        results["convert1_gbs"] = nbytes / dtc / 1e9
        if "baseline" in probes:
            same = (np.array_equal(outc[0], ref[0])
                    and np.array_equal(outc[1], ref[1]))
            results["convert1_exact"] = bool(same)
        log(f"convert_once: {dtc * 1e3:.3f} ms, "
            f"{nbytes / dtc / 1e9:.0f} GB/s")

    if "pack4" in probes:
        # Nibble packing (two values/byte, in-register unpack + even/odd W
        # split — ops/pallas_coarse.pack_coarse_nibbles): the int4 HBM
        # saving without the jnp.int4 dtype the dispatcher chokes on.
        from hpfw_tpu.ops.pallas_coarse import pack_coarse_nibbles

        dbp = pack_coarse_nibbles(db)
        np.asarray(dbp)
        dtp, outp = _time_scan(q, dbp, lc_true, packed4=True)
        results["pack4_ms"] = dtp * 1e3
        results["pack4_gbs_effective"] = nbytes / dtp / 1e9
        if "baseline" in probes:
            same = (np.array_equal(outp[0], ref[0])
                    and np.array_equal(outp[1], ref[1]))
            results["pack4_exact"] = bool(same)
        log(f"pack4: {dtp * 1e3:.3f} ms (vs baseline "
            f"{results.get('baseline_ms', 0):.3f}), "
            f"{nbytes / dtp / 1e9:.0f} GB/s effective, "
            f"exact={results.get('pack4_exact')}")

    if "int4" in probes:
        try:
            q4, db4, _ = _setup(n_tracks, dtype="int4")
            dt4, out4 = _time_scan(q4, db4, lc_true)
            results["int4_ms"] = dt4 * 1e3
            results["int4_gbs_effective"] = nbytes / dt4 / 1e9
            if "baseline" in probes:
                same = (np.array_equal(out4[0], ref[0])
                        and np.array_equal(out4[1], ref[1]))
                results["int4_exact"] = bool(same)
                log(f"int4: {dt4 * 1e3:.3f} ms (vs baseline "
                    f"{results['baseline_ms']:.3f}), exact={same}")
        except Exception as e:  # Mosaic may reject int4 blocks
            results["int4_error"] = repr(e)[:200]
            log(f"int4 probe failed: {e!r}")

    emit("pass1_tune", round(results.get("baseline_ms", 0.0), 3), "ms",
         n_tracks=n_tracks,
         **{k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in results.items()})
    return results


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    probes = tuple(sys.argv[2:]) or ("baseline", "dma", "convert1", "pack4", "int4")
    main(n, probes)
