"""Pallas TPU kernel: fused hashprint encoder.

One kernel per print tile does the entire hashprint stage: build the
spectro-temporal context windows, project onto the 64 learned filters on the
MXU (3-way-split bf16 emulation, f32-true like ops/pallas_frontend.py),
take the lag-T delta, sign-threshold, and pack the 64 bits into two uint32
words — the "single fused matmul + sign-threshold + bit-pack kernel" of the
north star. Intermediates (context matrix, projections, deltas) never leave
VMEM.

Layout: CQT spectrogram arrives padded to 128 bin lanes; filters are
pre-padded to the matching (context_w * 128, 64) row layout (zero rows for
the pad bins) and pre-split into three bf16 parts on the host in float64.
The spectrogram rows needed by tile i are [i*TP, i*TP + TP + w + T - 1) —
overlapping tiles, so the kernel DMAs its own row window from HBM
(8-aligned row offsets by construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import HpfwConfig

PRINT_TILE = 128
BIN_PAD = 128


def pad_filters_split(filters: np.ndarray, cfg: HpfwConfig):
    """(w*n_bins, 64) filters -> three bf16 parts of (w*BIN_PAD, 64).

    Rows re-laid so context frame j occupies rows [j*BIN_PAD, j*BIN_PAD+121)
    (pad-bin rows are zero); split is exact, computed in float64.
    """
    import ml_dtypes

    w, b, nf = cfg.context_w, cfg.n_bins, cfg.n_filters
    full = np.zeros((w * BIN_PAD, nf), np.float64)
    src = np.asarray(filters, np.float64).reshape(w, b, nf)
    for j in range(w):
        full[j * BIN_PAD: j * BIN_PAD + b] = src[j]
    fh = full.astype(ml_dtypes.bfloat16)
    rem = full - fh.astype(np.float64)
    fm = rem.astype(ml_dtypes.bfloat16)
    fl = (rem - fm.astype(np.float64)).astype(ml_dtypes.bfloat16)
    return fh, fm, fl


def _split3(x):
    h = x.astype(jnp.bfloat16)
    r = x - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _fingerprint_kernel(spec_hbm, fh_ref, fm_ref, fl_ref, out_ref,
                        spec_vmem, sem,
                        *, w: int, lag: int, tile_rows: int, tie_ge: bool):
    i = pl.program_id(0)
    # Rows [i*TP, i*TP + tile_rows): 8-aligned offset (TP=128), 8-multiple
    # size (tile_rows padded by the caller's spec padding).
    dma = pltpu.make_async_copy(
        spec_hbm.at[pl.ds(i * PRINT_TILE, tile_rows)], spec_vmem, sem
    )
    dma.start()
    dma.wait()

    m = PRINT_TILE + lag
    # Context matrix (TP+lag, w*BIN_PAD): frame j of the window in lanes
    # [j*128, (j+1)*128) — static aligned slices of the VMEM tile.
    ctx = jnp.concatenate(
        [spec_vmem[j: j + m, :] for j in range(w)], axis=1
    )
    ah, am, al = _split3(ctx)
    bh, bm, bl = fh_ref[:], fm_ref[:], fl_ref[:]

    def dot(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    y = (dot(ah, bh)
         + (dot(ah, bm) + dot(am, bh))
         + (dot(ah, bl) + dot(am, bm) + dot(al, bh)))   # (TP+lag, 64)

    d = y[:PRINT_TILE] - y[lag: lag + PRINT_TILE]        # (TP, 64)
    bits = (d >= 0.0) if tie_ge else (d > 0.0)
    # Mosaic has no unsigned reductions: pack in int32 (bit 31 wraps the
    # sign, but summing distinct powers of two is bit-exact in two's
    # complement) and reinterpret as uint32 at the end.
    shifts = jax.lax.broadcasted_iota(jnp.int32, (PRINT_TILE, 64), 1) % 32
    vals = bits.astype(jnp.int32) << shifts
    w0 = jnp.sum(vals[:, :32], axis=1, keepdims=True, dtype=jnp.int32)
    w1 = jnp.sum(vals[:, 32:], axis=1, keepdims=True, dtype=jnp.int32)
    out_ref[:] = jnp.concatenate([w0, w1], axis=1).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def pallas_fingerprint_from_spec(spec: jnp.ndarray, filters: jnp.ndarray,
                                 cfg: HpfwConfig, *,
                                 interpret: bool = False) -> jnp.ndarray:
    """(F, n_bins) f32 CQT -> (N, 2) uint32 packed hashprints (lsb0).

    filters: (context_dim, 64) f32 — re-split on every call; cache the padded
    split via pad_filters_split + pallas_fingerprint_from_spec_presplit for
    hot loops (ops/fused.py does).
    """
    fh, fm, fl = pad_filters_split(np.asarray(filters), cfg)
    return pallas_fingerprint_from_spec_presplit(
        spec, jnp.asarray(fh), jnp.asarray(fm), jnp.asarray(fl), cfg,
        interpret=interpret)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def pallas_fingerprint_from_spec_presplit(
    spec: jnp.ndarray, fh: jnp.ndarray, fm: jnp.ndarray, fl: jnp.ndarray,
    cfg: HpfwConfig, *, interpret: bool = False,
) -> jnp.ndarray:
    assert cfg.bit_order == "lsb0", "pallas encoder implements lsb0 packing"
    f = spec.shape[0]
    w, lag = cfg.context_w, cfg.delta_lag
    n_out = f - w + 1 - lag
    if n_out <= 0:
        return jnp.zeros((0, 2), jnp.uint32)
    n_tiles = -(-n_out // PRINT_TILE)
    tile_rows = PRINT_TILE + lag + w - 1
    tile_rows = -(-tile_rows // 8) * 8
    # Pad spec rows so the last tile's DMA stays in bounds, and bins to 128.
    f_need = (n_tiles - 1) * PRINT_TILE + tile_rows
    spec_p = jnp.zeros((max(f_need, f), BIN_PAD), jnp.float32)
    spec_p = spec_p.at[:f, : cfg.n_bins].set(spec.astype(jnp.float32)[:, : cfg.n_bins])

    out = pl.pallas_call(
        functools.partial(_fingerprint_kernel, w=w, lag=lag,
                          tile_rows=tile_rows, tie_ge=cfg.tie_break == "ge"),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # spec (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),              # fh
            pl.BlockSpec(memory_space=pltpu.VMEM),              # fm
            pl.BlockSpec(memory_space=pltpu.VMEM),              # fl
        ],
        out_specs=pl.BlockSpec((PRINT_TILE, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * PRINT_TILE, 2), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, BIN_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(spec_p, fh, fm, fl)
    return out[:n_out]
