"""Pallas TPU kernel: fused NDFT filterbank (CQT GEMM + log-magnitude).

The frontend's complex NDFT GEMM with its magnitude/log epilogue in ONE
kernel (the "fused Pallas filterbank" of the north star): frames stream in
as pipelined VMEM tiles, the kernel runs the (TF x frame_len) x
(frame_len x 2*n_bins_pad) contraction on the MXU, and the |.| + log
epilogue happens in-register before the spectrogram tile ever leaves VMEM.

Precision: the MXU multiplies in bfloat16, so a plain f32 matmul here is
only ~3e-3 accurate — useless for the bit-exactness contract. The kernel
therefore does the 6-product 3-way-split emulation (the same scheme as
XLA's BF16_BF16_F32_X6 algorithm): both operands split into three bf16
parts capturing 24 mantissa bits, keeping every product with relative
significance >= 2^-16 and accumulating in f32. Measured agreement with the
float64 oracle is at f32 level (tests/test_pallas_frontend.py).

Layout: the kernel consumes pre-built frames (framing itself is pure
strided copying that XLA already does at memcpy speed; HBM row slices at
non-8-aligned offsets are illegal for in-kernel DMA on this stack). The
CQT kernel matrix is pre-split on the host in float64 (exact) with real
and imaginary banks side by side, bins padded to 128 lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import HpfwConfig
from ..oracle.pipeline import cqt_kernel_matrix

FRAME_TILE = 64
BIN_PAD = 128     # re bank cols [0, 128), im bank cols [128, 256)
K_TILE = 4096     # reduction tiled to bound resident K-split VMEM


def _split3(x: jnp.ndarray):
    """f32 -> three bf16 parts covering 24 mantissa bits."""
    h = x.astype(jnp.bfloat16)
    r = x - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


@functools.lru_cache(maxsize=8)
def cqt_kernel_split(cfg: HpfwConfig):
    """Host-side exact 3-way bf16 split of the padded (frame_len, 256) NDFT
    kernel: cols [0,121) real bank, [128,249) imaginary bank."""
    k = cqt_kernel_matrix(cfg)  # complex128 (frame_len, n_bins)
    full = np.zeros((cfg.frame_len, 2 * BIN_PAD), np.float64)
    full[:, : cfg.n_bins] = k.real
    full[:, BIN_PAD: BIN_PAD + cfg.n_bins] = k.imag
    import ml_dtypes

    kh = full.astype(ml_dtypes.bfloat16)
    rem = full - kh.astype(np.float64)
    km = rem.astype(ml_dtypes.bfloat16)
    kl = (rem - km.astype(np.float64)).astype(ml_dtypes.bfloat16)
    return kh, km, kl


def _frontend_kernel(fr_ref, kh_ref, km_ref, kl_ref, out_ref, acc,
                     *, log_eps: float):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    ah, am, al = _split3(fr_ref[:])
    bh, bm, bl = kh_ref[:], km_ref[:], kl_ref[:]

    def dot(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    # X6-style product set: every term with significance >= 2^-16.
    acc[:] += (dot(ah, bh)
               + (dot(ah, bm) + dot(am, bh))
               + (dot(ah, bl) + dot(am, bm) + dot(al, bh)))

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        re = acc[:, :BIN_PAD]
        im = acc[:, BIN_PAD:]
        out_ref[:] = jnp.log(log_eps + jnp.sqrt(re * re + im * im))


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def pallas_cqt_from_frames(frames: jnp.ndarray, cfg: HpfwConfig,
                           *, interpret: bool = False) -> jnp.ndarray:
    """(F, frame_len) f32 frames -> (F, n_bins) log-magnitude CQT."""
    f = frames.shape[0]
    assert frames.shape[1] == cfg.frame_len
    assert cfg.frame_len % K_TILE == 0
    f_pad = -(-max(f, 1) // FRAME_TILE) * FRAME_TILE
    if f_pad != f:
        frames = jnp.pad(frames, ((0, f_pad - f), (0, 0)))
    kh, km, kl = cqt_kernel_split(cfg)
    n_k = cfg.frame_len // K_TILE
    spec = pl.pallas_call(
        functools.partial(_frontend_kernel, log_eps=cfg.log_eps),
        grid=(f_pad // FRAME_TILE, n_k),
        in_specs=[
            pl.BlockSpec((FRAME_TILE, K_TILE), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_TILE, 2 * BIN_PAD), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_TILE, 2 * BIN_PAD), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_TILE, 2 * BIN_PAD), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FRAME_TILE, BIN_PAD), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_pad, BIN_PAD), jnp.float32),
        scratch_shapes=[pltpu.VMEM((FRAME_TILE, 2 * BIN_PAD), jnp.float32)],
        interpret=interpret,
    )(frames, jnp.asarray(kh), jnp.asarray(km), jnp.asarray(kl))
    return spec[:f, : cfg.n_bins]
