"""TPU CQT front end — GEMM-native NDFT (jnp reference path).

The reference computes its spectrogram frame-by-frame with an FFT on CPU
(SURVEY.md §2.1 row 2; mount empty, reconstructed). On TPU the idiomatic
formulation is one big matmul on the MXU: frame the PCM, then multiply by a
dense complex NDFT kernel matrix (real and imaginary parts as two f32
GEMMs). No FFT butterflies, no per-bin loops, static shapes throughout —
XLA tiles the (F x frame_len) @ (frame_len x n_bins) contraction straight
onto the systolic array. (GEMM-native NDFT frontends: PAPERS.md, MelT.)

All GEMMs run with precision=HIGHEST so float32 results track the float64
oracle to ~1e-6 relative — the margin-audit tests (tests/test_tpu_pipeline.py)
quantify the agreement at the bit level.

The fused Pallas version of this stage lives in ops/pallas_frontend.py;
this jnp path is its correctness anchor and the universal fallback (CPU,
interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HpfwConfig
from ..oracle.pipeline import cqt_kernel_matrix

HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=8)
def cqt_kernel_arrays(cfg: HpfwConfig) -> tuple[np.ndarray, np.ndarray]:
    """The oracle's complex NDFT kernel as two float32 matrices (re, im).

    Shape (frame_len, n_bins) each. Cached per config; computed in float64
    then rounded once to float32 so every caller sees identical weights.
    """
    k = cqt_kernel_matrix(cfg)
    return (
        np.ascontiguousarray(k.real, dtype=np.float32),
        np.ascontiguousarray(k.imag, dtype=np.float32),
    )


def frame_signal(pcm: jnp.ndarray, cfg: HpfwConfig) -> jnp.ndarray:
    """(S,) PCM -> (F, frame_len) overlapping frames; F is static given S.

    Implemented as a strided gather; XLA lowers this to an efficient copy.
    Frame t = pcm[t*hop : t*hop + frame_len], identical to the oracle.
    """
    f = cfg.n_frames(pcm.shape[0])
    idx = (
        jnp.arange(cfg.frame_len, dtype=jnp.int32)[None, :]
        + cfg.hop * jnp.arange(f, dtype=jnp.int32)[:, None]
    )
    return pcm[idx]


def cqt(pcm: jnp.ndarray, cfg: HpfwConfig) -> jnp.ndarray:
    """Log-magnitude CQT, shape (F, n_bins) float32.

    spec = log(eps + |frames @ K|) with the complex GEMM split into two real
    GEMMs. Mirrors oracle.cqt bit-for-bit up to f32 rounding.
    """
    kr, ki = cqt_kernel_arrays(cfg)
    frames = frame_signal(pcm.astype(jnp.float32), cfg)
    re = jnp.dot(frames, kr, precision=HIGHEST)
    im = jnp.dot(frames, ki, precision=HIGHEST)
    mag = jnp.sqrt(re * re + im * im)
    return jnp.log(cfg.log_eps + mag)


def cqt_from_frames(frames: jnp.ndarray, cfg: HpfwConfig) -> jnp.ndarray:
    """CQT for pre-framed input (streaming path reuses frames)."""
    kr, ki = cqt_kernel_arrays(cfg)
    re = jnp.dot(frames.astype(jnp.float32), kr, precision=HIGHEST)
    im = jnp.dot(frames.astype(jnp.float32), ki, precision=HIGHEST)
    mag = jnp.sqrt(re * re + im * im)
    return jnp.log(cfg.log_eps + mag)
