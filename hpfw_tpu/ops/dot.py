"""Precision-controlled matmul for the bit-exactness contract.

The hashprint contract needs float32-grade GEMMs (SURVEY.md §7.4.1): with
default TPU precision the MXU computes in bfloat16 (measured ~3e-3 relative
error — far too coarse), while `precision=HIGHEST` triggers a pathological
multi-minute compile on this TPU stack. The sweet spot measured here:

  - TPU default: DotAlgorithmPreset.BF16_BF16_F32_X6 — 6-pass bf16
    emulation, f32-true (~1e-7; measured 0 flipped bits vs the float64
    oracle on a full-config track), ~20-70 s one-time compile per dot
    shape (persistently cached).
  - BF16_BF16_F32_X3 via HPFW_DOT_ALGO=x3 for fast iteration (~2 s
    compile, ~1.3e-5 — rare single-bit flips at near-zero margins).
  - CPU: plain HIGHEST = native exact f32 (the presets are *emulated* on
    CPU at ~1e-5 — worse than just using f32).

Override with HPFW_DOT_ALGO in {x3, x6, highest, default}.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

_DN = (((1,), (0,)), ((), ()))


def _tpu_algorithm():
    algo = os.environ.get("HPFW_DOT_ALGO", "x6").lower()
    if algo == "x3":
        return lax.DotAlgorithmPreset.BF16_BF16_F32_X3
    if algo == "x6":
        return lax.DotAlgorithmPreset.BF16_BF16_F32_X6
    if algo == "highest":
        return lax.Precision.HIGHEST
    return None  # default backend precision


def precise_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a @ b with float32-grade accuracy and sane compile time per backend."""
    if jax.default_backend() == "tpu":
        alg = _tpu_algorithm()
        if alg is None:
            return jnp.dot(a, b)
        return lax.dot_general(a, b, _DN, precision=alg)
    return jnp.dot(a, b, precision=lax.Precision.HIGHEST)
