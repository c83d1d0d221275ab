"""Fully-Pallas extraction pipeline: PCM -> packed hashprints.

Assembles the fused filterbank kernel (ops/pallas_frontend.py) and the
fused hashprint encoder (ops/pallas_fingerprint.py) behind the same
signature as the XLA path (api.fingerprint(..., use_pallas=True)). Framing
stays in XLA (pure strided copies). Bit-level agreement with the float64
oracle is at the same X6/f32-true level as the default path (margin-audited
in tests/test_fused.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import HpfwConfig
from . import frontend
from .pallas_fingerprint import BIN_PAD, pallas_fingerprint_from_spec_presplit
from .pallas_frontend import pallas_cqt_from_frames


def filters_pad_split(filters: jnp.ndarray, cfg: HpfwConfig):
    """(w*n_bins, 64) f32 filters -> three bf16 parts of (w*BIN_PAD, 64).

    jnp (trace-safe); the 3-way bf16 split of an f32 value is exact, so this
    matches the host-side float64 split bit for bit for f32 inputs.
    """
    w, b, nf = cfg.context_w, cfg.n_bins, cfg.n_filters
    src = filters.astype(jnp.float32).reshape(w, b, nf)
    full = jnp.zeros((w, BIN_PAD, nf), jnp.float32).at[:, :b].set(src)
    full = full.reshape(w * BIN_PAD, nf)
    fh = full.astype(jnp.bfloat16)
    rem = full - fh.astype(jnp.float32)
    fm = rem.astype(jnp.bfloat16)
    fl = (rem - fm.astype(jnp.float32)).astype(jnp.bfloat16)
    return fh, fm, fl


def fingerprint(pcm: jnp.ndarray, filters: jnp.ndarray, cfg: HpfwConfig,
                *, interpret: bool = False) -> jnp.ndarray:
    """PCM -> (N, 2) uint32 hashprints via the fused Pallas kernels."""
    frames = frontend.frame_signal(pcm.astype(jnp.float32), cfg)
    spec = pallas_cqt_from_frames(frames, cfg, interpret=interpret)
    fh, fm, fl = filters_pad_split(filters, cfg)
    return pallas_fingerprint_from_spec_presplit(
        spec, fh, fm, fl, cfg, interpret=interpret)
