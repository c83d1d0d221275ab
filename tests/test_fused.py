"""Fused Pallas extraction pipeline vs the float64 oracle (interpret mode).

Same margin-audited bit-exactness bar as the XLA path
(tests/test_tpu_pipeline.py).
"""

import numpy as np
import jax.numpy as jnp

from hpfw_tpu import oracle
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth
from hpfw_tpu.ops import fused
from tests.test_tpu_pipeline import assert_bits_match_with_margin_audit


def _full_cfg():
    return HpfwConfig()


def test_fused_pipeline_margin_audited_bits():
    cfg = _full_cfg()
    rng = np.random.default_rng(0)
    filters = oracle.fix_eigenvector_signs(
        rng.standard_normal((cfg.context_dim, 64)) / np.sqrt(cfg.context_dim)
    ).astype(np.float32)
    pcm = synth.synth_track(31, 8.0, cfg)
    got = np.asarray(fused.fingerprint(jnp.asarray(pcm), jnp.asarray(filters),
                                       cfg, interpret=True))
    want = oracle.fingerprint(pcm, filters, cfg)
    margins = oracle.delta_margins(pcm, filters, cfg)
    assert got.shape == want.shape == (cfg.n_hashprints(len(pcm)), 2)
    assert_bits_match_with_margin_audit(got, want, margins)


def test_fused_pipeline_matches_xla_path_bits():
    """Fused Pallas vs default XLA path: both f32-true, near-identical bits."""
    cfg = _full_cfg()
    rng = np.random.default_rng(1)
    filters = oracle.fix_eigenvector_signs(
        rng.standard_normal((cfg.context_dim, 64)) / np.sqrt(cfg.context_dim)
    ).astype(np.float32)
    pcm = synth.synth_track(32, 6.0, cfg)
    from hpfw_tpu.ops import fingerprint as fp_ops
    from hpfw_tpu.ops import frontend

    spec = frontend.cqt(jnp.asarray(pcm), cfg)
    xla = np.asarray(fp_ops.fingerprint_from_spec(spec, jnp.asarray(filters), cfg))
    pallas = np.asarray(fused.fingerprint(jnp.asarray(pcm), jnp.asarray(filters),
                                          cfg, interpret=True))
    diff = int(np.bitwise_count(np.bitwise_xor(xla, pallas).astype(np.uint64)).sum())
    # Two f32-grade paths: only near-zero-margin bits may differ.
    assert diff <= max(2, xla.size * 32 // 10000), f"{diff} differing bits"
