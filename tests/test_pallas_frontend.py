"""Fused Pallas filterbank kernel vs the float64 oracle (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from hpfw_tpu import oracle
from hpfw_tpu.io import synth
from hpfw_tpu.ops.pallas_frontend import pallas_cqt_from_frames


def test_pallas_cqt_matches_oracle(cfg):
    # cfg fixture: frame_len 2048, K_TILE 4096 doesn't divide -> use the
    # production frame_len with a short signal instead.
    from hpfw_tpu.config import HpfwConfig

    full = HpfwConfig()
    pcm = synth.synth_track(3, 1.2, full)
    frames64 = oracle.frame_signal(pcm, full)
    want = oracle.cqt(pcm, full)
    got = np.asarray(pallas_cqt_from_frames(
        jnp.asarray(frames64, dtype=jnp.float32), full, interpret=True))
    assert got.shape == want.shape
    # X6-equivalent precision: agreement at f32 level on the log spectrogram.
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_pallas_cqt_frame_tile_padding():
    from hpfw_tpu.config import HpfwConfig

    full = HpfwConfig()
    # F = 7 frames: not a multiple of FRAME_TILE, exercises the pad path.
    n = full.frame_len + 6 * full.hop
    pcm = synth.synth_track(4, n / full.sample_rate + 0.01, full)[:n]
    frames = oracle.frame_signal(pcm, full)
    assert frames.shape[0] == 7
    got = np.asarray(pallas_cqt_from_frames(
        jnp.asarray(frames, dtype=jnp.float32), full, interpret=True))
    want = oracle.cqt(pcm, full)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)
