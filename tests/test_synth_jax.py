"""Device-side catalog synthesis fixtures (io/synth_jax.py)."""

import numpy as np

from hpfw_tpu import api
from hpfw_tpu.io import synth_jax
from tests.test_persist import _filters


def test_synth_batch_deterministic_across_batches(cfg):
    a = np.asarray(synth_jax.synth_batch(np.arange(8), 3.0, cfg))
    b = np.asarray(synth_jax.synth_batch([3, 5], 3.0, cfg))
    np.testing.assert_array_equal(a[3], b[0])
    np.testing.assert_array_equal(a[5], b[1])
    assert a.shape == (8, 3 * cfg.sample_rate) and a.dtype == np.float32
    assert np.all(np.abs(a).max(axis=1) <= 0.9 + 1e-6)


def test_synth_batch_single_matches_batch(cfg):
    """B=1 must render identically to the same track inside a batch (the
    single-iteration lax.map inlining pitfall)."""
    a = np.asarray(synth_jax.synth_batch(np.arange(6), 3.0, cfg))
    one = np.asarray(synth_jax.synth_batch([4], 3.0, cfg))
    np.testing.assert_array_equal(one[0], a[4])


def test_query_excerpts_catalog_audio(cfg):
    pcm = np.asarray(synth_jax.synth_batch(np.arange(6), 4.0, cfg))
    s = int(0.5 * cfg.sample_rate)
    q = np.asarray(synth_jax.query_batch([5], [s], 4.0, 2.0, cfg,
                                         noise_db=-80.0))
    ref = pcm[5][s:s + q.shape[1]]
    assert np.abs(q[0] - ref).max() < 1e-3   # only the -80 dB noise differs


def test_covers_have_correlated_prints(cfg):
    """Track i%10==3 re-renders track i-3 pitch-shifted: hashprints must be
    far more similar than unrelated tracks (the correlated-print stress the
    recall study needs), but not identical."""
    assert synth_jax.cover_source(3) == 0 and synth_jax.cover_source(4) is None
    pcm = np.asarray(synth_jax.synth_batch(np.arange(5), 4.0, cfg))
    filters = _filters(cfg)
    fps = api.fingerprint_batch(pcm, filters, cfg)

    def sim(a, b):
        pop = np.unpackbits(np.bitwise_xor(a, b).view(np.uint8)).sum()
        return 1.0 - pop / (a.size * 32)

    cover = sim(fps[3], fps[0])
    unrelated = sim(fps[4], fps[0])
    assert cover > 0.65 and abs(unrelated - 0.5) < 0.1
    assert cover < 0.999  # fresh noise: a cover is not a byte-copy
