"""Pallas Hamming-scan kernel vs dense matcher/oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from hpfw_tpu import oracle
from hpfw_tpu.match import matcher
from hpfw_tpu.ops.pallas_match import pallas_score_tracks


def _random_db(rng, n_tracks, lengths, l_pad=None):
    l = l_pad or max(lengths)
    prints = np.zeros((n_tracks, l, 2), dtype=np.uint32)
    for i, ln in enumerate(lengths):
        prints[i, :ln] = rng.integers(0, 2 ** 32, (ln, 2), dtype=np.uint32)
    return prints, np.array(lengths, dtype=np.int32)


def test_pallas_matches_oracle_random():
    rng = np.random.default_rng(0)
    lengths = [300, 251, 300, 77, 300, 123, 290, 300, 265]
    prints, lens = _random_db(rng, len(lengths), lengths)
    q = rng.integers(0, 2 ** 32, (40, 2), dtype=np.uint32)
    s, o = pallas_score_tracks(jnp.asarray(q), jnp.asarray(prints),
                               jnp.asarray(lens), interpret=True)
    for i in range(len(lengths)):
        s_want, o_want = oracle.match_track(q, prints[i, :lengths[i]])
        assert int(s[i]) == s_want, f"track {i}"
        assert int(o[i]) == o_want, f"track {i}"


def test_pallas_short_track_and_planted_match():
    rng = np.random.default_rng(1)
    lengths = [200, 15, 64, 200]
    prints, lens = _random_db(rng, 4, lengths)
    # Plant the query inside track 2 at offset 9 — but track 2 is only 64
    # long with query 40: offsets 0..24 valid.
    q = rng.integers(0, 2 ** 32, (40, 2), dtype=np.uint32)
    prints[2, 9:49] = q
    s, o = pallas_score_tracks(jnp.asarray(q), jnp.asarray(prints),
                               jnp.asarray(lens), interpret=True)
    assert int(s[2]) == 64 * 40 and int(o[2]) == 9
    # Track 1 (len 15 < query 40): truncated head-overlap at offset 0.
    s_want, o_want = oracle.match_track(q, prints[1, :15])
    assert int(s[1]) == s_want and int(o[1]) == 0


def test_pallas_equals_dense_matcher_many_offsets():
    rng = np.random.default_rng(2)
    # > 128 offsets to cross offset-block boundaries: L=400, N=37 -> 364 offsets
    lengths = [400] * 5 + [397, 385]
    prints, lens = _random_db(rng, 7, lengths)
    q = rng.integers(0, 2 ** 32, (37, 2), dtype=np.uint32)
    s_d, o_d = matcher.score_tracks(jnp.asarray(q), jnp.asarray(prints), jnp.asarray(lens))
    s_p, o_p = pallas_score_tracks(jnp.asarray(q), jnp.asarray(prints),
                                   jnp.asarray(lens), interpret=True)
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_d))
    np.testing.assert_array_equal(np.asarray(o_p), np.asarray(o_d))


def test_pallas_tie_breaks_to_first_offset():
    # Identical content at two offsets -> lowest offset must win.
    rng = np.random.default_rng(3)
    q = rng.integers(0, 2 ** 32, (10, 2), dtype=np.uint32)
    track = np.zeros((200, 2), dtype=np.uint32)
    track[50:60] = q
    track[150:160] = q
    prints = track[None]
    lens = np.array([200], dtype=np.int32)
    s, o = pallas_score_tracks(jnp.asarray(q), jnp.asarray(prints),
                               jnp.asarray(lens), interpret=True)
    assert int(s[0]) == 64 * 10
    assert int(o[0]) == 50
