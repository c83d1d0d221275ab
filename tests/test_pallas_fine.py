"""Pallas fine-rescan kernel vs the XLA _fine_rescan twin (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from hpfw_tpu.match.scaled import _fine_rescan
from hpfw_tpu.ops.pallas_fine import pallas_fine_rescan, plane_pad, plane_lpad


def test_plane_lpad_alignment():
    for l in [1, 100, 1024, 2579]:
        lp = plane_lpad(l)
        assert lp % 1024 == 0 and lp >= l + 2048


def test_pallas_fine_matches_xla_twin():
    rng = np.random.default_rng(0)
    t, l, n, fw = 32, 300, 90, 16
    n_fine = 2 * fw + 1
    prints = rng.integers(0, 2 ** 32, (t, l, 2), dtype=np.uint32)
    lengths = np.full(t, l, np.int32)
    lengths[3] = 150
    lengths[9] = 60   # shorter than the query
    q = rng.integers(0, 2 ** 32, (n, 2), dtype=np.uint32)
    prints[7, 141:141 + n] = q  # planted

    k = 16
    cand_tracks = rng.permutation(t)[:k].astype(np.int32)
    cand_tracks[0] = 7
    centers = np.minimum(rng.integers(0, l - n, k), l - n).astype(np.int32)
    centers[0] = 144  # coarse peak near the plant
    starts = np.clip(centers - fw, 0, max(l - (n + n_fine - 1), 0)).astype(np.int32)

    d0, d1, lpad = plane_pad(prints)
    s_p, o_p = pallas_fine_rescan(
        jnp.asarray(q), jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(lengths),
        jnp.asarray(cand_tracks), jnp.asarray(starts),
        n_fine=n_fine, lpad=lpad, interpret=True)

    s_x, o_x = _fine_rescan(jnp.asarray(q), jnp.asarray(prints[cand_tracks]),
                            jnp.asarray(lengths[cand_tracks]),
                            jnp.asarray(centers), fine_window=fw)
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))
    np.testing.assert_array_equal(np.asarray(o_p), np.asarray(o_x))
    assert int(s_p[0]) == 64 * n and int(o_p[0]) == 141
