"""@tpu smoke subset: every Pallas kernel at small scale on the REAL chip,
asserted exactly equal to its XLA twin (VERDICT r1 item 8).

    HPFW_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q

First run pays Mosaic remote compiles (minutes); the persistent cache makes
subsequent runs seconds. The CPU suite covers the same kernels in interpret
mode; this subset is what catches Mosaic/hardware regressions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hpfw_tpu.config import HpfwConfig

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("real TPU backend unavailable")


def test_coarse_kernel_exact_on_hardware():
    from hpfw_tpu.ops import coarse as coarse_ops
    from hpfw_tpu.ops.pallas_coarse import flatten_coarse, pallas_coarse_scan

    rng = np.random.default_rng(0)
    t, lc, nc = 256, 40, 7
    q = rng.choice([-1, 1], (nc, 64)).astype(np.int8)
    d = rng.choice([-1, 1], (t, lc, 64)).astype(np.int8)
    for i, ln in enumerate(rng.integers(nc, lc + 1, size=t)):
        d[i, ln:] = 0
    corr = np.asarray(coarse_ops.coarse_correlation(jnp.asarray(q), jnp.asarray(d)))
    best, idx = pallas_coarse_scan(jnp.asarray(q),
                                   flatten_coarse(jnp.asarray(d)), lc_true=lc)
    np.testing.assert_array_equal(np.asarray(best), corr.max(axis=1))
    np.testing.assert_array_equal(np.asarray(idx), corr.argmax(axis=1))


def test_fine_kernel_exact_on_hardware():
    from hpfw_tpu.match.scaled import _fine_rescan
    from hpfw_tpu.ops.pallas_fine import pallas_fine_rescan, plane_pad

    rng = np.random.default_rng(1)
    t, l, n, fw = 64, 400, 50, 8
    n_fine = 2 * fw + 1
    prints = rng.integers(0, 2 ** 32, (t, l, 2), dtype=np.uint32)
    lengths = rng.integers(n, l + 1, size=t).astype(np.int32)
    lengths[7] = l   # the planted window must lie inside the track
    for i, ln in enumerate(lengths):
        prints[i, ln:] = 0
    query = rng.integers(0, 2 ** 32, (n, 2), dtype=np.uint32)
    prints[7, 100:100 + n] = query
    d0, d1, lpad = plane_pad(prints)
    cand = rng.permutation(t)[:16].astype(np.int32)
    cand[0] = 7
    centers = rng.integers(0, l - n, size=16).astype(np.int32)
    centers[0] = 100
    span = n + n_fine - 1
    starts = np.clip(centers - fw, 0, max(l - span, 0)).astype(np.int32)
    s_hw, o_hw = pallas_fine_rescan(
        jnp.asarray(query), jnp.asarray(d0), jnp.asarray(d1),
        jnp.asarray(lengths), jnp.asarray(cand), jnp.asarray(starts),
        n_fine=n_fine, lpad=lpad)
    s_xla, o_xla = _fine_rescan(jnp.asarray(query), jnp.asarray(prints[cand]),
                                jnp.asarray(lengths[cand]),
                                jnp.asarray(centers), fine_window=fw)
    np.testing.assert_array_equal(np.asarray(s_hw), np.asarray(s_xla))
    np.testing.assert_array_equal(np.asarray(o_hw), np.asarray(o_xla))
    assert int(s_hw[0]) == 64 * n and int(o_hw[0]) == 100


def test_dense_pallas_matcher_exact_on_hardware():
    from hpfw_tpu.match import matcher
    from hpfw_tpu.ops.pallas_match import pallas_score_tracks

    rng = np.random.default_rng(2)
    t, l, n = 48, 300, 40
    prints = rng.integers(0, 2 ** 32, (t, l, 2), dtype=np.uint32)
    lengths = rng.integers(20, l + 1, size=t).astype(np.int32)
    for i, ln in enumerate(lengths):
        prints[i, ln:] = 0
    query = rng.integers(0, 2 ** 32, (n, 2), dtype=np.uint32)
    prints[11, 77:77 + n] = query
    s_hw, o_hw = pallas_score_tracks(jnp.asarray(query), jnp.asarray(prints),
                                     jnp.asarray(lengths))
    s_xla, o_xla = matcher.score_tracks(jnp.asarray(query),
                                        jnp.asarray(prints),
                                        jnp.asarray(lengths))
    np.testing.assert_array_equal(np.asarray(s_hw), np.asarray(s_xla))
    np.testing.assert_array_equal(np.asarray(o_hw), np.asarray(o_xla))


def test_fused_extraction_margin_audited_on_hardware():
    """Hardware bar for the fused (3-way-split) extraction kernel, measured
    2026-08-16: 9 / 18,816 bits flip vs the float64 oracle, every flip at a
    delta margin below 5.3e-3 x rms — fine for matching (queries tolerate
    15% flips) but not bit-contract grade, which is why the XLA X6 path
    (0 flips, and 1.4x faster: bench.py vs bench.py --pallas) is the
    default. This test pins both behaviors."""
    from hpfw_tpu import api, oracle
    from hpfw_tpu.io import synth
    from tests.test_tpu_pipeline import assert_bits_match_with_margin_audit

    cfg = HpfwConfig()
    pcm = synth.synth_track(5, 8.0, cfg)
    rng = np.random.default_rng(3)
    filters = oracle.fix_eigenvector_signs(
        rng.standard_normal((cfg.context_dim, cfg.n_filters))
        / np.sqrt(cfg.context_dim)).astype(np.float32)
    fused = api.fingerprint(pcm, filters, cfg, use_pallas=True)
    want = oracle.fingerprint(pcm, filters, cfg)
    margins = oracle.delta_margins(pcm, filters, cfg)
    assert_bits_match_with_margin_audit(fused, want, margins, rel_tol=1e-2)
    # And the default XLA path stays strictly f32-true on hardware:
    xla = api.fingerprint(pcm, filters, cfg, use_pallas=False)
    diff = int(np.unpackbits(np.ascontiguousarray(
        np.bitwise_xor(xla, want)).view(np.uint8)).sum())
    assert diff == 0, f"XLA path: {diff} bits differ from the float64 oracle"


def test_batched_coarse_kernel_exact_on_hardware():
    """The stacked batch kernel's in-group shift-reduce tree and one-hot
    selection GEMMs are Mosaic-level constructs interpret mode can't fully
    validate — compile + exactness on HW, odd B (lane padding) included."""
    from hpfw_tpu.ops import coarse as coarse_ops
    from hpfw_tpu.ops.pallas_coarse import (flatten_coarse,
                                            pallas_coarse_scan_batch_stacked)

    rng = np.random.default_rng(4)
    t, lc, nc, b = 256, 40, 7, 5
    qs = rng.choice([-1, 1], (b, nc, 64)).astype(np.int8)
    d = rng.choice([-1, 1], (t, lc, 64)).astype(np.int8)
    for i, ln in enumerate(rng.integers(nc, lc + 1, size=t)):
        d[i, ln:] = 0
    best, idx = pallas_coarse_scan_batch_stacked(
        jnp.asarray(qs), flatten_coarse(jnp.asarray(d)), lc_true=lc)
    for k in range(b):
        corr = np.asarray(coarse_ops.coarse_correlation(
            jnp.asarray(qs[k]), jnp.asarray(d)))
        np.testing.assert_array_equal(np.asarray(best[k]), corr.max(axis=1))
        np.testing.assert_array_equal(np.asarray(idx[k]), corr.argmax(axis=1))
