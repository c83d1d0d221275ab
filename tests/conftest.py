"""Test configuration: run the whole suite on a simulated 8-device CPU mesh.

SURVEY.md §4.4: the local machine has one TPU chip, so all sharded-path tests
(DB sharding, all-gather top-k merge) run under
`--xla_force_host_platform_device_count=8` on CPU. The math is
placement-invariant; CPU also makes the suite fast and deterministic.
bench.py (not pytest) is what runs on the real TPU — plus the @tpu smoke
subset: `HPFW_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q`
runs the Pallas kernels at small scale on the real chip and asserts exact
equality with their XLA twins (catches Mosaic regressions per-commit).

This must run before jax is imported anywhere.
"""

import os

TPU_MODE = os.environ.get("HPFW_TPU_TESTS") == "1"

if not TPU_MODE:
    # No persistent compile cache in tests: it can hold CPU AOT results
    # built with a different machine profile (remote compiles), risking
    # SIGILL on load; CPU test compiles are fast anyway. (TPU smoke tests
    # DO want the cache — Mosaic remote compiles take minutes cold.)
    os.environ["HPFW_NO_COMPILE_CACHE"] = "1"

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The environment's sitecustomize registers (and initializes) the axon TPU
# backend at interpreter startup, before conftest runs — env vars alone are
# too late. Force the platform back to an 8-device CPU sim and drop the
# already-initialized backends so the next jax.devices() rebuilds on CPU.
import jax

if not TPU_MODE:
    if jax.default_backend() != "cpu" or len(jax.devices()) != 8:
        jax.config.update("jax_platforms", "cpu")
        import jax.extend as jex

        jex.backend.clear_backends()
    assert jax.default_backend() == "cpu" and len(jax.devices()) == 8

import numpy as np
import pytest

from hpfw_tpu.config import HpfwConfig


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: exact-equality smoke test on real TPU hardware "
        "(run with HPFW_TPU_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if TPU_MODE and "tpu" not in item.keywords:
            item.add_marker(pytest.mark.skip(
                reason="HPFW_TPU_TESTS=1 runs only the @tpu smoke subset"))
        elif not TPU_MODE and "tpu" in item.keywords:
            item.add_marker(pytest.mark.skip(
                reason="needs real TPU hardware (set HPFW_TPU_TESTS=1)"))


@pytest.fixture(scope="session")
def cfg():
    """Small config for fast tests: same structure, shorter frames.

    frame_len 2048 requires raising fmin so the longest CQT kernel fits
    (N_max = Q*sr/fmin <= 2048 -> fmin >= ~368 Hz); 3 octaves at 24 b/o.
    """
    return HpfwConfig(frame_len=2048, fmin=380.0, n_bins=73, hop=256,
                      context_w=8, delta_lag=4, db_downsample=4)


@pytest.fixture(scope="session")
def full_cfg():
    """The production default config (slow — use sparingly)."""
    return HpfwConfig()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
