"""Persistent XLA compilation cache setup.

This TPU stack compiles through a remote service where some programs take
minutes; the persistent cache makes that a once-per-machine cost (measured:
68 s cold -> 1.9 s warm across processes). Enabled automatically on package
import unless the user already configured a cache dir or set
HPFW_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    if os.environ.get("HPFW_NO_COMPILE_CACHE") == "1":
        return
    import jax

    try:
        if jax.config.jax_compilation_cache_dir is None:
            cache_dir = os.environ.get(
                "HPFW_COMPILE_CACHE_DIR",
                os.path.expanduser("~/.cache/jax_hpfw"),
            )
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older/newer jax without these flags: cache is an optimization only
