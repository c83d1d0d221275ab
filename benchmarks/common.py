"""Shared helpers for the five judged benchmark configs (BASELINE.md).

Each benchmark prints human-readable progress to stderr and ONE JSON object
per metric line to stdout, matching BASELINE.json's headline metrics:
realtime-factor/chip, QPS, p50/p99 match latency.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(metric: str, value, unit: str, **extra):
    print(json.dumps({"metric": metric, "value": value, "unit": unit, **extra}),
          flush=True)


def make_filters(cfg, seed=0):
    from hpfw_tpu.oracle import fix_eigenvector_signs

    rng = np.random.default_rng(seed)
    f = rng.standard_normal((cfg.context_dim, cfg.n_filters)) / np.sqrt(cfg.context_dim)
    return fix_eigenvector_signs(f).astype(np.float32)


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def ms(self):
        return (time.perf_counter() - self.t0) * 1e3


def queued_time(fn, inputs, materialize, iters=None):
    """Wall time of queued dispatches with only the last result materialized.

    The host link here is a slow relay (~32 ms/roundtrip, ~40 MB/s H2D);
    queueing measures device throughput the way a real pipeline (which keeps
    data device-resident) experiences it.
    """
    iters = iters if iters is not None else len(inputs)
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(inputs[i % len(inputs)])
    materialize(out)
    return (time.perf_counter() - t0) / iters
