"""Pin the single-query gap: stage sums vs queued per-query time (VERDICT
r2 weak #3 / next-round #3).

RESULTS.md attributes the ~3 ms difference between two-stage stage sums
(~3.6 ms) and the queued single-query number (~6.4 ms at 250k) to relay
dispatch overhead BY SUBTRACTION. This benchmark measures the attribution
directly:

  A. queued full two-stage dispatches (the flagship protocol) -> T_full
  B. queued dispatches of a TRIVIAL jit taking the SAME argument list
     (d0, d1, lengths, db_c, query) but ~zero compute -> T_args
     (per-dispatch host/queue/relay overhead for this arg structure)
  C. queued dispatches of a no-arg trivial jit -> T_noop
     (baseline per-dispatch overhead)
  D. a jax.profiler perfetto trace over the queued loop; the summed device
     kernel time per dispatch -> T_device

Reconciliation: T_full ~= T_device + (T_args - T_noop) + queue slack.
If instead T_full >> T_device + overhead, there is a real host-side stall
to fix.

    python benchmarks/trace_single_query.py [n_tracks] [track_s] [query_s]
                                            [stride] [channels] [pool]
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.config4_scale import noisy_excerpt, synth_print_db
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.match.scaled import TwoStageDB

TRACE_DIR = "/tmp/hpfw_trace"


def queued_ms(fn, inputs, iters=40):
    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        outs.append(fn(inputs[i % len(inputs)]))
    np.asarray(outs[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def perfetto_device_ms(trace_dir, n_iters):
    """Sum device-track event durations from the perfetto trace, per iter."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.json.gz"),
                      recursive=True)
    if not paths:
        return None, "no perfetto trace found"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # device tracks: process names containing 'TPU' (xprof convention)
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "tpu" in n or "/device" in n}
    total_us = sum(e.get("dur", 0) for e in events
                   if e.get("ph") == "X" and e.get("pid") in dev_pids)
    if total_us == 0:
        return None, f"no device events (pids seen: {set(pid_name.values())})"
    return total_us / 1e3 / n_iters, f"{len(paths)} trace file(s)"


def main(n_tracks=250_000, track_seconds=60, query_seconds=10,
         stride=32, channels=32, pool=2048):
    import jax
    import jax.numpy as jnp

    cfg = HpfwConfig(coarse_channels=channels)
    fps = cfg.frames_per_second
    n_prints = int(track_seconds * fps)
    n_q = int(query_seconds * fps)
    rng = np.random.default_rng(0)
    prints = synth_print_db(rng, n_tracks, n_prints)
    db = api.FingerprintDB(cfg, np.zeros((cfg.context_dim, 64), np.float32),
                           [str(i) for i in range(n_tracks)], prints,
                           np.full(n_tracks, n_prints, np.int32))
    t0 = time.time()
    ts = TwoStageDB(db, stride=stride)
    log(f"db ready {time.time() - t0:.0f}s")
    queries = []
    for _ in range(8):
        tid = int(rng.integers(0, n_tracks))
        off = int(rng.integers(0, n_prints - n_q))
        queries.append(jnp.asarray(noisy_excerpt(rng, prints[tid], off, n_q)))
    for q in queries:
        q.block_until_ready()

    # compile + settle: right after the big derivation the first dispatches
    # can run seconds each (allocator churn); burst until steady.
    ts.dispatch(queries[0], pool=pool).block_until_ready()
    for _ in range(3):
        t_settle = queued_ms(lambda q: ts.dispatch(q, pool=pool), queries,
                             iters=10)
        log(f"  settle burst: {t_settle:.2f} ms/query")
        if t_settle < 100:
            break

    # --- A: full two-stage, queued ---
    t_full = queued_ms(lambda q: ts.dispatch(q, pool=pool), queries)

    # --- B: same argument structure, trivial compute ---
    @jax.jit
    def arg_probe(q, d0, d1, lengths, db_c):
        return (q[0, 0].astype(jnp.int32) + d0[0].astype(jnp.int32)
                + d1[0].astype(jnp.int32) + lengths[0]
                + db_c.reshape(-1)[0].astype(jnp.int32))

    arg_probe(queries[0], ts.d0, ts.d1, ts.lengths, ts.db_c
              ).block_until_ready()
    t_args = queued_ms(
        lambda q: arg_probe(q, ts.d0, ts.d1, ts.lengths, ts.db_c), queries)

    # --- C: no-arg trivial dispatch ---
    one = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def noop(x):
        return x.sum()

    noop(one).block_until_ready()
    t_noop = queued_ms(lambda q: noop(one), queries)

    # --- D: perfetto trace of the queued loop ---
    import shutil

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    n_iters = 20
    dev_ms, note = None, "trace skipped"
    try:
        jax.profiler.start_trace(TRACE_DIR, create_perfetto_trace=True)
        outs = [ts.dispatch(queries[i % len(queries)], pool=pool)
                for i in range(n_iters)]
        np.asarray(outs[-1])
        jax.profiler.stop_trace()
        dev_ms, note = perfetto_device_ms(TRACE_DIR, n_iters)
    except Exception as e:  # tracing is best-effort on this relay stack
        note = f"trace failed: {e}"

    overhead = t_args - t_noop
    emit("single_query_gap_attribution", round(t_full, 2), "ms_per_query",
         trivial_same_args_ms=round(t_args, 2),
         trivial_noop_ms=round(t_noop, 2),
         per_dispatch_arg_overhead_ms=round(overhead, 2),
         device_busy_ms_per_query=(round(dev_ms, 2) if dev_ms else None),
         trace_note=note,
         residual_ms=round(t_full - (dev_ms or 0) - overhead - t_noop, 2)
         if dev_ms else None,
         n_tracks=n_tracks, stride=stride, channels=channels, pool=pool)
    log(f"full {t_full:.2f} ms | same-args trivial {t_args:.2f} ms | "
        f"noop {t_noop:.2f} ms | device busy "
        f"{dev_ms if dev_ms else float('nan'):.2f} ms ({note})")


if __name__ == "__main__":
    main(*[int(float(a)) for a in sys.argv[1:]])
