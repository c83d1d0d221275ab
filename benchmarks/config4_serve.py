"""Serving benchmark: MatchServer under Poisson load at catalog scale.

Submits queries with exponential inter-arrival times at several offered
loads and reports per-load p50/p99 end-to-end latency (submit -> ranked
result, including host ranking and the relay) plus achieved QPS — the
config-4 QPS story measured as an actual service, not just a queued-kernel
number. Micro-batching is what holds the curve up: at high load the server
coalesces arrivals into one coarse-DB sweep per batch.

Usage: python benchmarks/config4_serve.py [n_tracks] [track_s] [query_s]
                                           [loads_qps...]
"""

import sys
import threading
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.config4_scale import noisy_excerpt, synth_print_db
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.match.scaled import TwoStageDB
from hpfw_tpu.serve import MatchServer


def main(n_tracks=100_000, track_seconds=60, query_seconds=10, *loads):
    loads = [float(x) for x in loads] or [50.0, 100.0, 200.0, 300.0]
    cfg = HpfwConfig()
    fps = cfg.frames_per_second
    n_prints = int(track_seconds * fps)
    n_q = int(query_seconds * fps)
    rng = np.random.default_rng(0)
    prints = synth_print_db(rng, n_tracks, n_prints)
    db = api.FingerprintDB(cfg, np.zeros((cfg.context_dim, 64), np.float32),
                           [str(i) for i in range(n_tracks)], prints,
                           np.full(n_tracks, n_prints, np.int32))
    t0 = time.time()
    ts = TwoStageDB(db, stride=32)
    log(f"db ready in {time.time() - t0:.1f}s ({n_tracks} tracks)")

    n_queries = 64
    queries, truths = [], []
    for _ in range(n_queries):
        tid = int(rng.integers(0, n_tracks))
        off = int(rng.integers(0, n_prints - n_q))
        queries.append(noisy_excerpt(rng, prints[tid], off, n_q))
        truths.append(str(tid))

    results = {}
    with MatchServer(ts, n_q, max_batch=16, max_wait_ms=4.0) as srv:
        log("warming batch buckets...")
        srv.warmup(queries[0])
        for lam in loads:
            lat = [None] * n_queries
            hits = [0]
            lock = threading.Lock()

            def cb(i, t_sub):
                def done(fut):
                    ids, _, _ = fut.result()
                    with lock:
                        lat[i] = time.perf_counter() - t_sub
                        hits[0] += ids[0] == truths[i]
                return done

            gaps = rng.exponential(1.0 / lam, n_queries)
            t_start = time.perf_counter()
            for i, q in enumerate(queries):
                t_sub = time.perf_counter()
                srv.submit(q).add_done_callback(cb(i, t_sub))
                time.sleep(max(0.0, gaps[i]))
            while any(v is None for v in lat):
                time.sleep(0.005)
            wall = time.perf_counter() - t_start
            ms = np.array(lat) * 1e3
            results[lam] = (np.percentile(ms, 50), np.percentile(ms, 99),
                            n_queries / wall, hits[0])
            log(f"offered {lam:6.0f} QPS: p50 {results[lam][0]:7.1f} ms  "
                f"p99 {results[lam][1]:7.1f} ms  achieved "
                f"{results[lam][2]:6.0f} QPS  recall {hits[0]}/{n_queries}")
    best = max(loads, key=lambda l: results[l][2])
    emit("config4_serving_qps", round(results[best][2], 1), "qps",
         p50_ms=round(float(results[best][0]), 1),
         p99_ms=round(float(results[best][1]), 1),
         recall=results[best][3] / n_queries, n_tracks=n_tracks,
         offered=best,
         note="MatchServer micro-batching, Poisson arrivals, e2e incl. "
              "relay + host ranking")


if __name__ == "__main__":
    main(*[float(a) if "." in a else int(a) for a in sys.argv[1:]])
