"""BASELINE config 3: streaming live-song ID — sliding-window overlapping
hashprints, continuous match, p50/p99 end-to-end latency.

Simulates a microphone delivering 100 ms chunks of a noisy live performance;
every chunk feeds the halo-chunked extractor and the sliding query matches
the catalog continuously.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log, make_filters
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth
from hpfw_tpu.streaming.session import StreamingSession


def main(n_tracks=100, track_seconds=60.0, stream_seconds=30.0):
    cfg = HpfwConfig()
    filters = make_filters(cfg)
    log(f"catalog: {n_tracks} x {track_seconds:.0f}s")
    tracks = synth.synth_catalog(n_tracks, track_seconds, cfg)
    db = api.build_db(tracks, filters, cfg)

    sess = StreamingSession(db, filters, cfg, query_prints=128, chunk_prints=32)
    live = synth.make_query(tracks[17], 5.0, stream_seconds, cfg,
                            noise_db=-12.0, seed=4)
    chunk = cfg.sample_rate // 10  # 100 ms
    first_correct_s = None
    fed = 0
    for pos in range(0, len(live), chunk):
        best = sess.feed(live[pos:pos + chunk])
        fed += chunk
        if best and best[0] == "17" and first_correct_s is None:
            first_correct_s = fed / cfg.sample_rate
    stats = sess.latency_stats()
    ok = sess.current_best is not None and sess.current_best[0] == "17"
    emit("config3_stream_match_p50_ms", round(stats["match_p50_ms"], 2), "ms",
         p99=round(stats["match_p99_ms"], 2), n_matches=stats["n_matches"],
         identified=bool(ok), time_to_id_s=first_correct_s)
    emit("config3_stream_step_p50_ms", round(stats["step_p50_ms"], 2), "ms",
         p99=round(stats["step_p99_ms"], 2),
         realtime_budget_ms=100.0)
    log(f"config3: identified={ok} time_to_id={first_correct_s}s "
        f"match p50={stats['match_p50_ms']:.1f}ms p99={stats['match_p99_ms']:.1f}ms")


if __name__ == "__main__":
    main(*[int(float(a)) for a in sys.argv[1:]])
