"""BASELINE config 3: streaming live-song ID — sliding-window overlapping
hashprints, continuous match, p50/p99 end-to-end latency.

Simulates a microphone delivering 100 ms chunks of a noisy live performance;
every chunk feeds the halo-chunked extractor and the sliding query matches
the catalog continuously.

Two modes:
  small (default): real-audio catalog, dense FingerprintDB match.
  catalog scale (n_tracks > 1000): the live track's prints are planted in a
    random-print DB of n_tracks and the session matches against a TwoStageDB
    — the production pairing (streaming x catalog-scale matcher). Metrics
    add the device-side match latency at the streaming query shape.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log, make_filters
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth
from hpfw_tpu.streaming.session import StreamingSession


def _dense_db(cfg, filters, n_tracks, track_seconds):
    tracks = synth.synth_catalog(n_tracks, track_seconds, cfg)
    return api.build_db(tracks, filters, cfg), tracks, None


def _catalog_db(cfg, filters, n_tracks, track_seconds, n_real=8):
    """Random-print DB with n_real real synthesized tracks planted."""
    from hpfw_tpu.match.scaled import TwoStageDB

    rng = np.random.default_rng(0)
    n_prints = int(track_seconds * cfg.frames_per_second)
    log(f"synthesizing {n_real} real tracks + {n_tracks} random-print DB "
        f"({n_tracks * n_prints * 8 / 1e9:.2f} GB packed)...")
    real = [synth.synth_track(1000 + i, track_seconds, cfg) for i in range(n_real)]
    prints = rng.integers(0, 2 ** 32, (n_tracks, n_prints, 2), dtype=np.uint32)
    lengths = np.full(n_tracks, n_prints, np.int32)
    real_ids = rng.choice(n_tracks, size=n_real, replace=False)
    for i, tid in enumerate(real_ids):
        fp = api.fingerprint(real[i], filters, cfg)
        n = min(fp.shape[0], n_prints)
        prints[tid, :n] = fp[:n]
        prints[tid, n:] = 0
        lengths[tid] = n
    db = api.FingerprintDB(cfg, filters, [str(i) for i in range(n_tracks)],
                           prints, lengths)
    t0 = time.time()
    ts = TwoStageDB(db)
    log(f"TwoStageDB ready in {time.time() - t0:.1f}s")
    return ts, real, real_ids


def main(n_tracks=100, track_seconds=60.0, stream_seconds=30.0,
         query_prints=128):
    at_scale = n_tracks > 1000
    # At catalog scale the production pairing uses the measured operating
    # point (phased two-pass coarse, RESULTS.md round 3) — random-phase
    # stream windows otherwise lose coarse recall exactly like offline
    # queries do.
    cfg = HpfwConfig.catalog_scale() if at_scale else HpfwConfig()
    filters = make_filters(cfg)
    log(f"catalog: {n_tracks} x {track_seconds:.0f}s "
        f"({'two-stage' if at_scale else 'dense'})")
    if at_scale:
        db, real_tracks, real_ids = _catalog_db(cfg, filters, n_tracks,
                                                track_seconds)
        live_i = 3
        truth = str(real_ids[live_i])
        live_track = real_tracks[live_i]
    else:
        db, tracks, _ = _dense_db(cfg, filters, n_tracks, track_seconds)
        truth = "17"
        live_track = tracks[17]

    sess = StreamingSession(db, filters, cfg, query_prints=query_prints,
                            chunk_prints=32)
    live = synth.make_query(live_track, 5.0, stream_seconds, cfg,
                            noise_db=-12.0, seed=4)
    chunk = cfg.sample_rate // 10  # 100 ms
    first_correct_s = first_guess_s = None
    fed = 0
    for pos in range(0, len(live), chunk):
        best = sess.feed(live[pos:pos + chunk])
        fed += chunk
        if best and first_guess_s is None:
            first_guess_s = fed / cfg.sample_rate
        if best and best[0] == truth and first_correct_s is None:
            first_correct_s = fed / cfg.sample_rate
    stats = sess.latency_stats()
    ok = sess.current_best is not None and sess.current_best[0] == truth
    emit("config3_stream_match_p50_ms", round(stats["match_p50_ms"], 2), "ms",
         p99=round(stats["match_p99_ms"], 2), n_matches=stats["n_matches"],
         identified=bool(ok), time_to_id_s=first_correct_s,
         time_to_first_hypothesis_s=first_guess_s,
         final_confidence=(round(float(sess.current_best.confidence), 3)
                           if sess.current_best else None),
         query_buckets=list(sess.query_buckets),
         n_tracks=n_tracks)
    emit("config3_stream_step_p50_ms", round(stats["step_p50_ms"], 2), "ms",
         p99=round(stats["step_p99_ms"], 2),
         realtime_budget_ms=100.0)
    log(f"config3: identified={ok} time_to_id={first_correct_s}s "
        f"match p50={stats['match_p50_ms']:.1f}ms p99={stats['match_p99_ms']:.1f}ms")

    if at_scale and hasattr(db, "dispatch"):
        # Device-side match latency at the streaming query shape (the e2e
        # p50 above includes the ~32 ms host-relay roundtrip per match).
        import jax.numpy as jnp

        q = jnp.asarray(np.array(sess._ring, dtype=np.uint32))
        np.asarray(db.dispatch(q))  # settle/compile (already compiled above)
        iters = 20
        t0 = time.perf_counter()
        outs = [db.dispatch(q) for _ in range(iters)]
        np.asarray(outs[-1])
        per_ms = (time.perf_counter() - t0) / iters * 1e3
        emit("config3_device_match_ms", round(per_ms, 2), "ms",
             n_tracks=n_tracks, query_prints=query_prints)
        log(f"config3 device-side streaming match: {per_ms:.2f} ms")

    # --- track-change re-lock at this scale (VERDICT r3 weak #7) ---------
    if at_scale:
        live2_i = 5
        truth2 = str(real_ids[live2_i])
        live2 = synth.make_query(real_tracks[live2_i], 3.0,
                                 stream_seconds / 2, cfg,
                                 noise_db=-12.0, seed=9)
        switched = np.concatenate([live[: len(live) // 2], live2])
        sess2 = StreamingSession(db, filters, cfg,
                                 query_prints=query_prints, chunk_prints=32)
        switch_pos = len(live) // 2
        relock_s = None
        windows_after = 0
        fed = 0
        for pos in range(0, len(switched), chunk):
            nb = len(sess2.match_latencies_ms)
            best = sess2.feed(switched[pos:pos + chunk])
            fed += chunk
            if pos + chunk > switch_pos and len(sess2.match_latencies_ms) > nb:
                windows_after += 1
                if best and best.track_id == truth2 and relock_s is None:
                    relock_s = (fed - switch_pos) / cfg.sample_rate
        ok2 = (sess2.current_best is not None
               and sess2.current_best.track_id == truth2)
        emit("config3_track_change_relock_s",
             round(relock_s, 2) if relock_s is not None else None, "s",
             n_tracks=n_tracks, relocked=bool(ok2),
             windows_after_switch=windows_after,
             ring_flush_s=round(query_prints / cfg.frames_per_second, 2))
        log(f"config3 re-lock after mid-stream track change: {relock_s}s "
            f"(ring flush alone is "
            f"{query_prints / cfg.frames_per_second:.1f}s), ok={ok2}")


if __name__ == "__main__":
    main(*[int(float(a)) for a in sys.argv[1:]])
