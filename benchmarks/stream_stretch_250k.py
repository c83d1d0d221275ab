"""Streaming live-rendition tempo at 250k tracks: the ACQUIRE/TRACK scan.

The production pairing for live song ID when the performance tempo
differs from the catalog: a StreamingSession over the real 250k-track
catalog (benchmarks/real_catalog.py artifacts) fed a device-synthesized
3%-fast rendition of a catalog track (synth_jax.live_query_batch — same
score, different tempo, -12 dB noise). Reports time-to-lock, the locked
tempo factor, per-tick match latency in acquire vs track states, and —
second half of the stream — a mid-stream TEMPO CHANGE (the performer
speeds up from 1.0 to 1.03) with the time to re-acquire.

Run: python benchmarks/stream_stretch_250k.py [stretch] [track_id]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.real_catalog import paths
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth_jax
from hpfw_tpu.match.scaled import TwoStageDB
from hpfw_tpu.streaming.session import StreamingSession

N_TRACKS = 250_000
TRACK_S = 60.0


def _session(cfg, ts, filters):
    return StreamingSession(ts, filters, cfg, query_prints=128,
                            chunk_prints=32)


def main(stretch=1.03, track_id=1234):
    import jax.numpy as jnp  # noqa: F401

    cfg = HpfwConfig.catalog_scale(stretch_span=0.03)
    d = paths(N_TRACKS, TRACK_S)
    filters = np.load(os.path.join(d, "filters.npy"))
    prints = np.load(os.path.join(d, "prints.npy"), mmap_mode="r")
    lengths = np.full(N_TRACKS, prints.shape[1], np.int32)
    from hpfw_tpu import api

    db = api.FingerprintDB(cfg, filters,
                           [str(i) for i in range(N_TRACKS)],
                           prints, lengths)
    t0 = time.time()
    ts = TwoStageDB(db)
    log(f"two-stage ready in {time.time() - t0:.0f}s")

    sr = cfg.sample_rate
    chunk = sr // 10   # 100 ms

    def stream_leg(tag, pcm, truth, sess):
        lock_s = relock_guard = None
        fed = 0
        tick_by_state = {"acquire": [], "track": []}
        for pos in range(0, len(pcm), chunk):
            state = sess._scan_state
            nb = len(sess.match_latencies_ms)
            best = sess.feed(pcm[pos:pos + chunk])
            fed += chunk
            if len(sess.match_latencies_ms) > nb:
                tick_by_state[state].append(sess.match_latencies_ms[-1])
            if (best and best.track_id == truth and lock_s is None
                    and sess._scan_state == "track"):
                lock_s = fed / sr
        ok = (sess.current_best is not None
              and sess.current_best.track_id == truth)
        out = {
            "identified": bool(ok), "lock_s": lock_s,
            "tempo": round(sess.tempo, 4), "state": sess._scan_state,
            "tick_p50_acquire_ms": round(float(np.percentile(
                tick_by_state["acquire"], 50)), 1)
            if tick_by_state["acquire"] else None,
            "tick_p50_track_ms": round(float(np.percentile(
                tick_by_state["track"], 50)), 1)
            if tick_by_state["track"] else None,
        }
        log(f"{tag}: {out}")
        return out

    # Leg 1: 3%-fast rendition from cold — full acquisition at 250k.
    pcm = np.asarray(synth_jax.live_query_batch(
        [track_id], [int(5.0 * sr)], TRACK_S, 30.0, cfg,
        stretch=stretch, noise_db=-12.0))[0]
    leg1 = stream_leg(f"stretch x{stretch} from cold", pcm, str(track_id),
                      _session(cfg, ts, filters))

    # Leg 2: the performer SPEEDS UP mid-stream (1.0 -> stretch), same
    # track: the session must notice (unconfident windows), re-acquire,
    # and re-center its tempo.
    pcm_a = np.asarray(synth_jax.live_query_batch(
        [track_id], [int(5.0 * sr)], TRACK_S, 15.0, cfg,
        stretch=1.0, noise_db=-12.0))[0]
    pcm_b = np.asarray(synth_jax.live_query_batch(
        [track_id], [int(20.0 * sr)], TRACK_S, 15.0, cfg,
        stretch=stretch, noise_db=-12.0))[0]
    sess2 = _session(cfg, ts, filters)
    switched = np.concatenate([pcm_a, pcm_b])
    switch_pos = len(pcm_a)
    tempo_at_switch = re_acquire_s = None
    fed = 0
    for pos in range(0, len(switched), chunk):
        sess2.feed(switched[pos:pos + chunk])
        fed += chunk
        if pos < switch_pos <= pos + chunk:
            tempo_at_switch = sess2.tempo
        if (fed > switch_pos and re_acquire_s is None
                and abs(sess2.tempo - stretch) < 0.015):
            re_acquire_s = (fed - switch_pos) / sr
    leg2 = {"tempo_before": tempo_at_switch,
            "tempo_after": round(sess2.tempo, 4),
            "re_acquire_s": re_acquire_s,
            "still_locked": bool(sess2.current_best
                                 and sess2.current_best.track_id
                                 == str(track_id))}
    log(f"mid-stream speed-up: {leg2}")
    emit("stream_stretch_250k", leg1.get("lock_s"), "s_to_lock",
         n_tracks=N_TRACKS, stretch=stretch, cold=leg1, speedup=leg2)


if __name__ == "__main__":
    main(*(float(a) if "." in a else int(a) for a in sys.argv[1:]))
