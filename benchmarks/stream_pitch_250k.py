"""Streaming live-rendition PITCH at 250k tracks (round 5).

The round-5 pitch-hypothesis scan reaches live sessions
(streaming/session.py: ACQUIRE scans the full pitch x tempo grid, a lock
stores (tempo, pitch-roll), TRACK pins the locked roll). This measures
the production pairing at the judged scale — the sibling of
stream_stretch_250k.py on the pitch axis:

  leg 1  a +1 semitone rendition, in tempo, from cold: time-to-lock,
         the locked (tempo, pitch) hypothesis, ACQUIRE (V=35 grid) vs
         TRACK (3-point tempo neighborhood at the locked roll) per-tick
         latency.
  leg 2  the realistic combined live case: +0.5 st AND x1.03 tempo —
         both axes must lock from one grid.

Catalog: benchmarks/real_catalog.py artifacts (same protocol as
stream_stretch_250k.py). Renditions: io/synth_jax.py live_query_batch,
-12 dB noise.

Run: python benchmarks/stream_pitch_250k.py [pitch_st] [track_id]
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


def stream_leg(tag, pcm, truth, sess, sr, chunk):
    lock_s = None
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
        "tempo": round(sess.tempo, 4), "pitch_bins": int(sess.pitch),
        "state": sess._scan_state,
        "tick_p50_acquire_ms": round(float(np.percentile(
            tick_by_state["acquire"], 50)), 1)
        if tick_by_state["acquire"] else None,
        "tick_p50_track_ms": round(float(np.percentile(
            tick_by_state["track"], 50)), 1)
        if tick_by_state["track"] else None,
    }
    log(f"{tag}: {out}")
    return out


def main(pitch_st=1.0, track_id=1234):
    cfg = HpfwConfig.catalog_scale(stretch_span=0.03, pitch_span_bins=2)
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
    chunk = sr // 10   # 100 ms mic cadence

    # Leg 1: pitched rendition, in tempo, from cold.
    pcm = np.asarray(synth_jax.live_query_batch(
        [track_id], [int(5.0 * sr)], TRACK_S, 30.0, cfg,
        pitch_st=pitch_st, noise_db=-12.0))[0]
    leg1 = stream_leg(f"pitch {pitch_st:+.1f} st from cold", pcm,
                      str(track_id), _session(cfg, ts, filters), sr, chunk)

    # Leg 2: the realistic combined live case — pitched AND stretched.
    pcm2 = np.asarray(synth_jax.live_query_batch(
        [track_id], [int(5.0 * sr)], TRACK_S, 30.0, cfg,
        pitch_st=pitch_st / 2.0, stretch=1.03, noise_db=-12.0))[0]
    leg2 = stream_leg(f"pitch {pitch_st / 2.0:+.2f} st x1.03 tempo", pcm2,
                      str(track_id), _session(cfg, ts, filters), sr, chunk)

    emit("stream_pitch_250k", leg1.get("lock_s"), "s_to_lock",
         n_tracks=N_TRACKS, pitch_st=pitch_st, cold=leg1, combined=leg2)


if __name__ == "__main__":
    main(*(float(a) if "." in a else int(a) for a in sys.argv[1:]))
