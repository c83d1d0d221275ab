"""Mid-stream TRACK CHANGE re-lock at 250k tracks (VERDICT r4 item 7).

PARITY claims "mid-stream track changes re-lock within 6 match windows";
the only prior evidence was a 12-track unit test (tests/test_streaming.py).
This measures the claim at the judged scale: a StreamingSession over the
REAL 250k-track catalog (benchmarks/real_catalog.py artifacts — the same
protocol as stream_stretch_250k.py, which is stronger than
config3_streaming's planted-random-print DB) is fed 15 s of catalog track
A, then the stream switches to catalog track B (a DJ cut / venue change).
Reports re-lock latency in SECONDS of audio and in MATCH WINDOWS (ticks
of the 128-print sliding matcher) from the switch to the first tick whose
best hypothesis is track B, plus whether the session's integrated
current_best ends on B.

Run: python benchmarks/churn_250k.py [track_a] [track_b] [n_pairs]
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
LEG_S = 15.0
NOISE_DB = -12.0


def main(track_a=1234, track_b=98765, n_pairs=5):
    cfg = HpfwConfig.catalog_scale()
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
    rng = np.random.default_rng(7)
    pairs = [(track_a, track_b)] + [
        tuple(int(x) for x in rng.choice(N_TRACKS, 2, replace=False))
        for _ in range(n_pairs - 1)]

    rows = []
    for a, b in pairs:
        pcm_a = np.asarray(synth_jax.live_query_batch(
            [a], [int(5.0 * sr)], TRACK_S, LEG_S, cfg,
            noise_db=NOISE_DB))[0]
        pcm_b = np.asarray(synth_jax.live_query_batch(
            [b], [int(8.0 * sr)], TRACK_S, LEG_S, cfg,
            noise_db=NOISE_DB))[0]
        stream = np.concatenate([pcm_a, pcm_b])
        switch_pos = len(pcm_a)
        sess = StreamingSession(ts, filters, cfg, query_prints=128,
                                chunk_prints=32)
        locked_a = False
        relock_s = relock_windows = None
        windows_since_switch = 0
        fed = 0
        t0 = time.time()
        for pos in range(0, len(stream), chunk):
            nb = len(sess.match_latencies_ms)
            best = sess.feed(stream[pos:pos + chunk])
            fed += chunk
            ticked = len(sess.match_latencies_ms) > nb
            if fed <= switch_pos:
                if best and best.track_id == str(a):
                    locked_a = True
            else:
                if ticked:
                    windows_since_switch += 1
                if (best and best.track_id == str(b)
                        and relock_s is None):
                    relock_s = (fed - switch_pos) / sr
                    relock_windows = windows_since_switch
        end_on_b = bool(sess.current_best
                        and sess.current_best.track_id == str(b))
        rows.append({"a": a, "b": b, "locked_a": locked_a,
                     "relock_s": relock_s,
                     "relock_windows": relock_windows,
                     "end_on_b": end_on_b,
                     "wall_s": round(time.time() - t0, 1)})
        log(f"churn {a}->{b}: {rows[-1]}")

    ok = [r for r in rows if r["relock_s"] is not None]
    med_s = float(np.median([r["relock_s"] for r in ok])) if ok else None
    med_w = float(np.median([r["relock_windows"] for r in ok])) if ok else None
    emit("churn_relock_250k", med_s, "s_median",
         n_tracks=N_TRACKS, n_pairs=len(pairs), noise_db=NOISE_DB,
         relocked=len(ok), median_windows=med_w, rows=rows)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
