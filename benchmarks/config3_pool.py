"""Concurrent live-stream capacity: StreamingPool at catalog scale.

Measures how many real-time live-ID streams one chip sustains when
extraction and matching batch across streams (hpfw_tpu/streaming/pool.py)
instead of dispatching per stream (config3_streaming.py's single-session
protocol).

Catalog: synthetic iid packed prints (matcher PERFLOOR — see
config4_scale.synth_print_db's note; real-audio-statistics recall lives in
real_catalog.py) with the pool's OWN stream tracks planted as real
device-extracted prints, so every stream must keep identifying its track
while we time steady-state ticks.

Protocol: pool of B streams, single query bucket (the steady-state top
bucket), fed chunk-sized PCM pieces; after the ring fills and programs
compile, time T ticks. A tick = ONE batched extraction dispatch + ONE
batched match dispatch. streams/chip = B * chunk_seconds / tick_seconds
(each stream only needs a tick every chunk_seconds of wall time).

Run: python benchmarks/config3_pool.py [n_tracks] [B ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.config4_scale import synth_print_db
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth
from hpfw_tpu.match.scaled import TwoStageDB
from hpfw_tpu.oracle import fix_eigenvector_signs
from hpfw_tpu.streaming.pool import StreamingPool


def main(n_tracks=102_400, caps=(8, 16, 32), track_seconds=60.0,
         chunk_prints=32, query_prints=128):
    import jax

    cfg = HpfwConfig.catalog_scale()
    fps = cfg.frames_per_second
    n_prints = int(track_seconds * fps)
    rng = np.random.default_rng(0)
    log(f"backend={jax.default_backend()}  catalog={n_tracks}x{n_prints}")

    filters = fix_eigenvector_signs(
        rng.standard_normal((cfg.context_dim, cfg.n_filters))
        / np.sqrt(cfg.context_dim)).astype(np.float32)

    # Stream audio: real synth tracks, planted into the catalog as rows
    # 0..K-1 so identification stays checkable.
    k = max(caps)
    log(f"synthesizing + extracting {k} stream tracks...")
    stream_pcm = [synth.synth_track(7000 + i, track_seconds, cfg)
                  for i in range(k)]
    stream_prints = [np.asarray(api.fingerprint(p, filters, cfg))
                     for p in stream_pcm]

    prints = synth_print_db(rng, n_tracks, n_prints)
    for i, sp in enumerate(stream_prints):
        n = min(n_prints, sp.shape[0])
        prints[i, :n] = sp[:n]
    lengths = np.full(n_tracks, n_prints, np.int32)
    db = api.FingerprintDB(cfg, filters, [str(i) for i in range(n_tracks)],
                           prints, lengths)
    t0 = time.time()
    ts = TwoStageDB(db)
    log(f"two-stage db ready in {time.time() - t0:.1f}s "
        f"(preset: phases={ts.query_phases} prefilter={ts.prefilter} "
        f"C1={ts.prefilter_channels})")

    chunk_samples = chunk_prints * cfg.hop
    chunk_seconds = chunk_samples / cfg.sample_rate
    for b in caps:
        pool = StreamingPool(ts, filters, cfg, capacity=b,
                             chunk_prints=chunk_prints,
                             query_prints=query_prints,
                             query_buckets=(query_prints,))
        for i in range(b):
            pool.add_stream(str(i))
        feeds = {str(i): stream_pcm[i] for i in range(b)}
        pos = {sid: 0 for sid in feeds}

        def tick():
            chunk = {}
            for sid, pcm in feeds.items():
                p = pos[sid]
                chunk[sid] = pcm[p: p + chunk_samples]
                pos[sid] = p + chunk_samples
            return pool.feed(chunk)

        # Fill rings + compile (the first matching tick compiles the
        # batched programs).
        warm_ticks = (query_prints // chunk_prints) + 3
        t0 = time.time()
        out = None
        for _ in range(warm_ticks):
            out = tick()
        log(f"B={b}: warm ({time.time() - t0:.1f}s incl. compile)")

        n_ticks = 30
        t0 = time.time()
        for _ in range(n_ticks):
            out = tick()
        tick_s = (time.time() - t0) / n_ticks
        correct = sum(1 for sid, h in out.items()
                      if h is not None and h.track_id == sid)
        streams = b * chunk_seconds / tick_s
        log(f"B={b}: tick {tick_s * 1e3:.2f} ms  -> {streams:.0f} "
            f"real-time streams/chip  (ID {correct}/{b})")
        emit("pool_tick_ms", round(tick_s * 1e3, 2), "ms",
             B=b, n_tracks=n_tracks)
        emit("pool_streams_per_chip", round(streams, 1), "streams",
             B=b, n_tracks=n_tracks, id_correct=correct)


if __name__ == "__main__":
    args = sys.argv[1:]
    n = int(float(args[0])) if args else 102_400
    caps = tuple(int(a) for a in args[1:]) or (8, 16, 32)
    main(n, caps)
