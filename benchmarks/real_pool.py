"""StreamingPool capacity at the 250k REAL-AUDIO catalog.

config3_pool.py measures the pool against iid planted prints (matcher
perffloor); this driver runs it against the flagship's real-audio catalog
(benchmarks/real_catalog.py artifacts) at the catalog_scale preset, with
each stream playing a noisy (-10 dB) rendition of a real catalog track —
the production live-ID shape with checkable identification.

Run AFTER `python benchmarks/real_catalog.py build 250000 60`:

    python benchmarks/real_pool.py [n_tracks] [seconds] [B ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.real_catalog import paths
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth_jax
from hpfw_tpu.match.scaled import TwoStageDB
from hpfw_tpu.streaming.pool import StreamingPool

NOISE_DB = -10.0


def main(n_tracks=250_000, secs=60.0, caps=(16, 32), chunk_prints=32,
         query_prints=128):
    import jax

    d = paths(n_tracks, secs)
    assert os.path.exists(os.path.join(d, "prints.done")), \
        "run real_catalog.py build first"
    prints = np.load(os.path.join(d, "prints.npy"), mmap_mode="r")
    filters = np.load(os.path.join(d, "filters.npy"))
    lengths = np.full(n_tracks, prints.shape[1], np.int32)
    cfg = HpfwConfig.catalog_scale()
    log(f"backend={jax.default_backend()}  real catalog {n_tracks} tracks")

    db = api.FingerprintDB(cfg, filters, [str(i) for i in range(n_tracks)],
                           prints, lengths)
    t0 = time.time()
    ts = TwoStageDB(db)
    log(f"two-stage db ready in {time.time() - t0:.0f}s")

    # Stream audio: catalog tracks 0..K-1 re-synthesized + noise.
    k = max(caps)
    rng = np.random.default_rng(1)
    log(f"synthesizing {k} stream tracks (+{NOISE_DB} dB noise)...")
    pcm = np.asarray(synth_jax.synth_batch(np.arange(k), secs, cfg))
    rms = np.sqrt((pcm ** 2).mean(axis=1, keepdims=True))
    noise = rng.standard_normal(pcm.shape).astype(np.float32)
    pcm = pcm + noise * (rms * 10.0 ** (NOISE_DB / 20.0))

    chunk_samples = chunk_prints * cfg.hop
    chunk_seconds = chunk_samples / cfg.sample_rate
    for b in caps:
        pool = StreamingPool(ts, filters, cfg, capacity=b,
                             chunk_prints=chunk_prints,
                             query_prints=query_prints,
                             query_buckets=(query_prints,))
        for i in range(b):
            pool.add_stream(str(i))
        pos = {str(i): 0 for i in range(b)}

        def tick():
            chunk = {}
            for i in range(b):
                sid = str(i)
                p = pos[sid]
                chunk[sid] = pcm[i, p: p + chunk_samples]
                pos[sid] = p + chunk_samples
            return pool.feed(chunk)

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
        log(f"B={b}: tick {tick_s * 1e3:.2f} ms -> {streams:.0f} "
            f"real-time streams/chip (ID {correct}/{b})")
        emit("real_pool_tick_ms", round(tick_s * 1e3, 2), "ms",
             B=b, n_tracks=n_tracks)
        emit("real_pool_streams_per_chip", round(streams, 1), "streams",
             B=b, n_tracks=n_tracks, id_correct=correct)


if __name__ == "__main__":
    a = sys.argv[1:]
    n = int(float(a[0])) if a else 250_000
    secs = float(a[1]) if len(a) > 1 else 60.0
    caps = tuple(int(x) for x in a[2:]) or (16, 32)
    main(n, secs, caps)
