"""BASELINE config 2: batch extraction of 1k full-length tracks on one chip.

Metric: realtime factor per chip (audio-seconds fingerprinted per wall
second). Inputs stream through device-resident buffers in batches; the chip
pipeline is the jitted framing+NDFT+projection+binarize program.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log, make_filters
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth


def main(n_tracks=1000, seconds=240.0, batch=16):
    import jax
    import jax.numpy as jnp

    cfg = HpfwConfig()
    filters = make_filters(cfg)
    n_samples = int(seconds * cfg.sample_rate)
    log(f"backend={jax.default_backend()}; {n_tracks} tracks x {seconds:.0f}s, batch {batch}")

    # Synthesize one batch's worth of distinct audio and reuse it with small
    # perturbations for the remaining batches (synthesizing 1k x 4 min of
    # numpy audio would dominate the harness, not the chip).
    base = np.stack([synth.synth_track(500 + i, seconds, cfg)[:n_samples]
                     for i in range(batch)])
    fn = api._fingerprint_batch_jit(cfg, n_samples, False)
    filters_dev = jnp.asarray(filters)

    log("compile + warmup...")
    t0 = time.time()
    out = np.asarray(fn(jnp.asarray(base), filters_dev))
    log(f"first run {time.time() - t0:.1f}s; prints/track {out.shape[1]}")

    n_batches = -(-n_tracks // batch)
    # 8 distinct device-resident input buffers, cycled (defeats any relay
    # memoization; uploads excluded — a production pipeline overlaps them).
    bufs = [jnp.asarray(base + np.float32(i * 1e-6)) for i in range(8)]
    for b in bufs:
        b.block_until_ready()

    t0 = time.perf_counter()
    outs = [fn(bufs[i % 8], filters_dev) for i in range(n_batches)]
    np.asarray(outs[-1])
    wall = time.perf_counter() - t0
    audio_s = n_batches * batch * seconds
    rtf = audio_s / wall
    emit("config2_extraction_rtf_per_chip", round(rtf, 1), "x_realtime",
         tracks=n_batches * batch, track_seconds=seconds, wall_s=round(wall, 3),
         vs_target_1000x=round(rtf / 1000.0, 2))
    log(f"config2: {rtf:.0f}x realtime")


if __name__ == "__main__":
    main(*[int(float(a)) for a in sys.argv[1:]])
