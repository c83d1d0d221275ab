"""Time-stretch tolerance study (CPU, small scale) — designs the stretch-scan.

The 250k robustness eval (robustness_250k.py) found a cliff: ±3% tempo
drops top-1 to the noise floor for BOTH learned and random filters. The
failure is rigid-alignment drift, not rank: scoring sums exact Hamming
similarity over ~430 query frames at ONE offset, and 3% cumulative drift
passes half a frame after ~17 frames.

The cheap mitigation is a QUERY-SIDE STRETCH SCAN: re-time the query's
print sequence at K hypothesized tempo factors (a gather along the time
axis — no re-extraction, no catalog change) and keep the best-scoring
hypothesis. Before spending TPU time at 250k, this study measures, at
CPU scale (400 tracks x 30 s, 10 s queries — the production query
length, so drift geometry is exact):

  1. the raw tolerance curve: top-1 vs true stretch in {0.3%, 0.5%, 1%,
     2%, 3%} — how much residual stretch a single rigid alignment absorbs
     (sets the scan's grid spacing);
  2. `inv`: the oracle-inverse print-resample (hypothesis = truth) —
     whether print re-timing recovers the score despite the within-context
     distortion that re-timing cannot undo (context windows span 20 frames
     of the STRETCHED signal);
  3. `grid`: the production candidate — max score over a 7-point 1%-spaced
     grid (residual <= 0.5%);
  4. whether the grid HURTS the undistorted case (score inflation from 6
     extra hypotheses on 64-bit prints).

Run:  python benchmarks/stretch_study.py [n_queries]
Artifacts cached in /tmp/hpfw_stretch; CPU-forced (the real chip stays
free for the measurement queue).
"""

import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("HPFW_NO_COMPILE_CACHE", "1")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

if jax.default_backend() != "cpu":
    # sitecustomize initializes the axon TPU backend before env vars can
    # win; force CPU and rebuild (same dance as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
    import jax.extend as jex

    jex.backend.clear_backends()
assert jax.default_backend() == "cpu"

import jax.numpy as jnp
import numpy as np

from benchmarks.common import emit, log
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth_jax
from hpfw_tpu.match import matcher
from hpfw_tpu.match.stretch import print_variants, stretch_grid

N_TRACKS = 400
TRACK_S = 30.0
QUERY_S = 10.0
NOISE_DB = -10.0
BATCH = 8
DIR = "/tmp/hpfw_stretch"

# (label, true stretch factor)
STRETCHES = [1.0, 1.003, 1.005, 1.01, 1.02, 1.03, 0.97]
GRID = stretch_grid(0.03, 0.01)     # 7 factors, 1% spacing


def _filters(cfg):
    p = "/tmp/hpfw_real_cat/250000_60/filters.npy"
    if os.path.exists(p):
        log("using the 250k learned filters")
        return np.load(p)
    log("250k filters absent; learning on this catalog's first 64 tracks")
    pcm = np.concatenate([np.asarray(synth_jax.synth_batch(
        np.arange(i, i + BATCH), TRACK_S, cfg)) for i in range(0, 64, BATCH)])
    return api.learn_filters(pcm, cfg)


def _catalog(cfg, filters):
    os.makedirs(DIR, exist_ok=True)
    ppath = os.path.join(DIR, "prints.npy")
    if os.path.exists(ppath + ".done"):
        return np.load(ppath)
    fp = api._fingerprint_batch_jit(cfg, int(TRACK_S * cfg.sample_rate), False)
    fdev = jnp.asarray(filters)
    t0 = time.time()
    out = []
    for s0 in range(0, N_TRACKS, BATCH):
        ids = np.arange(s0, min(s0 + BATCH, N_TRACKS))
        out.append(np.asarray(fp(synth_jax.synth_batch(ids, TRACK_S, cfg),
                                 fdev)))
        if s0 and s0 % 64 == 0:
            log(f"  catalog {s0}/{N_TRACKS} ({time.time() - t0:.0f}s)")
    prints = np.concatenate(out)[:N_TRACKS]
    np.save(ppath, prints)
    open(ppath + ".done", "w").write("ok")
    log(f"catalog built in {time.time() - t0:.0f}s")
    return prints


def _queries(cfg, filters, stretch, n_q):
    rng = np.random.default_rng(11)
    truths = rng.integers(0, N_TRACKS, n_q)
    starts = rng.integers(0, int((TRACK_S - QUERY_S - 1) * cfg.sample_rate),
                          n_q)
    nseeds = rng.integers(0, 1 << 30, n_q)
    fp = api._fingerprint_batch_jit(cfg, int(QUERY_S * cfg.sample_rate), False)
    fdev = jnp.asarray(filters)
    out = []
    for i in range(0, n_q, BATCH):
        sl = slice(i, min(i + BATCH, n_q))
        pcm = synth_jax.live_query_batch(
            truths[sl], starts[sl], TRACK_S, QUERY_S, cfg,
            pitch_st=0.0, stretch=stretch, noise_db=NOISE_DB,
            noise_seeds=nseeds[sl])
        out.append(np.asarray(fp(pcm, fdev)))
    return np.concatenate(out)[:n_q], truths


def main(n_q=100):
    cfg = HpfwConfig.catalog_scale()
    filters = _filters(cfg)
    prints = _catalog(cfg, filters)
    lengths = jnp.full((N_TRACKS,), prints.shape[1], np.int32)
    pdev = jnp.asarray(prints)

    score_jit = jax.jit(lambda q: matcher.score_tracks(q, pdev, lengths)[0])

    def top1(qbatch, truths):
        """qbatch (n_q, V, N, 2): argmax score over variants AND tracks."""
        correct = 0
        for i in range(qbatch.shape[0]):
            s = np.stack([np.asarray(score_jit(jnp.asarray(qbatch[i, v])))
                          for v in range(qbatch.shape[1])])
            correct += int(np.unravel_index(s.argmax(), s.shape)[1]) \
                == truths[i]
        return correct / qbatch.shape[0]

    results = {}
    for s in STRETCHES:
        q, truths = _queries(cfg, filters, s, n_q)
        t0 = time.time()
        plain = top1(q[:, None], truths)
        inv = top1(print_variants(q, [s]), truths) if s != 1.0 else plain
        grid = top1(print_variants(q, GRID), truths)
        results[f"s{s}"] = {"plain": plain, "inv": inv, "grid": grid}
        log(f"stretch {s}: plain {plain:.3f}  inv {inv:.3f}  "
            f"grid {grid:.3f}  ({time.time() - t0:.0f}s)")
    emit("stretch_study", results["s1.03"]["grid"], "top1_accuracy",
         n_tracks=N_TRACKS, n_queries=n_q, grid=[round(g, 3) for g in GRID],
         **{k: v for k, v in results.items()})


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
