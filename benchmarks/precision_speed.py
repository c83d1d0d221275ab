"""Extraction precision/speed study: the HPFW_DOT_ALGO ladder, measured.

The bit-exactness contract runs every contract-relevant GEMM as 6-pass
bf16 emulation (f32-true; ops/dot.py). This harness measures what the
cheaper rungs buy and cost END TO END on hardware:

  for algo in x6 (contract), x3, default (plain bf16 MXU):
    - extraction throughput (the bench.py queued protocol, best of 2)
    - hashprint bit agreement vs the x6 reference prints
    - top-1 identification accuracy for noisy queries against a catalog
      whose DB prints were extracted with the SAME algo (the realistic
      deployment: one algo end-to-end)

Run: python benchmarks/precision_speed.py [n_tracks] [seconds]
NOTE: each algo is a separate process (the algo is chosen at import via
env), so this script re-execs itself per rung.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import log

ALGOS = ("x6", "x3", "default")


def worker(algo: str, n_tracks: int, seconds: float) -> None:
    os.environ["HPFW_DOT_ALGO"] = algo
    import jax
    import jax.numpy as jnp

    from hpfw_tpu import api, oracle
    from hpfw_tpu.config import HpfwConfig
    from hpfw_tpu.io import synth

    cfg = HpfwConfig()
    rng = np.random.default_rng(0)
    filters = oracle.fix_eigenvector_signs(
        rng.standard_normal((cfg.context_dim, cfg.n_filters))
        / np.sqrt(cfg.context_dim)).astype(np.float32)
    n_samples = int(seconds * cfg.sample_rate)
    pcms = np.stack([synth.synth_track(100 + i, seconds, cfg)
                     for i in range(n_tracks)])[:, :n_samples]

    fn = api._fingerprint_batch_jit(cfg, n_samples, False)
    fd = jnp.asarray(filters)
    t0 = time.time()
    prints = np.asarray(fn(jnp.asarray(pcms), fd))
    log(f"[{algo}] compile+first: {time.time() - t0:.1f}s")

    iters = 8
    bufs = [jnp.asarray(pcms + np.float32(i) * np.float32(1e-6))
            for i in range(iters)]
    for b in bufs:
        b.block_until_ready()
    elapsed = float("inf")
    for _ in range(2):
        t0 = time.time()
        outs = [fn(b, fd) for b in bufs]
        np.asarray(outs[-1])
        elapsed = min(elapsed, time.time() - t0)
    rtf = iters * n_tracks * seconds / elapsed

    # noisy-query top-1 against a same-algo catalog (oracle dense match)
    qn = 30
    correct = 0
    for i in range(qn):
        t = int(rng.integers(0, n_tracks))
        q = synth.make_query(pcms[t], 3.0, 10.0, cfg, noise_db=-10.0,
                             seed=1000 + i)
        qp = np.asarray(api.fingerprint(q, filters, cfg))
        idx, _s, _o = oracle.match(
            qp, [p for p in prints], top_k=1)
        correct += int(idx[0] == t)

    out = dict(algo=algo, rtf=round(rtf, 1), top1=correct / qn,
               prints_shape=list(prints.shape))
    np.save(f"/tmp/prints_{algo}.npy", prints)
    print("RESULT " + json.dumps(out), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] in ALGOS:
        # child convention: <algo> [n_tracks] [seconds]
        n_tracks = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 60.0
        worker(sys.argv[1], n_tracks, seconds)
        return
    # parent convention (documented): [n_tracks] [seconds]
    n_tracks = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
    for algo in ALGOS:
        subprocess.run([sys.executable, __file__, algo, str(n_tracks),
                        str(seconds)], check=True)
    ref = np.load("/tmp/prints_x6.npy")
    for algo in ALGOS[1:]:
        got = np.load(f"/tmp/prints_{algo}.npy")
        diff = np.bitwise_xor(ref, got)
        bits = int(np.unpackbits(diff.view(np.uint8)).sum())
        total = ref.size * 32
        log(f"{algo} vs x6: {bits} differing bits / {total} "
            f"({bits / total:.2e})")


if __name__ == "__main__":
    main()
