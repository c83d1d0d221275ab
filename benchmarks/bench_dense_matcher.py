"""Hardware verdict: dense Pallas VPU matcher vs the XLA offset scan.

Recorded in RESULTS.md (round 2): bit-identical on hardware, 0.52x XLA
speed at 2000x2580 -> XLA stays the dense default.
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from hpfw_tpu.match import matcher
from hpfw_tpu.ops.pallas_match import pallas_score_tracks

rng = np.random.default_rng(0)
T, L, N = 2000, 2580, 430
prints = rng.integers(0, 2**32, (T, L, 2), dtype=np.uint32)
lengths = np.full(T, L, np.int32)
q = prints[137, 900:900+N].copy()
pd, ld, qd = jnp.asarray(prints), jnp.asarray(lengths), jnp.asarray(q)
np.asarray(pd[0, 0])

def timed(fn, iters=8):
    out = fn(); np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    np.asarray(jax.tree.leaves(outs)[-1])
    return (time.perf_counter() - t0) / iters * 1e3

t0 = time.time()
xla_ms = timed(lambda: matcher.score_tracks(qd, pd, ld))
print(f"XLA dense scan ({T}x{L}, N={N}): {xla_ms:.1f} ms (compile {time.time()-t0:.0f}s)", flush=True)
t0 = time.time()
pal_ms = timed(lambda: pallas_score_tracks(qd, pd, ld))
print(f"Pallas VPU dense scan: {pal_ms:.1f} ms (compile {time.time()-t0:.0f}s)", flush=True)
s1, o1 = matcher.score_tracks(qd, pd, ld)
s2, o2 = pallas_score_tracks(qd, pd, ld)
eq = np.array_equal(np.asarray(s1), np.asarray(s2)) and np.array_equal(np.asarray(o1), np.asarray(o2))
print(f"hardware equality: {eq}; planted: score {int(np.asarray(s2)[137])} (want {64*N}) off {int(np.asarray(o2)[137])} (want 900)")
print(f"speedup: {xla_ms/pal_ms:.2f}x")
