"""Pallas TPU kernel: candidate-window fine rescan for the two-stage matcher.

After the coarse MXU scan picks candidate (track, offset) pairs, the exact
XOR+popcount rescore needs a (query_len + 2*fine_window) window of each
candidate's packed prints. XLA's row gather is pathologically slow on this
path (measured ~70 us per gathered row — seconds per query at useful pool
sizes), so this kernel pulls each window straight out of HBM with an async
DMA at its dynamic offset and scores it on the VPU without ever
materializing a gathered tensor in HBM.

Hardware constraints discovered on this stack (and encoded here):
  - DMA slices of HBM arrays must be whole tiles: a 1-row slice of a
    (T, L) uint32 array violates the (8, 128) tiling, and 1-D slices must
    have 1024-multiple size AND offset. So print planes are stored FLAT,
    (T * Lpad,) with Lpad % 1024 == 0, windows are a fixed 2048 wide, and
    window starts snap down to 1024-multiples with `pl.multiple_of` telling
    Mosaic the alignment is guaranteed.
  - Dynamic lane rotates (tpu.DynamicRotate) are only correct at
    power-of-two widths (256/512/1024/2048 verified; others miscompile),
    which the 2048 window satisfies.

Semantics: identical to match/scaled._fine_rescan (exact masked Hamming
similarity, clamped offset band, first-best-offset ties) — tested against it
and the oracle in tests/test_pallas_fine.py, and on hardware by
benchmarks/config4_scale.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAND_TILE = 8
WIDTH = 2048         # DMA window lanes: pow2 (roll-safe), 1024-multiple
SNAP = 1024          # HBM DMA offset alignment for 1-D uint32 arrays


def pallas_fine_rescan(
    query: jnp.ndarray,        # (N, 2) uint32
    d0: jnp.ndarray,           # (T*Lpad,) uint32 word plane 0 (flat)
    d1: jnp.ndarray,           # (T*Lpad,) word plane 1
    lengths: jnp.ndarray,      # (T,) int32 true print counts
    cand_tracks: jnp.ndarray,  # (K,) int32
    cand_starts: jnp.ndarray,  # (K,) int32 window starts (clamped by caller)
    *,
    n_fine: int,               # offsets rescanned per candidate (2*fw + 1)
    lpad: int,                 # per-track slot length in the flat planes
    interpret: bool = False,
):
    """Exact (score, offset) per candidate. Returns ((K,), (K,)) int32.

    Thin B=1 view of the batch kernel below — one kernel, two surfaces.
    """
    s, o = pallas_fine_rescan_batch(
        query[None], d0, d1, lengths, cand_tracks[None], cand_starts[None],
        n_fine=n_fine, lpad=lpad, interpret=interpret)
    return s[0], o[0]


def _fine_kernel_batch(tracks_ref, starts_ref, lens_ref,
                       q0_ref, q1_ref,                  # SMEM (B, Npad)
                       d0_ref, d1_ref,
                       score_ref, off_ref,
                       w0, w1, sem,
                       *, n_query: int, n_fine: int, lpad: int,
                       tiles_per_query: int):
    """Candidates are grouped per query (pool contiguous), so each program
    serves exactly one query: qi = program // tiles_per_query. Single-query
    calls are the B=1 special case (qi == 0 everywhere)."""
    i = pl.program_id(0)
    qi = i // tiles_per_query
    ct = CAND_TILE
    # One aligned 2048-lane DMA per candidate per word plane.
    dmas = []
    for c in range(ct):
        k = i * ct + c
        snap = (starts_ref[k] // SNAP) * SNAP
        flat = pl.multiple_of(tracks_ref[k] * lpad + snap, SNAP)
        for plane, dst, _s in ((d0_ref, w0, 0), (d1_ref, w1, 1)):
            dma = pltpu.make_async_copy(
                plane.at[pl.ds(flat, WIDTH)],
                dst.at[pl.ds(c * WIDTH, WIDTH)], sem.at[_s])
            dma.start()
            dmas.append(dma)
    for dma in dmas:
        dma.wait()

    comp = min(-(-(SNAP + n_fine) // 128) * 128, WIDTH)
    if comp + n_query > WIDTH:
        comp = WIDTH
    lane = jax.lax.broadcasted_iota(jnp.int32, (ct, comp), 1)
    starts = jnp.stack([starts_ref[i * ct + c] for c in range(ct)]).reshape(ct, 1)
    lens = jnp.stack([lens_ref[i * ct + c] for c in range(ct)]).reshape(ct, 1)
    snaps = (starts // SNAP) * SNAP
    base = starts - snaps
    o_global = snaps + lane
    kcut = jnp.clip(lens - o_global, 0, n_query)
    row0 = w0[:].reshape(ct, WIDTH)
    row1 = w1[:].reshape(ct, WIDTH)

    def n_step(n, dist):
        r0 = pltpu.roll(row0, -n, axis=1)[:, :comp]
        r1 = pltpu.roll(row1, -n, axis=1)[:, :comp]
        p = (jax.lax.population_count(jnp.bitwise_xor(r0, q0_ref[qi, n]))
             + jax.lax.population_count(jnp.bitwise_xor(r1, q1_ref[qi, n])))
        return dist + jnp.where(n < kcut, p.astype(jnp.int32), 0)

    dist = jax.lax.fori_loop(0, n_query, n_step,
                             jnp.zeros((ct, comp), jnp.int32))
    sim = 64 * kcut - dist
    valid = ((lane >= base) & (lane < base + n_fine)
             & (o_global <= jnp.maximum(lens - n_query, 0)))
    sim = jnp.where(valid, sim, -1)
    best = jnp.max(sim, axis=1, keepdims=True)
    inband = (lane >= base) & (lane < base + n_fine)
    first = jnp.min(jnp.where((sim == best) & inband, o_global, jnp.int32(2 ** 30)),
                    axis=1, keepdims=True)
    score_ref[:] = best
    off_ref[:] = first


@functools.partial(jax.jit, static_argnames=("n_fine", "lpad", "interpret"))
def pallas_fine_rescan_batch(
    queries: jnp.ndarray,      # (B, N, 2) uint32 equal-length queries
    d0: jnp.ndarray, d1: jnp.ndarray,
    lengths: jnp.ndarray,
    cand_tracks: jnp.ndarray,  # (B, K) int32 — pool per query
    cand_starts: jnp.ndarray,  # (B, K) int32
    *, n_fine: int, lpad: int, interpret: bool = False,
):
    """Batched exact rescan. Returns ((B, K), (B, K)) int32 scores/offsets."""
    b, n, _ = queries.shape
    k = cand_tracks.shape[1]
    assert n + n_fine - 1 <= SNAP + 1
    assert lpad % SNAP == 0 and k % CAND_TILE == 0
    n_pad = -(-n // 128) * 128
    q0 = jnp.zeros((b, n_pad), jnp.uint32).at[:, :n].set(queries[:, :, 0])
    q1 = jnp.zeros((b, n_pad), jnp.uint32).at[:, :n].set(queries[:, :, 1])
    flat_tracks = cand_tracks.reshape(-1).astype(jnp.int32)
    flat_starts = cand_starts.reshape(-1).astype(jnp.int32)
    cand_lens = lengths[flat_tracks]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b * k // CAND_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((CAND_TILE, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CAND_TILE, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((CAND_TILE * WIDTH,), jnp.uint32),
            pltpu.VMEM((CAND_TILE * WIDTH,), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fine_kernel_batch, n_query=n, n_fine=n_fine,
                               lpad=lpad, tiles_per_query=k // CAND_TILE)
    scores, offsets = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * k, 1), jnp.int32),
            jax.ShapeDtypeStruct((b * k, 1), jnp.int32),
        ],
        interpret=interpret,
    )(flat_tracks, flat_starts, cand_lens.astype(jnp.int32), q0, q1, d0, d1)
    return scores.reshape(b, k), offsets.reshape(b, k)


def plane_lpad(l: int, *, tight: bool = False) -> int:
    """Per-track slot length (1024-aligned).

    tight=True packs slots to ceil(l/1024)*1024 and relies on a single
    WIDTH-sized tail pad on the whole flat plane: a DMA window that runs
    past a track's slot reads the NEXT track's words, but every lane it
    could contribute through is masked (kcut = clip(len - o_global, 0, N)
    is zero there), so cross-slot garbage never scores. tight=False gives
    every slot its own WIDTH of headroom — required when the plane is
    SHARDED over a mesh, because a shard's last track has no next-shard
    bytes to harmlessly read.
    """
    if tight:
        return -(-l // SNAP) * SNAP
    return -(-(l + WIDTH) // SNAP) * SNAP


def plane_pad(prints: np.ndarray, *, tight: bool = False
              ) -> tuple[np.ndarray, np.ndarray, int]:
    """(T, L, 2) packed prints -> two flat word planes + Lpad.

    Flat length is T*Lpad (+ WIDTH tail when tight) — see plane_lpad.
    """
    t, l, _ = prints.shape
    lpad = plane_lpad(l, tight=tight)
    tail = WIDTH if tight else 0
    d0 = np.zeros(t * lpad + tail, np.uint32)
    d1 = np.zeros(t * lpad + tail, np.uint32)
    v0 = d0[: t * lpad].reshape(t, lpad)
    v1 = d1[: t * lpad].reshape(t, lpad)
    v0[:, :l] = prints[:, :, 0]
    v1[:, :l] = prints[:, :, 1]
    return d0, d1, lpad
