"""Pallas TPU kernel: XOR+popcount Hamming offset-scan (the matcher hot loop).

The single hottest loop in the system (SURVEY.md §3.3): for every track and
every alignment offset, sum popcount(query XOR track) over the query length.
This kernel keeps one tile of tracks' packed prints resident in VMEM and
sweeps offsets in 128-lane vectors on the VPU:

  grid: one program per TRACK_TILE tracks
  inner: for each query print n, rotate the resident print row left by n
         (tpu.DynamicRotate) and accumulate
         dist[:, o] += popcount(d[:, o+n] ^ q[n]) for ALL offsets at once
         as one (TT, O_pad) vector op per packed word

Layout: the two uint32 words of each print live in SEPARATE (T, L) arrays so
lanes run along the offset/time axis (a trailing word axis of size 2 would
waste 126 of 128 lanes). The query rides in SMEM and broadcasts per n.

Semantics are identical to match/matcher.py (and the oracle): per-position
validity masking, offsets restricted to [0, max(len-N, 0)], first-best-offset
tie-breaking. Tested equal on random and structured inputs, including short
tracks (tests/test_pallas_match.py).

This kernel is exact — no downsampling here; the coarse/fine 1M-track
two-stage matcher composes it with the MXU correlation scorer (match/scaled.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TRACK_TILE = 8
OFFSET_LANES = 128


def _scan_kernel(q0_ref, q1_ref, len_ref, d0_ref, d1_ref,
                 score_ref, off_ref, *, n_query: int, n_off_blocks: int,
                 n_offsets: int):
    tt = d0_ref.shape[0]
    lengths = len_ref[:]                                     # (TT, 1) int32
    max_o = jnp.maximum(lengths - n_query, 0)                # (TT, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tt, OFFSET_LANES), 1)
    n_q_blocks = -(-n_query // OFFSET_LANES)
    big = jnp.int32(2 ** 30)

    def offset_block(ob, carry):
        best_s, best_o = carry                               # (TT,1), (TT,1)
        o0 = ob * OFFSET_LANES
        o_vec = o0 + lane                                    # (TT, 128)
        # valid position count per offset: kcut = clamp(len - o, 0, N)
        kcut = jnp.clip(lengths - o_vec, 0, n_query)         # (TT, 128)

        # Mosaic requires 128-aligned lane slices, so the sliding window
        # d[:, o0+n : o0+n+128] is built from an aligned 256-column load
        # dynamically rotated (tpu.DynamicRotate) by n%128. (Rotating the
        # whole row once per n would be cheaper, but compiled dynamic roll
        # mis-rotates rows wider than 256 lanes on this stack.)
        def qblock_step(kb, dist):
            base = o0 + kb * OFFSET_LANES
            cat0 = d0_ref[:, pl.ds(base, 2 * OFFSET_LANES)]
            cat1 = d1_ref[:, pl.ds(base, 2 * OFFSET_LANES)]

            def r_step(r, dist):
                n = kb * OFFSET_LANES + r
                w0 = pltpu.roll(cat0, -r, axis=1)[:, :OFFSET_LANES]
                w1 = pltpu.roll(cat1, -r, axis=1)[:, :OFFSET_LANES]
                p = (jax.lax.population_count(jnp.bitwise_xor(w0, q0_ref[n]))
                     + jax.lax.population_count(jnp.bitwise_xor(w1, q1_ref[n])))
                # n < kcut <= n_query also masks padded query entries.
                return dist + jnp.where(n < kcut, p.astype(jnp.int32), 0)

            return jax.lax.fori_loop(0, OFFSET_LANES, r_step, dist)

        dist = jax.lax.fori_loop(
            0, n_q_blocks, qblock_step,
            jnp.zeros((tt, OFFSET_LANES), jnp.int32),
        )
        sim = 64 * kcut - dist
        valid = (o_vec <= max_o) & (o_vec < n_offsets)
        sim = jnp.where(valid, sim, -1)
        # First-best-offset semantics without argmax (Mosaic's reduce-index
        # tie direction is unreliable): max score, then min offset achieving it.
        blk_best = jnp.max(sim, axis=1, keepdims=True)       # (TT, 1)
        blk_off = jnp.min(
            jnp.where(sim == blk_best, o_vec, big), axis=1, keepdims=True
        )
        take = blk_best > best_s                             # earlier block wins ties
        best_o = jnp.where(take, blk_off, best_o)
        best_s = jnp.where(take, blk_best, best_s)
        return best_s, best_o

    init = (jnp.full((tt, 1), -2, jnp.int32), jnp.zeros((tt, 1), jnp.int32))
    best_s, best_o = jax.lax.fori_loop(0, n_off_blocks, offset_block, init)
    score_ref[:] = best_s
    off_ref[:] = best_o


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_score_tracks(
    query: jnp.ndarray,    # (N, 2) uint32
    prints: jnp.ndarray,   # (T, L, 2) uint32 zero-padded
    lengths: jnp.ndarray,  # (T,) int32
    *,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Best (score, offset) per track — drop-in for matcher.score_tracks."""
    t, l, _ = prints.shape
    n = query.shape[0]
    assert l >= n, "pad DB prints to at least the query length"
    n_offsets = l - n + 1
    n_off_blocks = -(-n_offsets // OFFSET_LANES)
    n_q_blocks = -(-n // OFFSET_LANES)
    # Pad so every aligned 2x128-lane load in the kernel stays in bounds
    # (last offset block base + last query block base + 256 columns).
    l_pad = (n_off_blocks + n_q_blocks) * OFFSET_LANES
    t_pad = -(-t // TRACK_TILE) * TRACK_TILE
    d0 = jnp.zeros((t_pad, l_pad), jnp.uint32).at[:t, :l].set(prints[:, :, 0])
    d1 = jnp.zeros((t_pad, l_pad), jnp.uint32).at[:t, :l].set(prints[:, :, 1])
    lens = jnp.zeros((t_pad, 1), jnp.int32).at[:t, 0].set(lengths)
    # Query padded to whole blocks; padded entries are masked by n < kcut.
    n_pad = n_q_blocks * OFFSET_LANES
    q0 = jnp.zeros((n_pad,), jnp.uint32).at[:n].set(query[:, 0])
    q1 = jnp.zeros((n_pad,), jnp.uint32).at[:n].set(query[:, 1])

    grid = (t_pad // TRACK_TILE,)
    kernel = functools.partial(
        _scan_kernel, n_query=n, n_off_blocks=n_off_blocks, n_offsets=n_offsets
    )
    scores, offsets = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # q0 (N,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # q1 (N,)
            pl.BlockSpec((TRACK_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # lengths tile
            pl.BlockSpec((TRACK_TILE, l_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # d0 tile
            pl.BlockSpec((TRACK_TILE, l_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # d1 tile
        ],
        out_specs=[
            pl.BlockSpec((TRACK_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRACK_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((t_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q0, q1, lens, d0, d1)
    return scores[:t, 0], offsets[:t, 0]
