"""Pallas TPU kernel: candidate-window fine rescan on the MXU.

After the coarse stage picks candidate (track, offset) pairs, the exact
XOR+popcount rescore needs a (query_len + 2*fine_window) window of each
candidate's packed prints. XLA's row gather is pathologically slow on this
path (measured ~70 us per gathered row), so windows are pulled straight out
of HBM with async DMAs at their dynamic offsets.

The scoring itself runs as a GEMM, not a popcount loop. For +/-1 vectors,
    sim = 64*kcut - hamming = (corr + 64*kcut) / 2,
    corr = sum over valid (print, channel) of q(+/-1) * d(+/-1),
so the exact Hamming similarity of all offsets in the fine band is one
phase-matrix GEMM over the unpacked window — the same trick as the coarse
kernel (ops/pallas_coarse.py), with invalid positions contributing zero by
zeroing the unpacked window past each track's length. bf16 operands with
f32 accumulation are exact here (+/-1 products, partial sums < 2^24), and
the MXU does in ~25 us per 128 candidates what the previous VPU
roll+popcount loop (this file's round-1/2 form) did in ~600 us: popcount is
multi-op emulated on the VPU and only ~6% of its scanned lanes were in the
fine band.

Hardware constraints discovered on this stack (and encoded here):
  - DMA slices of HBM arrays must be whole tiles: a 1-row slice of a
    (T, L) uint32 array violates the (8, 128) tiling, and 1-D slices must
    have 1024-multiple size AND offset. So print planes are stored FLAT,
    (T * Lpad,) with Lpad % 1024 == 0, windows are a fixed 2048 wide, and
    window starts snap down to 1024-multiples with `pl.multiple_of` telling
    Mosaic the alignment is guaranteed.
  - Dynamic lane rotates (tpu.DynamicRotate) are only correct at
    power-of-two widths, which the 2048 window satisfies: each candidate
    row is rotated once so its band starts at lane 0 (the snap remainder
    was the round-1 kernel's 17x lane waste).
  - Unrolled loops stack-allocate every temporary (16 MB scoped-vmem
    limit), so the per-row rotate and per-chunk GEMM run as fori_loop /
    grid steps.

Semantics: identical to match/scaled._fine_rescan (exact masked Hamming
similarity, clamped offset band, first-best-offset ties) — tested against
it and the oracle in tests/test_pallas_fine.py, and on hardware by
tests/test_tpu_smoke.py + benchmarks/config4_scale.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAND_TILE = 128      # candidates per program = GEMM M (MXU needs M >> 8)
WIDTH = 2048         # DMA window lanes: pow2 (rotate-safe), 1024-multiple
SNAP = 1024          # HBM DMA offset alignment for 1-D uint32 arrays
CHUNK = 128          # window words per GEMM K-chunk (K = 2*32*CHUNK = 8192)
PHASES = 128         # fine offsets scored per GEMM (band <= 128 offsets)


def _fine_w_chunks(query: jnp.ndarray, n_csteps: int) -> jnp.ndarray:
    """Query (N, 2) uint32 -> (n_csteps, 64*CHUNK, PHASES) bf16 phase chunks.

    Chunk c, row (plane*32 + b)*CHUNK + jl, column r holds q_pm1[j - r,
    32*plane + b] for j = c*CHUNK + jl when 0 <= j - r < N, else 0 — i.e.
    the K-dim slice of the band phase matrix matching the kernel's unpacked
    window layout (plane-major, bit-major, word-minor).
    """
    n = query.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (query[:, :, None] >> shifts) & jnp.uint32(1)     # (N, 2, 32)
    qpm1 = (bits.astype(jnp.int32) * 2 - 1).astype(jnp.float32)
    j = (jnp.arange(n_csteps * CHUNK)[:, None]
         - jnp.arange(PHASES)[None, :])                      # (Jtot, R)
    valid = (j >= 0) & (j < n)
    g = jnp.take(qpm1, jnp.clip(j, 0, n - 1), axis=0)        # (Jtot, R, 2, 32)
    g = jnp.where(valid[:, :, None, None], g, 0.0)
    # (Jtot, R, plane, bit) -> (csteps, plane, bit, jl, R) -> rows
    g = g.reshape(n_csteps, CHUNK, PHASES, 2, 32)
    g = g.transpose(0, 3, 4, 1, 2).reshape(n_csteps, 64 * CHUNK, PHASES)
    return g.astype(jnp.bfloat16)


def _fine_kernel(tracks_ref, starts_ref,                 # scalar prefetch
                 w_ref,                                  # (1, 64*CHUNK, PHASES)
                 lens_v_ref, starts_v_ref,               # VMEM (ft, 1) int32
                 d0_ref, d1_ref,                         # ANY (flat planes)
                 score_ref, off_ref,                     # VMEM (ft, 1) int32
                 win0, win1, al0, al1, corr, sem,
                 *, n_query: int, n_fine: int, lpad: int, n_csteps: int,
                 winp: int):
    i = pl.program_id(0)
    c = pl.program_id(1)
    ft = lens_v_ref.shape[0]

    def row_copy(k2, plane, dst, si):
        k = i * ft + k2
        snap = (starts_ref[k] // SNAP) * SNAP
        flat = pl.multiple_of(tracks_ref[k] * lpad + snap, SNAP)
        # Flat 1-D scratch: DMA slices of (rows, lanes) scratch would need
        # 8-aligned sublane starts; 1-D lane offsets at WIDTH multiples are
        # the proven-legal form.
        return pltpu.make_async_copy(
            plane.at[pl.ds(flat, WIDTH)],
            dst.at[pl.ds(pl.multiple_of(k2 * WIDTH, SNAP), WIDTH)],
            sem.at[si])

    @pl.when(c == 0)
    def _setup():
        # One aligned 2048-lane DMA per candidate per word plane — all
        # started before any wait so the copies overlap.
        def dma_start(k2, _):
            row_copy(k2, d0_ref, win0, 0).start()
            row_copy(k2, d1_ref, win1, 1).start()
            return 0

        def dma_wait(k2, _):
            row_copy(k2, d0_ref, win0, 0).wait()
            row_copy(k2, d1_ref, win1, 1).wait()
            return 0

        jax.lax.fori_loop(0, ft, dma_start, 0)
        jax.lax.fori_loop(0, ft, dma_wait, 0)

        # Per-row lane rotation so every candidate's band starts at lane 0.
        # Mosaic has no row-varying rotate (and single-row slices violate
        # sublane tiling), so the per-row shift is applied as its binary
        # decomposition: 11 whole-array rolls by 2^b, each kept only for
        # rows whose shift has bit b set.
        base = starts_v_ref[:] - (starts_v_ref[:] // SNAP) * SNAP  # (ft, 1)
        shift = (WIDTH - base) & (WIDTH - 1)

        def rot_bits(x):
            def step(b, v):
                rolled = pltpu.roll(v, jnp.int32(1) << b, axis=1)
                bit = ((shift >> b) & 1) == 1
                return jnp.where(bit, rolled, v)

            return jax.lax.fori_loop(0, 11, step, x)

        al0[:] = rot_bits(win0[:].reshape(ft, WIDTH))[:, :winp]
        al1[:] = rot_bits(win1[:].reshape(ft, WIDTH))[:, :winp]
        corr[:] = jnp.zeros((ft, PHASES), jnp.float32)

    # Unpack this K-chunk of both planes to +/-1 (0 past track end) and
    # accumulate the phase GEMM. Lane layout: bit-major, word-minor
    # (lane = b*CHUNK + jl), produced by a tiled repeat of the word chunk.
    lens = lens_v_ref[:]                                  # (ft, 1)
    starts = starts_v_ref[:]
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (ft, 32 * CHUNK), 1)
    jl = lane32 & (CHUNK - 1)
    b_iota = (lane32 >> int(np.log2(CHUNK))).astype(jnp.uint32)
    j_global = c * CHUNK + jl
    valid = (starts + j_global) < lens                    # (ft, 32*CHUNK)
    parts = []
    for al in (al0, al1):
        words = al[:, pl.ds(pl.multiple_of(c * CHUNK, CHUNK), CHUNK)]
        wide = pltpu.repeat(words, 32, axis=1)            # (ft, 32*CHUNK)
        bits = ((wide >> b_iota) & jnp.uint32(1)).astype(jnp.int32)
        pm1 = jnp.where(valid, bits * 2 - 1, 0)
        parts.append(pm1.astype(jnp.bfloat16))
    x = jnp.concatenate(parts, axis=1)                    # (ft, 64*CHUNK)
    corr[:] += jax.lax.dot_general(
        x, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(c == n_csteps - 1)
    def _finish():
        lane = jax.lax.broadcasted_iota(jnp.int32, (ft, PHASES), 1)
        o_global = starts + lane
        kcut = jnp.clip(lens - o_global, 0, n_query)
        sim = (corr[:].astype(jnp.int32) + 64 * kcut) >> 1
        band = lane < n_fine
        ok = band & (o_global <= jnp.maximum(lens - n_query, 0))
        sim = jnp.where(ok, sim, -1)
        best = jnp.max(sim, axis=1, keepdims=True)
        first = jnp.min(jnp.where((sim == best) & band, o_global,
                                  jnp.int32(2 ** 30)), axis=1, keepdims=True)
        score_ref[:] = best
        off_ref[:] = first


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
    k0 = cand_tracks.shape[1]
    span = n + n_fine - 1
    assert span <= SNAP + 1, "query + fine band exceed the DMA window"
    assert n_fine <= PHASES, "fine band wider than the phase GEMM"
    assert lpad % SNAP == 0
    # Pad the pool to the candidate tile (repeating the first candidate;
    # host-side ranking dedups).
    k = -(-k0 // CAND_TILE) * CAND_TILE
    if k != k0:
        pad = (0, k - k0)
        cand_tracks = jnp.pad(cand_tracks, ((0, 0), pad), mode="edge")
        cand_starts = jnp.pad(cand_starts, ((0, 0), pad), mode="edge")
    n_csteps = -(-span // CHUNK)
    winp = n_csteps * CHUNK
    w = jax.vmap(functools.partial(_fine_w_chunks, n_csteps=n_csteps))(
        queries).reshape(b * n_csteps, 64 * CHUNK, PHASES)
    flat_tracks = cand_tracks.reshape(-1).astype(jnp.int32)
    flat_starts = cand_starts.reshape(-1).astype(jnp.int32)
    cand_lens = lengths[flat_tracks].astype(jnp.int32)
    ft = CAND_TILE
    tiles_per_query = k // ft

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * tiles_per_query, n_csteps),
        in_specs=[
            pl.BlockSpec(
                (1, 64 * CHUNK, PHASES),
                lambda i, c, *_: (i // tiles_per_query * n_csteps + c, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, 1), lambda i, c, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, 1), lambda i, c, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((ft, 1), lambda i, c, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, 1), lambda i, c, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((ft * WIDTH,), jnp.uint32),
            pltpu.VMEM((ft * WIDTH,), jnp.uint32),
            pltpu.VMEM((ft, winp), jnp.uint32),
            pltpu.VMEM((ft, winp), jnp.uint32),
            pltpu.VMEM((ft, PHASES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fine_kernel, n_query=n, n_fine=n_fine, lpad=lpad,
        n_csteps=n_csteps, winp=winp)

    scores, offsets = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * k, 1), jnp.int32),
            jax.ShapeDtypeStruct((b * k, 1), jnp.int32),
        ],
        interpret=interpret,
    )(flat_tracks, flat_starts,
      w, cand_lens.reshape(-1, 1), flat_starts.reshape(-1, 1), d0, d1)
    return (scores.reshape(b, k)[:, :k0],
            offsets.reshape(b, k)[:, :k0])


def plane_lpad(l: int, *, tight: bool = False) -> int:
    """Per-track slot length (1024-aligned).

    tight=True packs slots to ceil(l/1024)*1024 and relies on a single
    WIDTH-sized tail pad on the whole flat plane: a DMA window that runs
    past a track's slot reads the NEXT track's words, but every position it
    could contribute through is zeroed by the validity mask
    (start + j >= len), so cross-slot garbage never scores. tight=False
    gives every slot its own WIDTH of headroom — required when the plane is
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
