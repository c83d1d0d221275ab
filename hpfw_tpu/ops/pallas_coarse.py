"""Pallas TPU kernel: fused coarse scan — int8 phase-GEMM + max/first-argmax.

The two-stage matcher's coarse stage is bandwidth-bound: at 250k tracks the
int8 coarse database is ~1.3 GB and the MACs are trivial (SURVEY.md §3.3
"the single hottest loop"). The XLA formulation (ops/coarse.py
coarse_correlation) loses ~4x off HBM peak two ways:

  1. it materializes a zero-PADDED copy of the coarse DB in HBM (the
     128-phase conv needs (m-1)*128 + Nc + 127 windows per track — ~1.8x
     the real data at 60 s tracks) and then reads that;
  2. it writes the full (T, offsets) int32 correlation surface back to HBM
     and re-reads it for the max/argmax reduction (~2x the coarse DB again).

This kernel streams each track tile's REAL bytes from HBM exactly once
(Pallas double-buffers the tile DMA automatically), zero-extends in
registers, runs the phase GEMM on the MXU (int8 x int8 -> int32), and
reduces best-correlation + first-best-offset in VMEM — writing back just
two int32 words per track.

Math (identical to coarse_correlation + max/argmax, tested exact):
  corr(t, o) = sum_j q(j) . d(t, o + j)      over coarse windows, int32
  best(t)    = max_o corr(t, o),  idx(t) = argmin{o : corr(t,o) = best}
with o < n_off = Lc - Nc + 1 and the query embedded at S phase shifts into
a ((Nc+S-1)*64, S) int8 kernel so output lane r of GEMM block m scores
offset m*S + r at full MXU width.

Layout contract: the coarse DB is FLAT (T, Lc*64) int8 with Lc*64 a
multiple of 128 lanes and T a multiple of the track tile (caller pads; a
zero track scores 0 everywhere and is filtered by the n_real cut).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TRACK_TILE = 128     # tracks per program (grid rows)
PHASES = 128         # query phase shifts = GEMM output lanes (MXU width)

# Pallas pipeline buffers live in a ~16 MB scoped-vmem arena; the track tile
# is double-buffered, so cap 2*tt*lcw (plus ~3 MB of W/corr/temps) under it.
_VMEM_TILE_BUDGET = 11 * 2 ** 20


def auto_track_tile(lcw: int, cap: int = 1024) -> int:
    """Largest power-of-two track tile whose double-buffered int8 block fits
    scoped vmem. Bigger tiles DMA measurably faster on this chip (253 vs
    214 GB/s at tt=1024 vs 128, benchmarks/tune_matcher.py) — HBM reads are
    the whole cost of the coarse scan, so take the largest safe tile."""
    tt = 8
    while tt * 2 <= cap and 2 * (tt * 2) * lcw <= _VMEM_TILE_BUDGET:
        tt *= 2
    return tt


def _phase_matrix(query_c: jnp.ndarray, s: int, k_pad: int) -> jnp.ndarray:
    """((Nc+S-1)*64 -> k_pad, S) bf16 phase-shift kernel: column r is the
    query shifted down r windows.

    Built with ONE static selection GEMM — sel[(j,r), t] = [j - r == t] is a
    trace-time constant — because the naive jnp.stack of S padded copies
    costs ~2 ms of launch-latency-bound XLA ops per query on this stack.
    """
    nc, c = query_c.shape
    rows = nc + s - 1
    j = np.arange(rows)[:, None, None]
    r = np.arange(s)[None, :, None]
    t = np.arange(nc)[None, None, :]
    sel = jnp.asarray((j - r == t).reshape(rows * s, nc), dtype=jnp.bfloat16)
    w3 = jax.lax.dot_general(
        sel, query_c.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (rows*S, C)
    w = w3.reshape(rows, s, c).transpose(0, 2, 1).reshape(rows * c, s)
    return jnp.pad(w, ((0, k_pad - rows * c), (0, 0))).astype(jnp.bfloat16)


def _tile_best(w_ref, db_ref, *, lcw: int, k_pad: int, s: int,
               m_blocks: int, n_off: int, c: int = 64):
    """One track tile's (best corr, first best offset), each (tt, 1) int32.

    The GEMM runs in bf16 with f32 accumulation — EXACT for this data
    (int8 values, products <= 127^2 representable, partial sums < 2^24) and
    ~6x faster than integer dot_general, which Mosaic lowers to multi-pass
    emulation on this stack (measured 33 TOPS int8 vs native-rate bf16).
    Storage stays int8 (HBM bytes are the budget); the cast happens in
    registers.
    """
    parts = []
    for m in range(m_blocks):
        col0 = m * s * c
        k_m = min(k_pad, lcw - col0)
        x = db_ref[:, col0:col0 + k_m].astype(jnp.bfloat16)
        parts.append(jax.lax.dot_general(
            x, w_ref[:k_m, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32))
    corr = parts[0] if m_blocks == 1 else jnp.concatenate(parts, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, corr.shape, 1)
    corr = jnp.where(lane < n_off, corr, jnp.int32(-(2 ** 31) + 1))
    best = jnp.max(corr, axis=1, keepdims=True)
    # Mosaic argmax tie direction is unreliable -> min-index-where-equal
    # (first best offset, same as the XLA twin's argmax).
    idx = jnp.min(jnp.where(corr == best, lane, jnp.int32(2 ** 30)),
                  axis=1, keepdims=True)
    return best, idx


def _coarse_kernel(w_ref, db_ref, best_ref, idx_ref, **statics):
    best, idx = _tile_best(w_ref, db_ref, **statics)
    best_ref[:] = best
    idx_ref[:] = idx


@functools.partial(jax.jit, static_argnames=("s", "tt", "lc_true", "interpret"))
def pallas_coarse_scan(
    query_c: jnp.ndarray,    # (Nc, 64) int8 +/-1 coarse query
    db_c_flat: jnp.ndarray,  # (T, Lc*64) int8, zero past each track's length
    *,
    s: int = PHASES,
    tt: int = TRACK_TILE,
    lc_true: int | None = None,  # pre-flatten window count (offsets scanned
                                 # match the XLA twin on the 3-D array)
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-track (best corr, first best coarse offset). ((T,), (T,)) int32."""
    nc, c = query_c.shape
    t, lcw = db_c_flat.shape
    assert lcw % 128 == 0, "flat coarse rows must be 128-lane aligned"
    assert t % tt == 0, "pad tracks to the track tile"
    lc = lcw // c
    n_off = (lc_true if lc_true is not None else lc) - nc + 1
    assert n_off >= 1, "query longer than the coarse DB (caller checks)"
    m_blocks = -(-n_off // s)
    # Phase-shift kernel, rows padded to a 128-lane-sliceable K.
    k_full = (nc + s - 1) * c
    k_pad = -(-k_full // 128) * 128
    w = _phase_matrix(query_c, s, k_pad)
    kernel = functools.partial(_coarse_kernel, lcw=lcw, k_pad=k_pad, s=s,
                               m_blocks=m_blocks, n_off=n_off, c=c)
    best, idx = pl.pallas_call(
        kernel,
        grid=(t // tt,),
        in_specs=[
            pl.BlockSpec((k_pad, s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, lcw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, 1), jnp.int32),
            jax.ShapeDtypeStruct((t, 1), jnp.int32),
        ],
        compiler_params=_compiler_params(tt, lcw, k_pad, s),
        interpret=interpret,
    )(w, db_c_flat)
    return best[:, 0], idx[:, 0]


def _compiler_params(tt, lcw, k_pad, lanes):
    """Raise the Mosaic vmem limit when the double-buffered tile needs
    more than the default ~16 MB arena (big tiles amortize grid-step
    overhead; the chip has 128 MB of VMEM)."""
    need = 2 * tt * lcw + 2 * k_pad * lanes + 4 * tt * max(lanes, 128) \
        + (4 << 20)
    if need <= (16 << 20):
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(need, 120 << 20))


# Phase shifts for the query-stacked batch kernel. Swept on hardware at
# 250k tracks (benchmarks/tune_matcher.py --batch): 16 beats 32/64/128 —
# once B queries stack on the GEMM's N axis the MXU stays wide without
# phase inflation, so fewer phases = fewer redundant MACs. (A per-query
# 128-phase grid kernel — the round-2 first cut — measured 4.2 ms/query
# vs 2.0 for this form and was removed.)
BATCH_PHASES = 16


def auto_stacked_tile(lcw: int, k_pad: int, bs: int, cap: int = 1024) -> int:
    """Track tile for the stacked batch kernel: the double-buffered int8
    block PLUS the (tt, B*s) corr/best/idx surfaces and the bf16 X cast must
    fit scoped vmem alongside the (k_pad, B*s) weight stack."""
    fixed = k_pad * bs * 2                       # W stack, resident
    tt = 8
    while tt * 2 <= cap:
        per_tt = 2 * lcw + 3 * bs * 4 + k_pad * 2
        if fixed + (tt * 2) * per_tt > _VMEM_TILE_BUDGET:
            break
        tt *= 2
    return tt


def _stacked_kernel(*refs, b: int, s: int,
                    lcw: int, k_pad: int, m_blocks: int, n_off: int,
                    c: int = 64, convert_once: bool = False,
                    packed4: bool = False):
    """Query-stacked batched coarse scan: all B queries' s-phase kernels sit
    side by side on the GEMM's N axis, so a SINGLE program per track tile
    serves the whole batch at full MXU width with s = 32 instead of 128 —
    ~4x fewer phase-inflation MACs per query than the 128-phase form, which
    is what bounds batched serving once the coarse DB DMA is amortized.

    Per m-block, output lane q*s + r scores offset m*s + r for query q; a
    running elementwise (max, first-offset) merges blocks, an in-group
    shift-reduce tree collapses each query's s lanes (first-offset ties kept
    by min-index-on-equal), and one-hot f32 selection GEMMs emit the (tt, B)
    scalars — f32 is exact for these int32 magnitudes (< 2^24).

    packed4: the DB rows are nibble-packed (pack_coarse_nibbles, two int4
    features per byte — halves the HBM bytes of the pass-1 sweep). The
    kernel unpacks in registers and runs TWO half-K GEMMs against the
    even/odd row split of W (feature 2j pairs with W row 2j), so no column
    interleave is ever materialized; results are bit-identical to the int8
    path (values are the same ±1/0)."""
    if packed4:
        wlo_ref, whi_ref, db_ref, best_ref, idx_ref = refs
    else:
        w_ref, db_ref, best_ref, idx_ref = refs
    tt = db_ref.shape[0]
    bs = b * s
    neg = jnp.int32(-(2 ** 31) + 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tt, bs), 1)
    r_lane = lane % s
    best = jnp.full((tt, bs), neg, jnp.int32)
    idxv = jnp.zeros((tt, bs), jnp.int32)
    # convert_once: m-block slices overlap by (nc-1)*c columns, so the
    # per-block int8->bf16 cast re-converts most of the tile m_blocks
    # times; one whole-tile cast trades VMEM (a bf16 tile copy) for that
    # duplicated convert work. Results are identical either way (same
    # values); which is faster is a hardware question (pass1_tune.py).
    xb = db_ref[:].astype(jnp.bfloat16) if convert_once else None
    dn = (((1,), (0,)), ((), ()))
    for m in range(m_blocks):
        col0 = m * s * c
        k_m = min(k_pad, lcw - col0)
        if packed4:
            # Unpack the nibble pair in registers: ulo = low nibble
            # (unsigned), sign-extend via the 8s bit; hi = arithmetic >>4
            # (exact for v = 16*hi + ulo). All ops fully defined on int32.
            xi = db_ref[:, col0 // 2:(col0 + k_m) // 2].astype(jnp.int32)
            xlo = ((xi & 15) - ((xi & 8) << 1)).astype(jnp.bfloat16)
            xhi = (xi >> 4).astype(jnp.bfloat16)
            corr = (jax.lax.dot_general(
                        xlo, wlo_ref[:k_m // 2, :], dn,
                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        xhi, whi_ref[:k_m // 2, :], dn,
                        preferred_element_type=jnp.float32)
                    ).astype(jnp.int32)
        else:
            x = (xb[:, col0:col0 + k_m] if convert_once
                 else db_ref[:, col0:col0 + k_m].astype(jnp.bfloat16))
            corr = jax.lax.dot_general(
                x, w_ref[:k_m, :], dn,
                preferred_element_type=jnp.float32).astype(jnp.int32)
        off = m * s + r_lane
        corr = jnp.where(off < n_off, corr, neg)
        # Strict > keeps the earlier (smaller-offset) block on ties.
        take = corr > best
        idxv = jnp.where(take, off, idxv)
        best = jnp.where(take, corr, best)
    # In-group tree reduction over the s phase lanes of each query.
    step = s
    while step > 1:
        step //= 2
        rb = pltpu.roll(best, bs - step, axis=1)
        ri = pltpu.roll(idxv, bs - step, axis=1)
        valid = r_lane + step < s
        rb = jnp.where(valid, rb, neg)
        take = (rb > best) | ((rb == best) & (ri < idxv))
        best = jnp.where(take, rb, best)
        idxv = jnp.where(take, ri, idxv)
    # Lane q*s holds query q's result; select with one-hot f32 GEMMs
    # (the selector is built from iotas — Pallas kernels can't capture
    # array constants).
    row = jax.lax.broadcasted_iota(jnp.int32, (bs, b), 0)
    colq = jax.lax.broadcasted_iota(jnp.int32, (bs, b), 1)
    sel = (row == colq * s).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    best_ref[:] = jax.lax.dot_general(
        best.astype(jnp.float32), sel, dn,
        preferred_element_type=jnp.float32).astype(jnp.int32)
    idx_ref[:] = jax.lax.dot_general(
        idxv.astype(jnp.float32), sel, dn,
        preferred_element_type=jnp.float32).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("s", "tt", "lc_true",
                                             "interpret", "convert_once",
                                             "packed4"))
def pallas_coarse_scan_batch_stacked(
    query_cs: jnp.ndarray,   # (B, Nc, 64) int8 +/-1 equal-length queries
    db_c_flat: jnp.ndarray,  # (T, Lc*64) int8; packed4: (T, Lc*64/2)
    *,
    s: int = BATCH_PHASES,
    tt: int | None = None,
    lc_true: int | None = None,
    interpret: bool = False,
    convert_once: bool = False,
    packed4: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fused coarse scan, one program per track tile.

    Returns ((B, T), (B, T)) int32 best/first-best-offset — identical
    results to pallas_coarse_scan per query (tests/test_pallas_coarse.py).
    B is padded internally so B*s lanes are 128-aligned; callers see only
    their B rows.

    packed4=True: db_c_flat is nibble-packed (pack_coarse_nibbles) — the
    sweep reads HALF the HBM bytes and unpacks in registers, bit-identical
    results (the two-pass matcher's pass-1 sweep is HBM-bound; VERDICT r4
    item 8).
    """
    assert not (packed4 and convert_once), "packed4 has no whole-tile cast"
    b0, nc, _ = query_cs.shape
    # B*s lanes must be 128-aligned: pad the batch so b*s % 128 == 0.
    # The unit below only achieves that when s divides 128.
    assert 128 % s == 0, f"phase count s={s} must divide 128"
    unit = max(1, 128 // s)
    b = -(-b0 // unit) * unit
    if b != b0:
        query_cs = jnp.concatenate(
            [query_cs, jnp.broadcast_to(query_cs[:1], (b - b0,) + query_cs.shape[1:])])
    c = query_cs.shape[2]
    t, lcw = db_c_flat.shape
    if packed4:
        lcw *= 2   # feature-coordinate width; the packed rows hold lcw/2
                   # bytes and all column arithmetic stays in feature space
    assert lcw % 128 == 0
    lc = lcw // c
    n_off = (lc_true if lc_true is not None else lc) - nc + 1
    assert n_off >= 1
    m_blocks = -(-n_off // s)
    k_full = (nc + s - 1) * c
    k_pad = -(-k_full // 128) * 128
    if tt is None:
        tt = auto_stacked_tile(lcw, k_pad, b * s)
        if convert_once:
            # the whole-tile bf16 copy needs its own arena headroom
            tt = max(8, tt // 2)
        while t % tt and tt > 8:
            tt //= 2
    assert t % tt == 0, "pad tracks to the track tile"
    # (B, k_pad, s) -> (k_pad, B*s): query q's phases at lanes q*s..q*s+s.
    w = jax.vmap(lambda q: _phase_matrix(q, s, k_pad))(
        query_cs).transpose(1, 0, 2).reshape(k_pad, b * s)
    kernel = functools.partial(_stacked_kernel, b=b, s=s, lcw=lcw,
                               k_pad=k_pad, m_blocks=m_blocks, n_off=n_off,
                               c=c, convert_once=convert_once,
                               packed4=packed4)
    if packed4:
        # Even/odd row split of W: packed byte j's low nibble is feature
        # 2j (W rows 0,2,...), high nibble feature 2j+1 (rows 1,3,...).
        w_ops = [w[0::2], w[1::2]]
        w_specs = [pl.BlockSpec((k_pad // 2, b * s), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2
        db_block = lcw // 2
    else:
        w_ops = [w]
        w_specs = [pl.BlockSpec((k_pad, b * s), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)]
        db_block = lcw
    best, idx = pl.pallas_call(
        kernel,
        grid=(t // tt,),
        in_specs=w_specs + [
            pl.BlockSpec((tt, db_block), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tt, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b), jnp.int32),
            jax.ShapeDtypeStruct((t, b), jnp.int32),
        ],
        interpret=interpret,
    )(*w_ops, db_c_flat)
    return best.T[:b0], idx.T[:b0]


@functools.partial(jax.jit, static_argnames=("s", "tt", "lc_true", "interpret"))
def pallas_coarse_rescan_stacked(
    query_cs: jnp.ndarray,     # (B, V, Nc, C) int8 — V variants per query
    db_sub_flat: jnp.ndarray,  # (B*M, lcw) int8 — per-query gathered rows,
                               # query-major (query q owns rows q*M..(q+1)*M)
    *,
    s: int = BATCH_PHASES,
    tt: int | None = None,
    lc_true: int | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Block-diagonal phased rescan: variant v of query q scans ONLY query
    q's M gathered coarse rows (the two-pass matcher's pass 2 — a large
    phase count over a small candidate subset instead of over the whole
    catalog). Returns ((B, V, M), (B, V, M)) int32 best/first-best-offset,
    identical per (q, v) to pallas_coarse_scan on the subset.

    Same kernel body as the stacked batch scan; the block-diagonal structure
    is pure BlockSpec indexing — grid (B, M/tt), query q's programs read W
    block column q and db rows q*M + i*tt, so no cross-query MACs are spent.
    """
    b, v0, nc, c = query_cs.shape
    assert 128 % s == 0, f"phase count s={s} must divide 128"
    # v*s lanes must be 128-aligned (roll widths / W slicing): pad variants
    # by repeating variant 0 — callers see only their V rows.
    unit = max(1, 128 // s)
    v = -(-v0 // unit) * unit
    if v != v0:
        query_cs = jnp.concatenate(
            [query_cs, jnp.broadcast_to(query_cs[:, :1],
                                        (b, v - v0) + query_cs.shape[2:])],
            axis=1)
    bm, lcw = db_sub_flat.shape
    assert bm % b == 0, "db_sub rows must be query-major B*M"
    m = bm // b
    assert lcw % 128 == 0
    lc = lcw // c
    n_off = (lc_true if lc_true is not None else lc) - nc + 1
    assert n_off >= 1
    m_blocks = -(-n_off // s)
    k_full = (nc + s - 1) * c
    k_pad = -(-k_full // 128) * 128
    if tt is None:
        tt = auto_stacked_tile(lcw, k_pad, v * s)
        while m % tt and tt > 8:
            tt //= 2
    assert m % tt == 0, "pad the candidate subset to the track tile"
    # (B, V, k_pad, s) -> (k_pad, B*V*s): query-major, variants inner.
    w = jax.vmap(jax.vmap(lambda q: _phase_matrix(q, s, k_pad)))(
        query_cs).transpose(2, 0, 1, 3).reshape(k_pad, b * v * s)
    kernel = functools.partial(_stacked_kernel, b=v, s=s, lcw=lcw,
                               k_pad=k_pad, m_blocks=m_blocks, n_off=n_off,
                               c=c)
    mt = m // tt
    best, idx = pl.pallas_call(
        kernel,
        grid=(b, mt),
        in_specs=[
            pl.BlockSpec((k_pad, v * s), lambda q, i: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, lcw), lambda q, i, _mt=mt: (q * _mt + i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tt, v), lambda q, i, _mt=mt: (q * _mt + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, v), lambda q, i, _mt=mt: (q * _mt + i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bm, v), jnp.int32),
            jax.ShapeDtypeStruct((bm, v), jnp.int32),
        ],
        interpret=interpret,
    )(w, db_sub_flat)
    best = best.reshape(b, m, v).transpose(0, 2, 1)[:, :v0]
    idx = idx.reshape(b, m, v).transpose(0, 2, 1)[:, :v0]
    return best, idx


def flatten_coarse(db_c: jnp.ndarray) -> jnp.ndarray:
    """(T, Lc, C) int8 -> (T, Lc_pad*C) flat, Lc padded so rows are
    128-lane aligned (Lc*C % 128 == 0). One-time XLA reshape at DB load."""
    t, lc, c = db_c.shape
    unit = 128 // int(np.gcd(c, 128))
    if lc % unit:
        db_c = jnp.pad(db_c, ((0, 0), (0, unit - lc % unit), (0, 0)))
        lc += unit - lc % unit
    return db_c.reshape(t, lc * c)


def pack_coarse_nibbles(db_flat: jnp.ndarray) -> jnp.ndarray:
    """(T, lcw) int8 flat coarse rows (values in {-1, 0, 1}) -> (T, lcw/2)
    int8 with feature 2j in the low nibble of byte j and feature 2j+1 in
    the high nibble; columns zero-padded to keep the packed row 128-lane
    aligned (the pad is whole zero coarse windows — they score 0 and the
    scan's lc_true mask already excludes their offsets).

    Halves the HBM bytes of the pass-1 prefilter sweep; consumed by
    pallas_coarse_scan_batch_stacked(packed4=True), which unpacks in
    registers — results bit-identical to the int8 layout. (A native jnp
    int4 array hits a jit-dispatch RecursionError on this stack — measured,
    benchmarks/pass1_tune.py — so the packing is explicit int8.)"""
    t, lcw = db_flat.shape
    if lcw % 256:
        db_flat = jnp.pad(db_flat, ((0, 0), (0, 256 - lcw % 256)))
    lo = db_flat[:, 0::2].astype(jnp.int32)
    hi = db_flat[:, 1::2].astype(jnp.int32)
    return ((lo & 15) | (hi << 4)).astype(jnp.int8)
