"""Coarse fingerprint derivation for the two-stage 1M-track matcher.

A full-resolution linear scan of a million tracks is bandwidth-impossible
(~80 GB of packed prints per pass; SURVEY.md §6 flags the memory/cost wall),
so matching runs in two stages (SURVEY.md §7.4.4):

  coarse: a temporally smoothed, stride-s summary print per s frames,
          scanned for ALL tracks as an int8 +/-1 correlation GEMM on the MXU;
  fine:   the exact XOR+popcount scan, restricted to the top candidates in
          a +/-s offset window around each coarse peak.

The coarse print is a per-bit MAJORITY VOTE over s consecutive full-res
prints. Unlike plain decimation (which collapses when query/DB strides are
out of phase), majority windows overlap a misaligned query window by
(s-r)/s, so coarse correlation degrades gracefully with phase error r —
the coarse stage only has to put the true track into the candidate pool;
exactness comes from the fine stage.

Derived purely from packed prints, so databases need no extra pipeline
output and streaming queries can build them on the fly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unpack_bits_pm1(packed: jnp.ndarray, dtype=jnp.int8) -> jnp.ndarray:
    """(..., 2) uint32 packed prints -> (..., 64) +/-1 (lsb0 bit order)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., :, None] >> shifts) & jnp.uint32(1)   # (..., 2, 32)
    bits = bits.reshape(*packed.shape[:-1], 64)
    return (bits.astype(jnp.int32) * 2 - 1).astype(dtype)


def coarse_pm1(packed: jnp.ndarray, stride: int, *, dtype=jnp.int8,
               kind: str = "sign", channels: int = 64) -> jnp.ndarray:
    """Coarse summary prints per stride-window of full-res prints.

    packed: (L, 2) or (T, L, 2) uint32. Returns (Lc, C) or (T, Lc, C)
    with Lc = L // stride (tail prints beyond the last full window drop)
    and C = `channels` <= 64: hashprint channels are PCA-ordered (filter 0
    = top eigenvector), so the first C are each print's most informative
    bits — C < 64 shrinks coarse bytes by C/64 at the same stride
    (benchmarks/channel_study.py measures the recall cost).

    kind="sign": majority vote — sign of the per-bit +/-1 sum; ties (even s)
    break to -1, fixed and identical everywhere.
    kind="sum":  the per-bit +/-1 window SUM itself (range +/-stride) — the
    same int8 bytes carrying log2(stride)+1 extra nominal bits per channel.
    Measured WORSE than "sign" at 10k real-audio tracks at every stride x
    pool point (benchmarks/recall_study.py; the sum's magnitude variance
    pollutes coarse ranking), so "sign" is the default — this stays as the
    measured alternative. Requires stride <= 127 to fit int8.
    """
    squeeze = packed.ndim == 2
    if squeeze:
        packed = packed[None]
    t, l, _ = packed.shape
    lc = l // stride
    pm1 = unpack_bits_pm1(packed[:, : lc * stride], jnp.int32)
    sums = pm1.reshape(t, lc, stride, 64).sum(axis=2)
    if kind == "sum":
        assert stride <= 127, "sum coarse prints need stride <= 127 (int8)"
        out = sums.astype(dtype)
    else:
        out = jnp.where(sums > 0, 1, -1).astype(dtype)
    if channels < 64:
        out = out[:, :, :channels]
    return out[0] if squeeze else out


def coarse_lengths(lengths: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Full-res lengths -> number of complete coarse windows per track."""
    return lengths // stride


def coarse_correlation(
    query_c: jnp.ndarray,   # (Nc, 64) int8 +/-1
    db_c: jnp.ndarray,      # (T, Lc, 64) int8 +/-1 (zero where padded)
) -> jnp.ndarray:
    """corr(t, a) = sum_j q(j) . d(t, a+j) for every coarse offset a.

    Exact int32 correlation of every track against the coarse query at every
    coarse offset, shaped for the MXU: a naive sliding conv has ONE output
    channel (1/128 of the systolic array busy — measured 7 ms at 100k
    tracks), so instead the query is embedded at 128 phase shifts into a
    (Nc+127)-wide, 128-output-channel kernel and the conv strides by 128 —
    output channel r at window m scores offset 128*m + r. ~6x the MACs,
    full MXU width, ~3-4x faster end to end. Padded coarse positions are 0
    and contribute nothing. Output (T, Lc - Nc + 1) int32.
    """
    nc, c = query_c.shape
    t, lc, _ = db_c.shape
    n_off = lc - nc + 1
    s = 128
    if n_off <= 0:
        return jnp.zeros((t, max(n_off, 0)), jnp.int32)
    # kernel[:, :, r] = query shifted down by r rows.
    kern = jnp.stack(
        [jnp.pad(query_c, ((r, s - 1 - r), (0, 0))) for r in range(s)],
        axis=-1,
    )                                                    # (Nc+127, 64, 128)
    m = -(-n_off // s)
    need = (m - 1) * s + (nc + s - 1)
    if need > lc:
        db_c = jnp.pad(db_c, ((0, 0), (0, need - lc), (0, 0)))
    out = jax.lax.conv_general_dilated(
        db_c,
        kern,
        window_strides=(s,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32,
    )                                                    # (T, M, 128)
    return out.reshape(t, m * s)[:, :n_off]


def coarse_correlation_batch(
    query_cs: jnp.ndarray,  # (B, Nc, 64) int8 +/-1 (equal-length queries)
    db_c: jnp.ndarray,      # (T, Lc, 64)
) -> jnp.ndarray:
    """Batched exact correlation: (B, T, Lc - Nc + 1) int32.

    All B queries' phase-shifted kernels stack into one (Nc+127, 64, B*128)
    conv, so the whole coarse database streams from HBM ONCE for the entire
    batch — per-query cost approaches pure MXU time (the serving-throughput
    path; single queries pay the full memory sweep).
    """
    b, nc, c = query_cs.shape
    t, lc, _ = db_c.shape
    n_off = lc - nc + 1
    if n_off <= 0:
        return jnp.zeros((b, t, max(n_off, 0)), jnp.int32)
    # Each query is one output channel: at B >= ~8 the MXU is busy enough
    # without the single-query path's 128-phase-shift trick (which inflates
    # MACs ~6x and would cancel the batching win).
    kern = query_cs.transpose(1, 2, 0)                   # (Nc, 64, B)
    out = jax.lax.conv_general_dilated(
        db_c, kern, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32,
    )                                                    # (T, n_off, B)
    return out.transpose(2, 0, 1)
