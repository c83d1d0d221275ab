"""CELT band decoding — allocation, theta splits, PVQ partitions, stereo.

RFC 6716 §4.3.3 (bit allocation) and §4.3.4 (shape decoding). This is the
sync-critical heart of the decoder: every quantity here decides how many
range-coded/raw bits the next decode step consumes, so each formula is an
exact integer transcription of the normative behavior (libopus rate.c /
bands.c semantics; reference mount empty per SURVEY.md §0, so the system
libopus oracle in io/opus_ref.py is the certification target).

Budget units are eighth-bits (BITRES = 3) throughout, matching tell_frac().
Float signal math follows the reference float build, where all the Q-format
shift macros are identity.
"""

from __future__ import annotations

import math

import numpy as np

from ._celt_ec import BITRES, RangeDecoder, ilog
from ._celt_pvq import (SPREAD_AGGRESSIVE, SPREAD_NONE, alg_unquant)
from ._celt_tables import (BAND_ALLOCATION, BIT_DEINTERLEAVE, BIT_INTERLEAVE,
                           CACHE_BITS50, CACHE_CAPS50, CACHE_INDEX50,
                           EBAND5MS, LOGN400, ORDERY_TABLE, TF_SELECT_TABLE,
                           TRIM_ICDF)

NB_BANDS = len(EBAND5MS) - 1          # 21
MAX_PSEUDO = 40
LOG_MAX_PSEUDO = 6
ALLOC_STEPS = 6
FINE_OFFSET = 21
MAX_FINE_BITS = 8
QTHETA_OFFSET = 4
QTHETA_OFFSET_TWOPHASE = 16

# rate.c: log2 fractions (Q3) of the intensity-band count, reserved for
# coding the intensity position.
LOG2_FRAC_TABLE = (
    0,
    8, 13,
    16, 19, 21, 23,
    24, 26, 27, 28, 29, 30, 31, 32,
    32, 33, 34, 34, 35, 36, 36, 37, 37,
)

_EXP2_TABLE8 = (16384, 17866, 19483, 21247, 23170, 25267, 27554, 30048)


# -- pseudo-pulse <-> bits cache (rate.h) -------------------------------------

def get_pulses(i: int) -> int:
    return i if i < 8 else (8 + (i & 7)) << ((i >> 3) - 1)


def _cache_row(band: int, lm: int):
    idx = CACHE_INDEX50[lm + 1][band]
    if idx < 0:
        return None
    return CACHE_BITS50[idx:]


def bits2pulses(band: int, lm: int, bits: int) -> int:
    cache = _cache_row(band, lm)
    lo = 0
    hi = cache[0]
    bits -= 1
    for _ in range(LOG_MAX_PSEUDO):
        mid = (lo + hi + 1) >> 1
        if cache[mid] >= bits:
            hi = mid
        else:
            lo = mid
    if bits - (-1 if lo == 0 else cache[lo]) <= cache[hi] - bits:
        return lo
    return hi


def pulses2bits(band: int, lm: int, pulses: int) -> int:
    if pulses == 0:
        return 0
    return _cache_row(band, lm)[pulses] + 1


def init_caps(lm: int, c: int) -> list[int]:
    """Per-band hard bit caps (celt.c init_caps), eighth-bit units."""
    caps = []
    for i in range(NB_BANDS):
        n = (EBAND5MS[i + 1] - EBAND5MS[i]) << lm
        caps.append((CACHE_CAPS50[2 * lm + c - 1][i] + 64) * c * n >> 2)
    return caps


# -- tf_res decode (celt.c tf_decode) ----------------------------------------

def tf_decode(start: int, end: int, is_transient: bool, lm: int,
              dec: RangeDecoder) -> list[int]:
    budget = dec.storage * 8
    tell = dec.tell()
    logp = 2 if is_transient else 4
    tf_select_rsv = 1 if (lm > 0 and tell + logp + 1 <= budget) else 0
    budget -= tf_select_rsv
    tf_changed = 0
    curr = 0
    tf_res = [0] * NB_BANDS
    for i in range(start, end):
        if tell + logp <= budget:
            curr ^= dec.dec_bit_logp(logp)
            tell = dec.tell()
            tf_changed |= curr
        tf_res[i] = curr
        logp = 4 if is_transient else 5
    tf_select = 0
    base = 4 if is_transient else 0
    if tf_select_rsv and (TF_SELECT_TABLE[lm][base + 0 + tf_changed]
                          != TF_SELECT_TABLE[lm][base + 2 + tf_changed]):
        tf_select = dec.dec_bit_logp(1)
    for i in range(start, end):
        tf_res[i] = TF_SELECT_TABLE[lm][base + 2 * tf_select + tf_res[i]]
    return tf_res


# -- allocation (rate.c) -------------------------------------------------------

def _interp_bits2pulses(start, end, skip_start, bits1, bits2, thresh, cap,
                        total, skip_rsv, intensity_rsv, dual_stereo_rsv,
                        c, lm, dec: RangeDecoder):
    """rate.c interp_bits2pulses, decode side. Returns (coded_bands, balance,
    intensity, dual_stereo, bits, ebits, fine_priority)."""
    alloc_floor = c << BITRES
    stereo = 1 if c > 1 else 0
    logm = lm << BITRES
    lo = 0
    hi = 1 << ALLOC_STEPS
    for _ in range(ALLOC_STEPS):
        mid = (lo + hi) >> 1
        psum = 0
        done = False
        for j in range(end - 1, start - 1, -1):
            tmp = bits1[j] + ((mid * bits2[j]) >> ALLOC_STEPS)
            if tmp >= thresh[j] or done:
                done = True
                psum += min(tmp, cap[j])
            elif tmp >= alloc_floor:
                psum += alloc_floor
        if psum > total:
            hi = mid
        else:
            lo = mid
    psum = 0
    done = False
    bits = [0] * NB_BANDS
    for j in range(end - 1, start - 1, -1):
        tmp = bits1[j] + ((lo * bits2[j]) >> ALLOC_STEPS)
        if tmp < thresh[j] and not done:
            tmp = alloc_floor if tmp >= alloc_floor else 0
        else:
            done = True
        tmp = min(tmp, cap[j])
        bits[j] = tmp
        psum += tmp

    # Skip decisions, working back from the top band.
    coded_bands = end
    while True:
        j = coded_bands - 1
        if j <= skip_start:
            total += skip_rsv
            break
        left = total - psum
        percoeff = left // (EBAND5MS[coded_bands] - EBAND5MS[start])
        left -= (EBAND5MS[coded_bands] - EBAND5MS[start]) * percoeff
        rem = max(left - (EBAND5MS[j] - EBAND5MS[start]), 0)
        band_width = EBAND5MS[coded_bands] - EBAND5MS[j]
        band_bits = bits[j] + percoeff * band_width + rem
        if band_bits >= max(thresh[j], alloc_floor + (1 << BITRES)):
            if dec.dec_bit_logp(1):
                break
            psum += 1 << BITRES
            band_bits -= 1 << BITRES
        psum -= bits[j] + intensity_rsv
        if intensity_rsv > 0:
            intensity_rsv = LOG2_FRAC_TABLE[j - start]
        psum += intensity_rsv
        if band_bits >= alloc_floor:
            psum += alloc_floor
            bits[j] = alloc_floor
        else:
            bits[j] = 0
        coded_bands -= 1

    if intensity_rsv > 0:
        intensity = start + dec.dec_uint(coded_bands + 1 - start)
    else:
        intensity = 0
    if intensity <= start:
        total += dual_stereo_rsv
        dual_stereo_rsv = 0
    dual_stereo = dec.dec_bit_logp(1) if dual_stereo_rsv > 0 else 0

    left = total - psum
    percoeff = left // (EBAND5MS[coded_bands] - EBAND5MS[start])
    left -= (EBAND5MS[coded_bands] - EBAND5MS[start]) * percoeff
    for j in range(start, coded_bands):
        bits[j] += percoeff * (EBAND5MS[j + 1] - EBAND5MS[j])
    for j in range(start, coded_bands):
        tmp = min(left, EBAND5MS[j + 1] - EBAND5MS[j])
        bits[j] += tmp
        left -= tmp

    ebits = [0] * NB_BANDS
    fine_priority = [0] * NB_BANDS
    balance = 0
    for j in range(start, coded_bands):
        n0 = EBAND5MS[j + 1] - EBAND5MS[j]
        n = n0 << lm
        bit = bits[j] + balance
        if n > 1:
            excess = max(bit - cap[j], 0)
            bits[j] = bit - excess
            den = c * n + (1 if (c == 2 and n > 2 and not dual_stereo
                                 and j < intensity) else 0)
            nclogn = den * (LOGN400[j] + logm)
            offset = (nclogn >> 1) - den * FINE_OFFSET
            if n == 2:
                offset += den << BITRES >> 2
            if bits[j] + offset < (den * 2) << BITRES:
                offset += nclogn >> 2
            elif bits[j] + offset < (den * 3) << BITRES:
                offset += nclogn >> 3
            eb = max(0, bits[j] + offset + (den << (BITRES - 1)))
            eb = (eb // den) >> BITRES
            if c * eb > (bits[j] >> BITRES):
                eb = bits[j] >> stereo >> BITRES
            eb = min(eb, MAX_FINE_BITS)
            fine_priority[j] = 1 if eb * (den << BITRES) >= bits[j] + offset \
                else 0
            bits[j] -= (c * eb) << BITRES
            ebits[j] = eb
        else:
            excess = max(0, bit - (c << BITRES))
            bits[j] = bit - excess
            ebits[j] = 0
            fine_priority[j] = 1
        if excess > 0:
            extra_fine = min(excess >> (stereo + BITRES),
                             MAX_FINE_BITS - ebits[j])
            ebits[j] += extra_fine
            extra_bits = (extra_fine * c) << BITRES
            fine_priority[j] = 1 if extra_bits >= excess - balance else 0
            excess -= extra_bits
        balance = excess

    for j in range(coded_bands, end):
        ebits[j] = bits[j] >> stereo >> BITRES
        bits[j] = 0
        fine_priority[j] = 1 if ebits[j] < 1 else 0
    return coded_bands, balance, intensity, dual_stereo, bits, ebits, \
        fine_priority


def compute_allocation(start, end, offsets, cap, alloc_trim, total, c, lm,
                       dec: RangeDecoder):
    """rate.c clt_compute_allocation (decode side)."""
    total = max(total, 0)
    skip_start = start
    skip_rsv = (1 << BITRES) if total >= (1 << BITRES) else 0
    total -= skip_rsv
    intensity_rsv = 0
    dual_stereo_rsv = 0
    if c == 2:
        intensity_rsv = LOG2_FRAC_TABLE[end - start]
        if intensity_rsv > total:
            intensity_rsv = 0
        else:
            total -= intensity_rsv
            if total >= (1 << BITRES):
                dual_stereo_rsv = 1 << BITRES
                total -= dual_stereo_rsv

    thresh = [0] * NB_BANDS
    trim_offset = [0] * NB_BANDS
    for j in range(start, end):
        width = EBAND5MS[j + 1] - EBAND5MS[j]
        thresh[j] = max(c << BITRES, (3 * width << lm << BITRES) >> 4)
        trim_offset[j] = (c * width * (alloc_trim - 5 - lm) * (end - j - 1)
                          * (1 << (lm + BITRES))) >> 6
        if (width << lm) == 1:
            trim_offset[j] -= c << BITRES

    lo = 1
    hi = len(BAND_ALLOCATION) - 1
    while lo <= hi:
        done = False
        psum = 0
        mid = (lo + hi) >> 1
        for j in range(end - 1, start - 1, -1):
            width = EBAND5MS[j + 1] - EBAND5MS[j]
            bitsj = (c * width * BAND_ALLOCATION[mid][j]) << lm >> 2
            if bitsj > 0:
                bitsj = max(0, bitsj + trim_offset[j])
            bitsj += offsets[j]
            if bitsj >= thresh[j] or done:
                done = True
                psum += min(bitsj, cap[j])
            elif bitsj >= c << BITRES:
                psum += c << BITRES
        if psum > total:
            hi = mid - 1
        else:
            lo = mid + 1
    hi = lo
    lo -= 1

    bits1 = [0] * NB_BANDS
    bits2 = [0] * NB_BANDS
    for j in range(start, end):
        width = EBAND5MS[j + 1] - EBAND5MS[j]
        b1 = (c * width * BAND_ALLOCATION[lo][j]) << lm >> 2
        b2 = cap[j] if hi >= len(BAND_ALLOCATION) \
            else (c * width * BAND_ALLOCATION[hi][j]) << lm >> 2
        if b1 > 0:
            b1 = max(0, b1 + trim_offset[j])
        if b2 > 0:
            b2 = max(0, b2 + trim_offset[j])
        if lo > 0:
            b1 += offsets[j]
        b2 += offsets[j]
        if offsets[j] > 0:
            skip_start = j
        b2 = max(0, b2 - b1)
        bits1[j] = b1
        bits2[j] = b2
    return _interp_bits2pulses(start, end, skip_start, bits1, bits2, thresh,
                               cap, total, skip_rsv, intensity_rsv,
                               dual_stereo_rsv, c, lm, dec)


# -- fixed-point helpers shared with the reference bit-exactly ---------------

def _frac_mul16(a: int, b: int) -> int:
    """(a*b + 16384) >> 15 on int16 operands (entcode FRAC_MUL16)."""
    a = np.int16(a)
    b = np.int16(b)
    return int((16384 + int(a) * int(b)) >> 15)


def bitexact_cos(x: int) -> int:
    tmp = (4096 + x * x) >> 13
    x2 = tmp
    x2 = (32767 - x2) + _frac_mul16(
        x2, -7651 + _frac_mul16(x2, 8277 + _frac_mul16(-626, x2)))
    return 1 + x2


def bitexact_log2tan(isin: int, icos: int) -> int:
    lc = ilog(icos)
    ls = ilog(isin)
    icos <<= 15 - lc
    isin <<= 15 - ls
    return ((ls - lc) * (1 << 11)
            + _frac_mul16(isin, _frac_mul16(isin, -2597) + 7932)
            - _frac_mul16(icos, _frac_mul16(icos, -2597) + 7932))


def _isqrt32(n: int) -> int:
    return math.isqrt(n)


def celt_lcg_rand(seed: int) -> int:
    return (1664525 * seed + 1013904223) & 0xFFFFFFFF


# -- signal-domain helpers (float build semantics) ----------------------------

_SQRT_HALF = 0.7071067811865476


def haar1(x: np.ndarray, n0: int, stride: int) -> None:
    n0 >>= 1
    for i in range(stride):
        idx0 = stride * 2 * np.arange(n0) + i
        idx1 = idx0 + stride
        a = _SQRT_HALF * x[idx0]
        b = _SQRT_HALF * x[idx1]
        x[idx0] = a + b
        x[idx1] = a - b


def _deinterleave_hadamard(x: np.ndarray, n0: int, stride: int,
                           hadamard: bool) -> None:
    n = n0 * stride
    tmp = np.empty(n, x.dtype)
    if hadamard:
        ordery = ORDERY_TABLE[stride - 2:2 * stride - 2]
        for i in range(stride):
            tmp[ordery[i] * n0:(ordery[i] + 1) * n0] = x[i::stride][:n0]
    else:
        for i in range(stride):
            tmp[i * n0:(i + 1) * n0] = x[i::stride][:n0]
    x[:n] = tmp


def _interleave_hadamard(x: np.ndarray, n0: int, stride: int,
                         hadamard: bool) -> None:
    n = n0 * stride
    tmp = np.empty(n, x.dtype)
    if hadamard:
        ordery = ORDERY_TABLE[stride - 2:2 * stride - 2]
        for i in range(stride):
            tmp[i::stride] = x[ordery[i] * n0:(ordery[i] + 1) * n0]
    else:
        for i in range(stride):
            tmp[i::stride] = x[i * n0:(i + 1) * n0]
    x[:n] = tmp


def renormalise_vector(x: np.ndarray, gain: float) -> None:
    e = float(np.dot(x, x))
    if e > 0:
        x *= gain / math.sqrt(e)


def stereo_merge(x: np.ndarray, y: np.ndarray, mid: float) -> None:
    """Reconstruct left/right from mid/side in place (bands.c, float)."""
    xp = float(np.dot(y, x)) * mid
    side = float(np.dot(y, y))
    el = mid * mid + side - 2 * xp
    er = mid * mid + side + 2 * xp
    if er < 6e-4 or el < 6e-4:
        y[:] = x
        return
    lgain = 1.0 / math.sqrt(el)
    rgain = 1.0 / math.sqrt(er)
    l = mid * x
    r = y.copy()
    x[:] = lgain * (l - r)
    y[:] = rgain * (l + r)


# -- theta (mid/side or low/high split angle) ----------------------------------

class SplitCtx:
    __slots__ = ("inv", "imid", "iside", "delta", "itheta", "qalloc")


def _compute_qn(n: int, b: int, offset: int, pulse_cap: int,
                stereo: bool) -> int:
    n2 = 2 * n - 1
    if stereo and n == 2:
        n2 -= 1
    qb = (b + n2 * offset) // n2
    qb = min(b - pulse_cap - (4 << BITRES), qb)
    qb = min(8 << BITRES, qb)
    if qb < (1 << BITRES >> 1):
        return 1
    qn = _EXP2_TABLE8[qb & 0x7] >> (14 - (qb >> BITRES))
    return ((qn + 1) >> 1) << 1


def compute_theta(ctx, sctx: SplitCtx, n: int, b: int, b_blocks: int,
                  b0: int, lm: int, stereo: bool, fill: int):
    """Decode the split angle (bands.c compute_theta, decode side).
    Returns (b_remaining, fill)."""
    dec: RangeDecoder = ctx.dec
    i = ctx.i
    itheta = 0
    inv = 0
    pulse_cap = LOGN400[i] + lm * (1 << BITRES)
    offset = (pulse_cap >> 1) - (QTHETA_OFFSET_TWOPHASE if stereo and n == 2
                                 else QTHETA_OFFSET)
    qn = _compute_qn(n, b, offset, pulse_cap, stereo)
    if stereo and i >= ctx.intensity:
        qn = 1
    tell = dec.tell_frac()
    if qn != 1:
        if stereo and n > 2:
            p0 = 3
            x0 = qn // 2
            ft = p0 * (x0 + 1) + x0
            fs = dec.decode(ft)
            if fs < (x0 + 1) * p0:
                x = fs // p0
            else:
                x = x0 + 1 + (fs - (x0 + 1) * p0)
            fl = p0 * x if x <= x0 else (x - 1 - x0) + (x0 + 1) * p0
            fh = p0 * (x + 1) if x <= x0 else (x - x0) + (x0 + 1) * p0
            dec.update(fl, fh, ft)
            itheta = x
        elif b0 > 1 or stereo:
            itheta = dec.dec_uint(qn + 1)
        else:
            # triangular pdf
            ft = ((qn >> 1) + 1) * ((qn >> 1) + 1)
            fm = dec.decode(ft)
            if fm < ((qn >> 1) * ((qn >> 1) + 1) >> 1):
                itheta = (_isqrt32(8 * fm + 1) - 1) >> 1
                fs = itheta + 1
                fl = itheta * (itheta + 1) >> 1
            else:
                itheta = (2 * (qn + 1) - _isqrt32(8 * (ft - fm - 1) + 1)) >> 1
                fs = qn + 1 - itheta
                fl = ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1)
            dec.update(fl, fl + fs, ft)
        itheta = (itheta * 16384) // qn
    elif stereo:
        if b > 2 << BITRES and ctx.remaining_bits > 2 << BITRES:
            inv = dec.dec_bit_logp(2)
        else:
            inv = 0
        # Phase-inversion override (the bit is still consumed above).
        if ctx.disable_inv:
            inv = 0
        itheta = 0
    qalloc = dec.tell_frac() - tell
    b -= qalloc

    if itheta == 0:
        imid = 32767
        iside = 0
        fill &= (1 << b_blocks) - 1
        delta = -16384
    elif itheta == 16384:
        imid = 0
        iside = 32767
        fill &= ((1 << b_blocks) - 1) << b_blocks
        delta = 16384
    else:
        imid = bitexact_cos(itheta)
        iside = bitexact_cos(16384 - itheta)
        delta = _frac_mul16((n - 1) << 7, bitexact_log2tan(iside, imid))

    sctx.inv = inv
    sctx.imid = imid
    sctx.iside = iside
    sctx.delta = delta
    sctx.itheta = itheta
    sctx.qalloc = qalloc
    return b, fill


# -- band shape decoding (bands.c quant_* family, decode side) -----------------

class BandCtx:
    """Decode-side slice of the reference band_ctx."""

    __slots__ = ("dec", "i", "intensity", "spread", "tf_change",
                 "remaining_bits", "seed", "avoid_split_noise",
                 "disable_inv")

    def __init__(self, dec, intensity, spread, seed):
        self.dec = dec
        self.intensity = intensity
        self.spread = spread
        self.seed = seed
        self.i = 0
        self.tf_change = 0
        self.remaining_bits = 0
        self.avoid_split_noise = False
        self.disable_inv = False


def _quant_band_n1(ctx: BandCtx, x, y, b, lowband_out):
    """One-sample band: a sign per channel (bands.c quant_band_n1)."""
    for arr in (x, y):
        if arr is None:
            continue
        sign = 0
        if ctx.remaining_bits >= 1 << BITRES:
            sign = ctx.dec.dec_bits(1)
            ctx.remaining_bits -= 1 << BITRES
            b -= 1 << BITRES
        arr[0] = -1.0 if sign else 1.0
    if lowband_out is not None:
        lowband_out[0] = x[0]
    return 1


def _quant_partition(ctx: BandCtx, x, n, b, b_blocks, lowband, lm,
                     gain, fill):
    """Recursive split-or-PVQ decode of one (sub)band (quant_partition)."""
    dec = ctx.dec
    i = ctx.i
    b0 = b_blocks
    cache = _cache_row(i, lm)
    if lm != -1 and b > cache[cache[0]] + 12 and n > 2:
        n >>= 1
        y = x[n:2 * n]
        lm -= 1
        if b_blocks == 1:
            fill = (fill & 1) | (fill << 1)
        b_blocks = (b_blocks + 1) >> 1

        sctx = SplitCtx()
        b, fill = compute_theta(ctx, sctx, n, b, b_blocks, b0, lm, False,
                                fill)
        imid = sctx.imid
        iside = sctx.iside
        delta = sctx.delta
        itheta = sctx.itheta
        qalloc = sctx.qalloc
        mid = imid / 32768.0
        side = iside / 32768.0

        if b0 > 1 and (itheta & 0x3FFF):
            if itheta > 8192:
                delta -= delta >> (4 - lm)
            else:
                delta = min(0, delta + (n << BITRES >> (5 - lm)))
        mbits = max(0, min(b, (b - delta) // 2))
        sbits = b - mbits
        ctx.remaining_bits -= qalloc

        next_lowband2 = lowband[n:] if lowband is not None else None
        rebalance = ctx.remaining_bits
        if mbits >= sbits:
            cm = _quant_partition(ctx, x, n, mbits, b_blocks, lowband, lm,
                                  gain * mid, fill)
            rebalance = mbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 0:
                sbits += rebalance - (3 << BITRES)
            cm |= _quant_partition(ctx, y, n, sbits, b_blocks, next_lowband2,
                                   lm, gain * side, fill >> b_blocks) \
                << (b0 >> 1)
        else:
            cm = _quant_partition(ctx, y, n, sbits, b_blocks, next_lowband2,
                                  lm, gain * side, fill >> b_blocks) \
                << (b0 >> 1)
            rebalance = sbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 16384:
                mbits += rebalance - (3 << BITRES)
            cm |= _quant_partition(ctx, x, n, mbits, b_blocks, lowband, lm,
                                   gain * mid, fill)
        return cm

    # Leaf: PVQ (or folding when no pulses fit).
    q = bits2pulses(i, lm, b)
    curr_bits = pulses2bits(i, lm, q)
    ctx.remaining_bits -= curr_bits
    while ctx.remaining_bits < 0 and q > 0:
        ctx.remaining_bits += curr_bits
        q -= 1
        curr_bits = pulses2bits(i, lm, q)
        ctx.remaining_bits -= curr_bits
    if q != 0:
        return alg_unquant(dec, x[:n], n, get_pulses(q), ctx.spread,
                           b_blocks, gain)
    # No pulses: noise fill or spectral folding.
    cm_mask = (1 << b_blocks) - 1
    fill &= cm_mask
    if not fill:
        x[:n] = 0.0
        return 0
    if lowband is None:
        seed = ctx.seed
        for j in range(n):
            seed = celt_lcg_rand(seed)
            x[j] = float(np.int32(np.uint32(seed)) >> 20)
        ctx.seed = seed
        cm = cm_mask
    else:
        seed = ctx.seed
        for j in range(n):
            seed = celt_lcg_rand(seed)
            tmp = 1.0 / 256.0
            if seed & 0x8000:
                x[j] = lowband[j] + tmp
            else:
                x[j] = lowband[j] - tmp
        ctx.seed = seed
        cm = fill
    renormalise_vector(x[:n], gain)
    return cm


def _quant_band(ctx: BandCtx, x, n, b, b_blocks, lowband, lm, lowband_out,
                gain, lowband_scratch, fill):
    """Mono band decode: tf pre/post transforms around quant_partition."""
    n0 = n
    n_b = n // b_blocks
    b0 = b_blocks
    time_divide = 0
    recombine = 0
    long_blocks = b0 == 1
    tf_change = ctx.tf_change

    if n == 1:
        return _quant_band_n1(ctx, x, None, b, lowband_out)

    if tf_change > 0:
        recombine = tf_change
    if lowband_scratch is not None and lowband is not None and \
            (recombine or ((n_b & 1) == 0 and tf_change < 0) or b0 > 1):
        lowband_scratch[:n] = lowband[:n]
        lowband = lowband_scratch

    for k in range(recombine):
        if lowband is not None:
            haar1(lowband, n >> k, 1 << k)
        fill = BIT_INTERLEAVE[fill & 0xF] | (BIT_INTERLEAVE[fill >> 4] << 2)
    b_blocks >>= recombine
    n_b <<= recombine

    while (n_b & 1) == 0 and tf_change < 0:
        if lowband is not None:
            haar1(lowband, n_b, b_blocks)
        fill |= fill << b_blocks
        b_blocks <<= 1
        n_b >>= 1
        time_divide += 1
        tf_change += 1
    b0 = b_blocks
    n_b0 = n_b

    if b0 > 1 and lowband is not None:
        _deinterleave_hadamard(lowband, n_b >> recombine,
                               b0 << recombine, long_blocks)

    cm = _quant_partition(ctx, x, n, b, b_blocks, lowband, lm, gain, fill)

    # resynthesis (always, we are a decoder)
    if b0 > 1:
        _interleave_hadamard(x[:n], n_b >> recombine, b0 << recombine,
                             long_blocks)
    n_b = n_b0
    b_blocks = b0
    for _ in range(time_divide):
        b_blocks >>= 1
        n_b <<= 1
        cm |= cm >> b_blocks
        haar1(x, n_b, b_blocks)
    for k in range(recombine):
        cm = BIT_DEINTERLEAVE[cm]
        haar1(x, n0 >> k, 1 << k)
    b_blocks <<= recombine

    if lowband_out is not None:
        nrm = math.sqrt(n0)
        lowband_out[:n0] = nrm * x[:n0]
    return cm & ((1 << b_blocks) - 1)


def _quant_band_stereo(ctx: BandCtx, x, y, n, b, b_blocks, lowband, lm,
                       lowband_out, lowband_scratch, fill):
    """Stereo band decode (bands.c quant_band_stereo, decode side)."""
    dec = ctx.dec
    if n == 1:
        return _quant_band_n1(ctx, x, y, b, lowband_out)
    orig_fill = fill

    sctx = SplitCtx()
    b, fill = compute_theta(ctx, sctx, n, b, b_blocks, b_blocks, lm, True,
                            fill)
    inv = sctx.inv
    imid = sctx.imid
    iside = sctx.iside
    delta = sctx.delta
    itheta = sctx.itheta
    qalloc = sctx.qalloc
    mid = imid / 32768.0
    side = iside / 32768.0

    if n == 2:
        mbits = b
        sbits = 0
        if itheta != 0 and itheta != 16384:
            sbits = 1 << BITRES
        mbits -= sbits
        swap = itheta > 8192
        ctx.remaining_bits -= qalloc + sbits
        x2, y2 = (y, x) if swap else (x, y)
        sign = dec.dec_bits(1) if sbits else 0
        sign = 1 - 2 * sign
        cm = _quant_band(ctx, x2, n, mbits, b_blocks, lowband, lm,
                         lowband_out, 1.0, lowband_scratch, orig_fill)
        y2[0] = -sign * x2[1]
        y2[1] = sign * x2[0]
        x[0] *= mid
        x[1] *= mid
        y[0] *= side
        y[1] *= side
        tmp = x[0]
        x[0] = tmp - y[0]
        y[0] = tmp + y[0]
        tmp = x[1]
        x[1] = tmp - y[1]
        y[1] = tmp + y[1]
    else:
        mbits = max(0, min(b, (b - delta) // 2))
        sbits = b - mbits
        ctx.remaining_bits -= qalloc
        rebalance = ctx.remaining_bits
        if mbits >= sbits:
            cm = _quant_band(ctx, x, n, mbits, b_blocks, lowband, lm,
                             lowband_out, 1.0, lowband_scratch, fill)
            rebalance = mbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 0:
                sbits += rebalance - (3 << BITRES)
            cm |= _quant_band(ctx, y, n, sbits, b_blocks, None, lm, None,
                              side, None, fill >> b_blocks)
        else:
            cm = _quant_band(ctx, y, n, sbits, b_blocks, None, lm, None,
                             side, None, fill >> b_blocks)
            rebalance = sbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 16384:
                mbits += rebalance - (3 << BITRES)
            cm |= _quant_band(ctx, x, n, mbits, b_blocks, lowband, lm,
                              lowband_out, 1.0, lowband_scratch, fill)

    if n != 2:
        stereo_merge(x[:n], y[:n], mid)
    if inv:
        y[:n] = -y[:n]
    return cm
