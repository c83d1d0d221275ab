"""CELT frame decoder — the per-frame decode loop of RFC 6716 §4.3.

Ties together the range decoder (_celt_ec), allocation + band shapes
(_celt_bands), PVQ (_celt_pvq) and energy (_celt_energy) into a stateful
decoder: flags -> energy -> tf -> allocation -> shapes -> anti-collapse ->
denormalise -> inverse MDCT with the low-overlap window -> comb (pitch
post-)filter -> deemphasis.

Everything that decides bitstream consumption is exact integer arithmetic
(libopus celt_decoder.c / bands.c decode-side semantics); the signal path
follows the float build and is margin-certified against the system libopus
oracle (io/opus_ref.py, opus_custom_* frame API) — the reference mount is
empty per SURVEY.md §0, so the system library is the stand-in reference.

The inverse MDCT here is the textbook O(N^2) direct form with the
windowed-overlap-add written out explicitly (per-frame tail carry),
mathematically equivalent to the reference's in-place folded TDAC buffer;
equivalence (including absolute gain and time alignment) is pinned by the
sample-exact-within-float-noise certification in tests/test_opus.py.
"""

from __future__ import annotations

import math

import numpy as np

from ._celt_bands import (BandCtx, NB_BANDS, _quant_band, _quant_band_stereo,
                          compute_allocation, init_caps, tf_decode)
from ._celt_ec import BITRES, RangeDecoder
from ._celt_energy import (denormalise_bands, unquant_coarse_energy,
                           unquant_energy_finalise, unquant_fine_energy)
from ._celt_pvq import SPREAD_AGGRESSIVE, SPREAD_NORMAL
from ._celt_tables import (EBAND5MS, SPREAD_ICDF, TAPSET_ICDF, TRIM_ICDF,
                           WINDOW120)
from ._celt_bands import celt_lcg_rand, renormalise_vector

OVERLAP = 120
SHORT_MDCT = 120
MAX_LM = 3
DECODE_BUFFER = 2048
COMBFILTER_MINPERIOD = 15
_SIG_SCALE = 32768.0
_PREEMPH = 0.85

# celt.c comb_filter tapset gains (3 tapsets x 3 taps).
_PF_GAINS = ((0.3066406250, 0.2170410156, 0.1296386719),
             (0.4638671875, 0.2680664062, 0.0),
             (0.7998046875, 0.1000976562, 0.0))


def _c_div(a: int, b: int) -> int:
    """C signed integer division (truncate toward zero)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


# -- inverse MDCT (direct form) ------------------------------------------------

_IMDCT_CACHE: dict[int, np.ndarray] = {}


def _imdct_matrix(nb: int) -> np.ndarray:
    """(2*nb, nb) unnormalized IMDCT basis: the synthesis pair of the
    reference's 4/N-scaled forward transform (mdct.c), so backward gain
    is exactly 1."""
    m = _IMDCT_CACHE.get(nb)
    if m is None:
        n = np.arange(2 * nb, dtype=np.float64)[:, None]
        k = np.arange(nb, dtype=np.float64)[None, :]
        m = np.cos(np.pi / nb * (n + 0.5 + nb / 2.0) * (k + 0.5))
        _IMDCT_CACHE[nb] = m
    return m


_WINDOW_CACHE: dict[int, np.ndarray] = {}


def _window_nonzero(nb: int) -> np.ndarray:
    """The nonzero span (length nb+OVERLAP) of the low-overlap window for
    block size nb: rise WINDOW120, flat 1, fall reversed."""
    w = _WINDOW_CACHE.get(nb)
    if w is None:
        w = np.ones(nb + OVERLAP, np.float64)
        w120 = WINDOW120.astype(np.float64)
        w[:OVERLAP] = w120
        w[nb:] = w120[::-1]
        _WINDOW_CACHE[nb] = w
    return w


# -- quant_all_bands (bands.c, decode side) -------------------------------------

def quant_all_bands(start: int, end: int, x_full: np.ndarray,
                    y_full, collapse_masks: np.ndarray,
                    pulses: list[int], short_blocks: int, spread: int,
                    dual_stereo: int, intensity: int, tf_res: list[int],
                    total_bits: int, balance: int, dec: RangeDecoder,
                    lm: int, coded_bands: int, seed: int,
                    disable_inv: bool) -> int:
    """Decode all band shapes into x_full (+ y_full for stereo); returns the
    updated LCG seed. x_full/y_full have length M*120 (the frame), bands
    occupying [M*eBands[i], M*eBands[i+1]); the last band's tail doubles as
    the reference's lowband_scratch."""
    c = 2 if y_full is not None else 1
    m = 1 << lm
    b_big = m if short_blocks else 1
    norm_offset = m * EBAND5MS[start]
    norm_len = m * EBAND5MS[NB_BANDS - 1] - norm_offset
    norm = np.zeros(norm_len, np.float64)
    norm2 = np.zeros(norm_len, np.float64) if c == 2 else norm

    ctx = BandCtx(dec, intensity, spread, seed)
    ctx.disable_inv = disable_inv
    lowband_offset = 0
    update_lowband = True
    scratch_base = x_full[m * EBAND5MS[NB_BANDS - 1]:]

    for i in range(start, end):
        ctx.i = i
        last = i == end - 1
        x = x_full[m * EBAND5MS[i]:m * EBAND5MS[i + 1]]
        y = (y_full[m * EBAND5MS[i]:m * EBAND5MS[i + 1]]
             if y_full is not None else None)
        n = m * EBAND5MS[i + 1] - m * EBAND5MS[i]
        tell = dec.tell_frac()

        if i != start:
            balance -= tell
        remaining_bits = total_bits - tell - 1
        ctx.remaining_bits = remaining_bits
        if i <= coded_bands - 1:
            curr_balance = _c_div(balance, min(3, coded_bands - i))
            b = max(0, min(16383, min(remaining_bits + 1,
                                      pulses[i] + curr_balance)))
        else:
            b = 0

        if (m * EBAND5MS[i] - n >= m * EBAND5MS[start] or i == start + 1) \
                and (update_lowband or lowband_offset == 0):
            lowband_offset = i
        # special_hybrid_folding only applies when start != 0 (hybrid mode,
        # not reachable from CELT-only packets).

        tf_change = tf_res[i]
        ctx.tf_change = tf_change
        lowband_scratch = scratch_base
        if last:
            lowband_scratch = None

        if lowband_offset != 0 and (spread != SPREAD_AGGRESSIVE
                                    or b_big > 1 or tf_change < 0):
            effective_lowband = max(
                0, m * EBAND5MS[lowband_offset] - norm_offset - n)
            fold_start = lowband_offset
            while True:
                fold_start -= 1
                if m * EBAND5MS[fold_start] <= (effective_lowband
                                                + norm_offset):
                    break
            fold_end = lowband_offset - 1
            while True:
                fold_end += 1
                if not (fold_end < i and m * EBAND5MS[fold_end]
                        < effective_lowband + norm_offset + n):
                    break
            x_cm = y_cm = 0
            fold_i = fold_start
            while True:
                x_cm |= int(collapse_masks[fold_i * c + 0])
                y_cm |= int(collapse_masks[fold_i * c + c - 1])
                fold_i += 1
                if fold_i >= fold_end:
                    break
        else:
            effective_lowband = -1
            x_cm = y_cm = (1 << b_big) - 1

        if dual_stereo and i == intensity:
            dual_stereo = 0
            norm[:m * EBAND5MS[i] - norm_offset] = 0.5 * (
                norm[:m * EBAND5MS[i] - norm_offset]
                + norm2[:m * EBAND5MS[i] - norm_offset])

        lowband = (norm[effective_lowband:]
                   if effective_lowband != -1 else None)
        lowband_out = (None if last
                       else norm[m * EBAND5MS[i] - norm_offset:])
        if dual_stereo:
            lowband2 = (norm2[effective_lowband:]
                        if effective_lowband != -1 else None)
            lowband2_out = (None if last
                            else norm2[m * EBAND5MS[i] - norm_offset:])
            x_cm = _quant_band(ctx, x, n, b // 2, b_big, lowband, lm,
                               lowband_out, 1.0, lowband_scratch, x_cm)
            y_cm = _quant_band(ctx, y, n, b // 2, b_big, lowband2, lm,
                               lowband2_out, 1.0, lowband_scratch, y_cm)
        elif y is not None:
            x_cm = _quant_band_stereo(ctx, x, y, n, b, b_big, lowband, lm,
                                      lowband_out, lowband_scratch,
                                      x_cm | y_cm)
            y_cm = x_cm
        else:
            x_cm = _quant_band(ctx, x, n, b, b_big, lowband, lm,
                               lowband_out, 1.0, lowband_scratch, x_cm)
            y_cm = x_cm
        collapse_masks[i * c + 0] = x_cm & 0xFF
        collapse_masks[i * c + c - 1] = y_cm & 0xFF
        balance += pulses[i] + tell
        update_lowband = b > (n << BITRES)
    return ctx.seed


# -- anti-collapse (bands.c) -----------------------------------------------------

def anti_collapse(x_full: np.ndarray, collapse_masks: np.ndarray, lm: int,
                  c: int, size: int, start: int, end: int,
                  log_e: np.ndarray, prev1_log_e: np.ndarray,
                  prev2_log_e: np.ndarray, pulses: list[int],
                  seed: int) -> None:
    """Inject noise into short-MDCT blocks that lost all their pulses in a
    transient frame (bands.c anti_collapse, float build)."""
    for i in range(start, end):
        n0 = EBAND5MS[i + 1] - EBAND5MS[i]
        depth = ((1 + pulses[i]) // n0) >> lm
        thresh = 0.5 * math.exp2(-0.125 * depth)
        sqrt_1 = 1.0 / math.sqrt(n0 << lm)
        for ch in range(c):
            prev1 = float(prev1_log_e[ch, i])
            prev2 = float(prev2_log_e[ch, i])
            if c == 1:
                prev1 = max(prev1, float(prev1_log_e[1, i]))
                prev2 = max(prev2, float(prev2_log_e[1, i]))
            e_diff = max(0.0, float(log_e[ch, i]) - min(prev1, prev2))
            r = 2.0 * math.exp2(-e_diff)
            if lm == 3:
                r *= 1.41421356
            r = min(thresh, r) * sqrt_1
            xb = x_full[ch * size + (EBAND5MS[i] << lm):
                        ch * size + (EBAND5MS[i + 1] << lm)]
            renorm = False
            mask = int(collapse_masks[i * c + ch])
            for k in range(1 << lm):
                if not (mask & (1 << k)):
                    for j in range(n0):
                        seed = celt_lcg_rand(seed)
                        xb[(j << lm) + k] = r if (seed & 0x8000) else -r
                    renorm = True
            if renorm:
                renormalise_vector(xb, 1.0)


# -- comb (pitch post-)filter (celt.c) -------------------------------------------

def _comb_const(sig: np.ndarray, off: int, t: int, n: int,
                g0: float, g1: float, g2: float) -> None:
    """y[i] = x[i] + g0*x[i-T] + g1*(x[i-T+1]+x[i-T-1]) + g2*(x[i-T+2]+
    x[i-T-2]) in place — an IIR when T < n, so process in chunks that never
    read a sample written in the same chunk."""
    step = max(1, t - 2)
    i = 0
    while i < n:
        j = min(n, i + step)
        s = off + i
        e = off + j
        sig[s:e] += (g0 * sig[s - t:e - t]
                     + g1 * (sig[s - t + 1:e - t + 1]
                             + sig[s - t - 1:e - t - 1])
                     + g2 * (sig[s - t + 2:e - t + 2]
                             + sig[s - t - 2:e - t - 2]))
        i = j


def comb_filter(sig: np.ndarray, off: int, t0: int, t1: int, n: int,
                g0: float, g1: float, tapset0: int, tapset1: int) -> None:
    """Apply the pitch postfilter to sig[off:off+n] in place, cross-fading
    from (t0, g0, tapset0) to (t1, g1, tapset1) over the window."""
    if g0 == 0.0 and g1 == 0.0:
        return
    t0 = max(t0, COMBFILTER_MINPERIOD)
    t1 = max(t1, COMBFILTER_MINPERIOD)
    g00 = g0 * _PF_GAINS[tapset0][0]
    g01 = g0 * _PF_GAINS[tapset0][1]
    g02 = g0 * _PF_GAINS[tapset0][2]
    g10 = g1 * _PF_GAINS[tapset1][0]
    g11 = g1 * _PF_GAINS[tapset1][1]
    g12 = g1 * _PF_GAINS[tapset1][2]
    overlap = 0
    if not (g0 == g1 and t0 == t1 and tapset0 == tapset1):
        overlap = min(OVERLAP, n)
        w = WINDOW120.astype(np.float64)[:overlap]
        f = w * w
        # Sequential (the old-filter reads can reach back < overlap).
        for i in range(overlap):
            p = off + i
            old = (g00 * sig[p - t0] + g01 * (sig[p - t0 + 1]
                                              + sig[p - t0 - 1])
                   + g02 * (sig[p - t0 + 2] + sig[p - t0 - 2]))
            new = (g10 * sig[p - t1] + g11 * (sig[p - t1 + 1]
                                              + sig[p - t1 - 1])
                   + g12 * (sig[p - t1 + 2] + sig[p - t1 - 2]))
            sig[p] += (1.0 - f[i]) * old + f[i] * new
    if g1 == 0.0:
        return
    _comb_const(sig, off + overlap, t1, n - overlap, g10, g11, g12)


# -- the stateful frame decoder ---------------------------------------------------

class CELTDecoder:
    """CELT decoder state across frames (celt_decoder.c, 48 kHz mode).

    `channels` is the output channel count (CC); each packet carries its own
    stream channel count C (mono packets in a stereo stream decode dual-mono,
    stereo packets in a mono stream downmix), matching the reference.
    """

    def __init__(self, channels: int):
        if channels not in (1, 2):
            raise ValueError("CELT decoder supports 1 or 2 channels")
        self.cc = channels
        self.disable_inv = channels == 1
        self.old_band_e = np.zeros((2, NB_BANDS), np.float32)
        self.old_log_e = np.full((2, NB_BANDS), -28.0, np.float32)
        self.old_log_e2 = np.full((2, NB_BANDS), -28.0, np.float32)
        self.rng = 0
        self.preemph_mem = [0.0, 0.0]
        # Post-comb-filter synthesis history (pre-deemphasis signal domain).
        self.sig_hist = np.zeros((channels, DECODE_BUFFER), np.float64)
        self.ola_tail = np.zeros((channels, OVERLAP), np.float64)
        self.pf_period = 0
        self.pf_period_old = 0
        self.pf_gain = 0.0
        self.pf_gain_old = 0.0
        self.pf_tapset = 0
        self.pf_tapset_old = 0
        # Range-coder state after the last frame: the cross-implementation
        # sync check (libopus OPUS_GET_FINAL_RANGE equivalent).
        self.final_range = 0

    # -- synthesis helpers -------------------------------------------------

    def _synth_channel(self, ch: int, freq: np.ndarray, n: int, nb: int,
                       b: int) -> np.ndarray:
        syn = np.zeros(n + OVERLAP, np.float64)
        syn[:OVERLAP] += self.ola_tail[ch]
        wnz = _window_nonzero(nb)
        pad = (nb - OVERLAP) >> 1
        basis = _imdct_matrix(nb)
        for blk in range(b):
            spec = freq[blk::b][:nb].astype(np.float64)
            xf = basis @ spec
            syn[blk * nb:blk * nb + nb + OVERLAP] += \
                wnz * xf[pad:pad + nb + OVERLAP]
        self.ola_tail[ch] = syn[n:]
        return syn[:n]

    def decode_frame(self, data: bytes, n: int, stream_channels: int,
                     end_band: int = NB_BANDS) -> np.ndarray:
        """Decode one CELT frame -> (n, cc) float PCM in [-1, 1] at 48 kHz.

        n is the frame size in samples (120 << LM); data is the compressed
        payload (the Opus frame, TOC removed). end_band comes from the TOC
        bandwidth: 13 (NB), 17 (WB), 19 (SWB), 21 (FB)."""
        lm = (n // SHORT_MDCT).bit_length() - 1
        if SHORT_MDCT << lm != n or not 0 <= lm <= MAX_LM:
            raise ValueError(f"bad CELT frame size {n}")
        c = stream_channels
        cc = self.cc
        m = 1 << lm
        return self._decode(data, n, lm, m, c, cc, 0, end_band)

    def _decode(self, data, n, lm, m, c, cc, start, end):
        dec = RangeDecoder(data)
        total_bits = len(data) * 8
        old_e = self.old_band_e

        tell = dec.tell()
        if tell >= total_bits:
            silence = 1
        elif tell == 1:
            silence = dec.dec_bit_logp(15)
        else:
            silence = 0
        if silence:
            # Pretend we've read all the bits: every flag below defaults.
            dec.nbits_total += total_bits - dec.tell()
            tell = total_bits

        pf_gain = 0.0
        pf_period = 0
        pf_tapset = 0
        if start == 0 and tell + 16 <= total_bits:
            if dec.dec_bit_logp(1):
                octave = dec.dec_uint(6)
                pf_period = (16 << octave) + dec.dec_bits(4 + octave) - 1
                qg = dec.dec_bits(3)
                if dec.tell() + 2 <= total_bits:
                    pf_tapset = dec.dec_icdf(TAPSET_ICDF, 2)
                pf_gain = 0.09375 * (qg + 1)
            tell = dec.tell()

        if lm > 0 and tell + 3 <= total_bits:
            is_transient = dec.dec_bit_logp(3)
            tell = dec.tell()
        else:
            is_transient = 0
        short_blocks = m if is_transient else 0

        intra = bool(dec.dec_bit_logp(3)) if tell + 3 <= total_bits else False
        unquant_coarse_energy(start, end, old_e, intra, dec, c, lm)
        tf_res = tf_decode(start, end, bool(is_transient), lm, dec)
        tell = dec.tell()
        spread = SPREAD_NORMAL
        if tell + 4 <= total_bits:
            spread = dec.dec_icdf(SPREAD_ICDF, 5)

        cap = init_caps(lm, c)
        offsets = [0] * NB_BANDS
        dynalloc_logp = 6
        total_bits_q3 = total_bits << BITRES
        tell_q3 = dec.tell_frac()
        for i in range(start, end):
            width = c * (EBAND5MS[i + 1] - EBAND5MS[i]) << lm
            quanta = min(width << BITRES, max(6 << BITRES, width))
            dynalloc_loop_logp = dynalloc_logp
            boost = 0
            while (tell_q3 + (dynalloc_loop_logp << BITRES) < total_bits_q3
                   and boost < cap[i]):
                flag = dec.dec_bit_logp(dynalloc_loop_logp)
                tell_q3 = dec.tell_frac()
                if not flag:
                    break
                boost += quanta
                total_bits_q3 -= quanta
                dynalloc_loop_logp = 1
            offsets[i] = boost
            if boost > 0:
                dynalloc_logp = max(2, dynalloc_logp - 1)

        alloc_trim = 5
        if tell_q3 + (6 << BITRES) <= total_bits_q3:
            alloc_trim = dec.dec_icdf(TRIM_ICDF, 7)

        bits = (len(data) * 8 << BITRES) - dec.tell_frac() - 1
        anti_collapse_rsv = (1 << BITRES) if (
            is_transient and lm >= 2 and bits >= (lm + 2) << BITRES) else 0
        bits -= anti_collapse_rsv
        (coded_bands, balance, intensity, dual_stereo, pulses, fine_quant,
         fine_priority) = compute_allocation(start, end, offsets, cap,
                                             alloc_trim, bits, c, lm, dec)

        unquant_fine_energy(start, end, old_e, fine_quant, dec, c)

        x_full = np.zeros(c * m * SHORT_MDCT, np.float64)
        x = x_full[:m * SHORT_MDCT]
        y = x_full[m * SHORT_MDCT:] if c == 2 else None
        collapse_masks = np.zeros(NB_BANDS * c, np.int64)
        self.rng = quant_all_bands(
            start, end, x, y, collapse_masks, pulses, short_blocks, spread,
            dual_stereo, intensity, tf_res,
            len(data) * (8 << BITRES) - anti_collapse_rsv, balance, dec, lm,
            coded_bands, self.rng, self.disable_inv)

        anti_collapse_on = 0
        if anti_collapse_rsv > 0:
            anti_collapse_on = dec.dec_bits(1)
        unquant_energy_finalise(start, end, old_e, fine_quant, fine_priority,
                                len(data) * 8 - dec.tell(), dec, c)
        if anti_collapse_on:
            anti_collapse(x_full, collapse_masks, lm, c, n, start, end,
                          old_e, self.old_log_e, self.old_log_e2, pulses,
                          self.rng)
        if silence:
            old_e[:, :] = -28.0

        # Synthesis: denormalise + IMDCT/OLA per output channel.
        nb = SHORT_MDCT if is_transient else SHORT_MDCT << lm
        b_blk = m if is_transient else 1
        out = np.empty((cc, n), np.float64)
        if cc == 2 and c == 1:
            freq = denormalise_bands(x, old_e[0], start, end, m, n,
                                     bool(silence), EBAND5MS)
            for ch in range(2):
                out[ch] = self._synth_channel(ch, freq, n, nb, b_blk)
        elif cc == 1 and c == 2:
            f0 = denormalise_bands(x, old_e[0], start, end, m, n,
                                   bool(silence), EBAND5MS)
            f1 = denormalise_bands(y, old_e[1], start, end, m, n,
                                   bool(silence), EBAND5MS)
            freq = 0.5 * (f0 + f1)
            out[0] = self._synth_channel(0, freq, n, nb, b_blk)
        else:
            for ch in range(cc):
                xc = x if ch == 0 else y
                freq = denormalise_bands(xc, old_e[ch], start, end, m, n,
                                         bool(silence), EBAND5MS)
                out[ch] = self._synth_channel(ch, freq, n, nb, b_blk)

        # Pitch postfilter over the synthesized frame, with history.
        pcm = np.empty((n, cc), np.float32)
        for ch in range(cc):
            sig = np.concatenate([self.sig_hist[ch], out[ch]])
            off = DECODE_BUFFER
            p_old = max(self.pf_period_old, COMBFILTER_MINPERIOD)
            p_cur = max(self.pf_period, COMBFILTER_MINPERIOD)
            comb_filter(sig, off, p_old, p_cur, SHORT_MDCT,
                        self.pf_gain_old, self.pf_gain,
                        self.pf_tapset_old, self.pf_tapset)
            if lm != 0:
                comb_filter(sig, off + SHORT_MDCT, p_cur, pf_period,
                            n - SHORT_MDCT, self.pf_gain, pf_gain,
                            self.pf_tapset, pf_tapset)
            self.sig_hist[ch] = sig[len(sig) - DECODE_BUFFER:]
            # Deemphasis (preemph coef 0.85, float build).
            frame = sig[off:off + n]
            mem = self.preemph_mem[ch]
            de = np.empty(n, np.float64)
            for j in range(n):
                tmp = frame[j] + mem
                mem = _PREEMPH * tmp
                de[j] = tmp
            self.preemph_mem[ch] = mem
            pcm[:, ch] = (de / _SIG_SCALE).astype(np.float32)

        self.pf_period_old = self.pf_period
        self.pf_gain_old = self.pf_gain
        self.pf_tapset_old = self.pf_tapset
        self.pf_period = pf_period
        self.pf_gain = pf_gain
        self.pf_tapset = pf_tapset
        if lm != 0:
            self.pf_period_old = self.pf_period
            self.pf_gain_old = self.pf_gain
            self.pf_tapset_old = self.pf_tapset

        # Roll the energy history for prediction / anti-collapse. A mono
        # frame keeps both channel slots in sync (the reference's
        # `if (C==1) COPY(oldBandE+nbEBands, oldBandE)` before the roll, so
        # anti-collapse's cross-channel MAX sees real energies).
        if c == 1:
            old_e[1, :] = old_e[0, :]
        if not is_transient:
            self.old_log_e2[:, :] = self.old_log_e
            self.old_log_e[:, :] = old_e
        else:
            np.minimum(self.old_log_e, old_e, out=self.old_log_e)
        old_e[:, :start] = 0.0
        old_e[:, end:] = 0.0
        self.old_log_e[:, :start] = -28.0
        self.old_log_e[:, end:] = -28.0
        self.old_log_e2[:, :start] = -28.0
        self.old_log_e2[:, end:] = -28.0
        # The next frame's noise-fill seed is the range coder's final state,
        # NOT the continuation of the LCG chain (celt_decoder.c ends with
        # `st->rng = dec->rng`); anti_collapse above already consumed the
        # LCG-chained value, matching the reference's ordering.
        self.rng = dec.rng
        self.final_range = dec.rng
        return pcm
