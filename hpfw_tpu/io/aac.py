"""ADTS AAC-LC audio decoder (NumPy), built from spec with probe-recovered
constants certified against the system reference decoder.

Scope: MPEG-2/MPEG-4 AAC-LC in ADTS framing — SCE/CPE/LFE elements,
long/short window sequences (with grouping) under sine and KBD window
shapes, scalefactors, all 11 spectral Huffman codebooks (+ESC), pulse
data, TNS, PNS, M/S and intensity stereo, DSE/FIL skip. HE-AAC (SBR/PS),
CCE and multi-channel configs beyond stereo are rejected with a clear
error (this library's pipeline is mono/stereo music input).

Reference parity: SURVEY.md §2.1 row 1 — the C++ reference wraps an
Essentia-class audio loader whose codec surface includes AAC (the mount
is empty; recollection). The decode path here is an original from-spec
implementation; the system libavcodec is used ONLY as a certification
oracle (io/aac_ref.py + tests/test_aac.py), following the house method
established for MPEG audio (io/mp3.py vs libmpg123) and Vorbis.

Probe-pinned behaviors (tools/recover_aac_tables.py; each certified by
tests against the reference decoder):
- Huffman tables: io/_aac_tables.py, recovered codeword-by-codeword and
  complete by Kraft equality.
- Dequant/output scaling: coefficient gain 2^((sf-100)/4) with a 2/N
  IMDCT and 1/32768 PCM normalization.
- ESC codebook 11: value = 2^(4+N)+mantissa, sign bits before escapes.
- Pulse: amplitude adds to the quantized magnitude toward the existing
  coefficient's sign (zero-valued coefficients go negative).
- TNS: filter regions walk DOWN from num_swb, clamped by the recovered
  tns_max_bands table; all-pole y[k] = x[k] - a*y[k-1]; coefficient
  tables follow the sin(i*pi/(2^len -+ 1)) ladder.
- PNS: the reference decoder's noise generator is an LCG
  (state*1664525+1013904223, int32 output, seed 0x1f2e3d4c, one draw per
  bin, state shared across the whole stream) with per-band energy
  normalization; replicated exactly so noise bands certify sample-wise.
"""

from __future__ import annotations

import numpy as np

from ._aac_tables import SF_BOOK, SPEC_BOOKS, SWB_LONG, SWB_SHORT

ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000,
              24000, 22050, 16000, 12000, 11025, 8000)

# tns_max_bands per sample rate (probe-recovered, long + short windows)
TNS_MAX_BANDS_LONG = {96000: 31, 88200: 31, 64000: 34, 48000: 40,
                      44100: 42, 32000: 51, 24000: 46, 22050: 46,
                      16000: 42, 12000: 42, 11025: 42, 8000: 39}
TNS_MAX_BANDS_SHORT = {96000: 9, 88200: 9, 64000: 10, 48000: 14,
                       44100: 14, 32000: 14, 24000: 14, 22050: 14,
                       16000: 14, 12000: 14, 11025: 14, 8000: 14}

ONLY_LONG_SEQUENCE = 0
LONG_START_SEQUENCE = 1
EIGHT_SHORT_SEQUENCE = 2
LONG_STOP_SEQUENCE = 3

ZERO_HCB = 0
FIRST_PAIR_HCB = 5
ESC_HCB = 11
NOISE_HCB = 13
INTENSITY_HCB2 = 14
INTENSITY_HCB = 15

_ID_SCE, _ID_CPE, _ID_CCE, _ID_LFE = 0, 1, 2, 3
_ID_DSE, _ID_PCE, _ID_FIL, _ID_END = 4, 5, 6, 7


class BitReader:
    """MSB-first bit reader (mirrors io/mp3.py's; overruns raise here —
    ADTS frames are length-framed so an overrun is a hard error)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("AAC bitstream overrun")
        v = 0
        d = self.data
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v


# --------------------------------------------------------------- tables

def _build_huff(book):
    """(length, code)->values dict + max codeword length."""
    return book, max(length for length, _ in book)


_SF_HUFF = _build_huff(SF_BOOK)
_SPEC_HUFF = {cb: _build_huff(tbl) for cb, tbl in SPEC_BOOKS.items()}

# TNS coefficient tables, probe-certified: the (res+3)-bit ladder is
# sin(i*pi/(2^len-1)) for the positive half and -sin((2^len-i)*pi/
# (2^len+1)) for the negative half; coef_compress keeps the OUTER
# quarters of that ladder (small-|a| codes), not a shorter ladder.


def _tns_ladder(coef_len):
    n = 1 << coef_len
    half = n >> 1
    out = np.empty(n)
    for i in range(half):
        out[i] = np.sin(i * np.pi / (n - 1))
    for i in range(half, n):
        out[i] = -np.sin((n - i) * np.pi / (n + 1))
    return out


def _tns_table(coef_res, compress):
    full = _tns_ladder(coef_res + 3)
    if not compress:
        return full
    n = full.shape[0]
    return np.concatenate([full[: n // 4], full[3 * n // 4:]])


_TNS_TABLES = {(res, comp): _tns_table(res, comp)
               for res in (0, 1) for comp in (0, 1)}


def _huff_decode(br, huff):
    table, maxlen = huff
    code = 0
    length = 0
    while length < maxlen:
        code = (code << 1) | br.read(1)
        length += 1
        hit = table.get((length, code))
        if hit is not None:
            return hit
    raise ValueError("invalid AAC Huffman codeword")


# ---------------------------------------------------------------- windows

def _kbd_window(n, alpha):
    """Kaiser-Bessel derived window, first half (n points)."""
    from numpy import i0

    a = np.pi * alpha
    x = np.arange(n + 1) / n
    kaiser = i0(a * np.sqrt(1.0 - (2.0 * x - 1.0) ** 2))
    cum = np.cumsum(kaiser)
    return np.sqrt(cum[:n] / cum[n])


def _sine_window(n):
    return np.sin(np.pi / (2 * n) * (np.arange(n) + 0.5))


_WIN_LONG = (_sine_window(1024), _kbd_window(1024, 4.0))
_WIN_SHORT = (_sine_window(128), _kbd_window(128, 6.0))

_IMDCT = {}


def _imdct_direct(spec, N):
    half = N // 2
    key = ("direct", N)
    if key not in _IMDCT:
        n = np.arange(N)[:, None]
        k = np.arange(half)[None, :]
        n0 = (half + 1) / 2.0
        _IMDCT[key] = (2.0 / N) * np.cos(
            2 * np.pi / N * (n + n0) * (k + 0.5))
    return _IMDCT[key] @ spec


# ---------------------------------------------------------------- ics

class _ICSInfo:
    __slots__ = ("window_sequence", "window_shape", "max_sfb", "num_windows",
                 "group_lens", "swb_offset", "num_swb", "tns_max_bands")


def _parse_ics_info(br, sample_rate):
    ics = _ICSInfo()
    if br.read(1):
        raise ValueError("ics_reserved_bit set")
    ics.window_sequence = br.read(2)
    ics.window_shape = br.read(1)
    if ics.window_sequence == EIGHT_SHORT_SEQUENCE:
        ics.max_sfb = br.read(4)
        grouping = br.read(7)
        ics.num_windows = 8
        group_lens = [1]
        for b in range(6, -1, -1):
            if (grouping >> b) & 1:
                group_lens[-1] += 1
            else:
                group_lens.append(1)
        ics.group_lens = group_lens
        ics.swb_offset = SWB_SHORT[sample_rate]
        ics.num_swb = len(ics.swb_offset) - 1
        ics.tns_max_bands = TNS_MAX_BANDS_SHORT[sample_rate]
    else:
        ics.max_sfb = br.read(6)
        if br.read(1):
            raise ValueError("predictor/LTP data in an LC stream")
        ics.num_windows = 1
        ics.group_lens = [1]
        ics.swb_offset = SWB_LONG[sample_rate]
        ics.num_swb = len(ics.swb_offset) - 1
        ics.tns_max_bands = TNS_MAX_BANDS_LONG[sample_rate]
    if ics.max_sfb > ics.num_swb:
        raise ValueError(
            f"max_sfb {ics.max_sfb} exceeds num_swb {ics.num_swb}")
    return ics


def _parse_sections(br, ics):
    """band_cb[group][sfb]."""
    bits, esc = (3, 7) if ics.window_sequence == EIGHT_SHORT_SEQUENCE \
        else (5, 31)
    out = []
    for _ in ics.group_lens:
        row = []
        while len(row) < ics.max_sfb:
            cb = br.read(4)
            run = 0
            while True:
                incr = br.read(bits)
                run += incr
                if incr != esc:
                    break
            if len(row) + run > ics.max_sfb:
                raise ValueError("section overruns max_sfb")
            row.extend([cb] * run)
        out.append(row)
    return out


def _parse_scalefactors(br, ics, band_cb, global_gain):
    """sf[group][sfb]: scalefactor for normal bands, noise energy for PNS
    bands, intensity position for IS bands."""
    sf = global_gain
    noise_nrg = global_gain - 90
    is_pos = 0
    noise_pcm = True
    out = []
    for g in range(len(ics.group_lens)):
        row = [0] * ics.max_sfb
        for s in range(ics.max_sfb):
            cb = band_cb[g][s]
            if cb == ZERO_HCB:
                continue
            if cb in (INTENSITY_HCB, INTENSITY_HCB2):
                is_pos += _huff_decode(br, _SF_HUFF)
                row[s] = is_pos
            elif cb == NOISE_HCB:
                if noise_pcm:
                    noise_pcm = False
                    noise_nrg += br.read(9) - 256
                else:
                    noise_nrg += _huff_decode(br, _SF_HUFF)
                row[s] = noise_nrg
            else:
                sf += _huff_decode(br, _SF_HUFF)
                if not 0 <= sf < 256:
                    raise ValueError(f"scalefactor {sf} out of range")
                row[s] = sf
        out.append(row)
    return out


def _parse_pulse(br):
    n = br.read(2) + 1
    start_sfb = br.read(6)
    offsets = []
    amps = []
    for _ in range(n):
        offsets.append(br.read(5))
        amps.append(br.read(4))
    return start_sfb, offsets, amps


def _parse_tns(br, ics):
    short = ics.window_sequence == EIGHT_SHORT_SEQUENCE
    filt_bits = 1 if short else 2
    len_bits, ord_bits = (4, 3) if short else (6, 5)
    filters = []           # per window: list of (length, order, dir, coefs)
    for _ in range(ics.num_windows):
        wfilt = []
        n_filt = br.read(filt_bits)
        coef_res = br.read(1) if n_filt else 0
        for _ in range(n_filt):
            length = br.read(len_bits)
            order = br.read(ord_bits)
            if order > 12:
                raise ValueError(f"TNS order {order} beyond LC limit")
            direction = compress = 0
            coefs = []
            if order:
                direction = br.read(1)
                compress = br.read(1)
                coef_len = coef_res + 3 - compress
                table = _TNS_TABLES[(coef_res, compress)]
                coefs = [table[br.read(coef_len)] for _ in range(order)]
            wfilt.append((length, order, direction, coefs))
        filters.append(wfilt)
    return filters


def _parse_spectrum(br, ics, band_cb):
    """Quantized values per group, laid out [group][sfb][win_in_group][w]
    as transmitted; returns quant[window][1024//num_windows]."""
    nwin = ics.num_windows
    wlen = 1024 // nwin
    quant = np.zeros((nwin, wlen))
    win_base = 0
    for g, glen in enumerate(ics.group_lens):
        for s in range(ics.max_sfb):
            cb = band_cb[g][s]
            lo, hi = ics.swb_offset[s], ics.swb_offset[s + 1]
            if cb == ZERO_HCB or cb >= NOISE_HCB:
                continue
            if cb > ESC_HCB:
                raise ValueError(f"reserved spectral codebook {cb}")
            dims = 4 if cb < FIRST_PAIR_HCB else 2
            signed = cb in (1, 2, 5, 6)
            huff = _SPEC_HUFF[cb]
            for w in range(glen):
                k = lo
                while k < hi:
                    vals = list(_huff_decode(br, huff))
                    if not signed:
                        signs = [br.read(1) if v else 0 for v in vals]
                    else:
                        signs = [1 if v < 0 else 0 for v in vals]
                        vals = [abs(v) for v in vals]
                    if cb == ESC_HCB:
                        for i, v in enumerate(vals):
                            if v == 16:
                                n = 0
                                while br.read(1):
                                    n += 1
                                if n > 16:
                                    raise ValueError("AAC escape too long")
                                vals[i] = (1 << (n + 4)) + br.read(n + 4)
                    for i, v in enumerate(vals):
                        quant[win_base + w, k + i] = -v if signs[i] else v
                    k += dims
        win_base += glen
    return quant


# ------------------------------------------------------------ dequant etc.

_POW43 = np.arange(8192) ** (4.0 / 3.0)


def _dequant(q):
    out = np.sign(q) * _POW43[np.abs(q).astype(np.int64).clip(0, 8191)]
    big = np.abs(q) >= 8192
    if big.any():
        out[big] = np.sign(q[big]) * np.abs(q[big]) ** (4.0 / 3.0)
    return out


def _apply_pulse(quant, ics, pulse):
    start_sfb, offsets, amps = pulse
    if ics.window_sequence == EIGHT_SHORT_SEQUENCE:
        raise ValueError("pulse data in an eight-short frame")
    if start_sfb > ics.num_swb:
        raise ValueError("pulse start_sfb beyond num_swb")
    k = ics.swb_offset[start_sfb]
    for off, amp in zip(offsets, amps):
        k += off
        if k >= 1024:
            raise ValueError("pulse position beyond the spectrum")
        base = quant[0, k]
        quant[0, k] = base + amp if base > 0 else base - amp
    return quant


class _LCG:
    """The reference decoder's PNS noise generator (probe-identified)."""

    __slots__ = ("state",)

    def __init__(self):
        self.state = 0x1F2E3D4C

    def draw(self, n):
        out = np.empty(n)
        s = self.state
        for i in range(n):
            s = (s * 1664525 + 1013904223) & 0xFFFFFFFF
            out[i] = s - (1 << 32) if s >= (1 << 31) else s
        self.state = s
        return out


def _spectra_from_ics(ics, band_cb, sf, quant, lcg, sample_rate):
    """Dequantized per-window spectra (num_windows, 1024/num_windows),
    with scalefactor gains and PNS applied (IS handled at CPE level)."""
    nwin = ics.num_windows
    wlen = 1024 // nwin
    spec = _dequant(quant)
    win_base = 0
    for g, glen in enumerate(ics.group_lens):
        for s in range(ics.max_sfb):
            cb = band_cb[g][s]
            lo, hi = ics.swb_offset[s], ics.swb_offset[s + 1]
            if cb in (INTENSITY_HCB, INTENSITY_HCB2):
                continue
            if cb == NOISE_HCB:
                # Probe-pinned: the reference's noise band (spectral-
                # domain) 2-norm is 2^(nrg/4 - 15); the global /32768
                # below supplies the -15.
                gain = 2.0 ** (0.25 * sf[g][s])
                for w in range(glen):
                    band = lcg.draw(hi - lo)
                    energy = float(np.sum(band * band))
                    band *= gain / np.sqrt(energy)
                    spec[win_base + w, lo:hi] = band
            elif cb != ZERO_HCB:
                gain = 2.0 ** (0.25 * (sf[g][s] - 100))
                spec[win_base:win_base + glen, lo:hi] *= gain
        win_base += glen
    return spec / 32768.0


def _apply_tns(spec, ics, tns_filters):
    if tns_filters is None:
        return spec
    mmm = min(ics.tns_max_bands, ics.max_sfb)
    for w, wfilt in enumerate(tns_filters):
        bottom = ics.num_swb
        for (length, order, direction, refl) in wfilt:
            top = bottom
            bottom = max(0, top - length)
            if order == 0:
                continue
            # reflection -> LPC (standard Levinson step-up)
            lpc = np.zeros(order)
            for m in range(order):
                k = refl[m]
                lpc_new = lpc.copy()
                lpc_new[m] = k
                for i in range(m):
                    lpc_new[i] = lpc[i] + k * lpc[m - 1 - i]
                lpc = lpc_new
            start = ics.swb_offset[min(bottom, mmm)]
            end = ics.swb_offset[min(top, mmm)]
            if end <= start:
                continue
            x = spec[w]
            if direction:
                rng = range(end - 1, start - 1, -1)
                step = 1
            else:
                rng = range(start, end)
                step = -1
            hist = np.zeros(order)
            for k_ in rng:
                y = x[k_] - float(np.dot(lpc, hist))
                hist[1:] = hist[:-1]
                hist[0] = y
                x[k_] = y
    return spec


# ------------------------------------------------------------- synthesis

class _ChannelState:
    __slots__ = ("overlap", "prev_shape", "prev_seq")

    def __init__(self):
        self.overlap = np.zeros(1024)
        # The reference decoder's channel state zero-initializes the
        # previous window shape, so frame 0's left half is ALWAYS sine
        # (probe-pinned); matched here for sample-exact certification.
        self.prev_shape = 0
        self.prev_seq = ONLY_LONG_SEQUENCE


def _long_window(shape, half):
    return (_WIN_LONG if half == 1024 else _WIN_SHORT)[shape]


def _synthesize(spec, ics, st):
    """One frame of one channel: IMDCT + window + overlap-add -> 1024
    output samples; updates st."""
    shape = ics.window_shape
    prev = st.prev_shape if st.prev_shape is not None else shape
    seq = ics.window_sequence
    out = np.empty(1024)

    if seq != EIGHT_SHORT_SEQUENCE:
        x = _imdct_direct(spec[0], 2048)
        # left half window (uses the PREVIOUS frame's shape)
        if seq == LONG_STOP_SEQUENCE:
            wl = np.zeros(1024)
            wl[448:576] = _WIN_SHORT[prev]
            wl[576:] = 1.0
        else:
            wl = _WIN_LONG[prev]
        # right half window (this frame's shape), stored time-reversed
        if seq == LONG_START_SEQUENCE:
            wr = np.zeros(1024)
            wr[:448] = 1.0
            wr[448:576] = _WIN_SHORT[shape][::-1]
        else:
            wr = _WIN_LONG[shape][::-1]
        out[:] = st.overlap + x[:1024] * wl
        st.overlap = x[1024:] * wr
    else:
        buf = np.zeros(2048)
        ws_prev = _WIN_SHORT[prev]
        ws_cur = _WIN_SHORT[shape]
        for w in range(8):
            xw = _imdct_direct(spec[w], 256)
            wl = ws_prev if w == 0 else ws_cur
            off = 448 + 128 * w
            buf[off:off + 128] += xw[:128] * wl
            buf[off + 128:off + 256] += xw[128:] * ws_cur[::-1]
        out[:] = st.overlap + buf[:1024]
        st.overlap = buf[1024:]
    st.prev_shape = shape
    st.prev_seq = seq
    return out


# ------------------------------------------------------------- elements

def _decode_ics(br, sample_rate, lcg, common_ics=None, scale_flag=False):
    global_gain = br.read(8)
    ics = common_ics if common_ics is not None else _parse_ics_info(
        br, sample_rate)
    band_cb = _parse_sections(br, ics)
    sf = _parse_scalefactors(br, ics, band_cb, global_gain)
    pulse = None
    if br.read(1):
        pulse = _parse_pulse(br)
    tns = None
    if br.read(1):
        tns = _parse_tns(br, ics)
    if br.read(1):
        raise ValueError("gain control (SSR) not supported")
    quant = _parse_spectrum(br, ics, band_cb)
    if pulse is not None:
        _apply_pulse(quant, ics, pulse)
    spec = _spectra_from_ics(ics, band_cb, sf, quant, lcg, sample_rate)
    return ics, band_cb, sf, spec, tns


def _decode_sce(br, sample_rate, lcg):
    br.read(4)                       # element_instance_tag
    ics, band_cb, sf, spec, tns = _decode_ics(br, sample_rate, lcg)
    spec = _apply_tns(spec, ics, tns)
    return [(ics, band_cb, sf, spec)]


def _decode_cpe(br, sample_rate, lcg):
    br.read(4)
    common_window = br.read(1)
    ms_mask = 0
    ms_used = None
    if common_window:
        ics = _parse_ics_info(br, sample_rate)
        ms_mask = br.read(2)
        if ms_mask == 1:
            ms_used = [[br.read(1) for _ in range(ics.max_sfb)]
                       for _ in range(len(ics.group_lens))]
        elif ms_mask == 2:
            ms_used = [[1] * ics.max_sfb
                       for _ in range(len(ics.group_lens))]
        elif ms_mask == 3:
            raise ValueError("reserved ms_mask_present value")
        icsL, cbL, sfL, specL, tnsL = _decode_ics(br, sample_rate, lcg,
                                                  common_ics=ics)
        icsR, cbR, sfR, specR, tnsR = _decode_ics(br, sample_rate, lcg,
                                                  common_ics=ics)
    else:
        icsL, cbL, sfL, specL, tnsL = _decode_ics(br, sample_rate, lcg)
        icsR, cbR, sfR, specR, tnsR = _decode_ics(br, sample_rate, lcg)

    if common_window:
        # M/S (on dequantized spectra, skipping IS and PNS bands)
        for g, glen in enumerate(icsL.group_lens):
            win_base = sum(icsL.group_lens[:g])
            for s in range(icsL.max_sfb):
                if ms_used is None or not ms_used[g][s]:
                    continue
                cbl, cbr = cbL[g][s], cbR[g][s]
                if cbl >= NOISE_HCB or cbr >= NOISE_HCB:
                    continue
                lo, hi = icsL.swb_offset[s], icsL.swb_offset[s + 1]
                for w in range(glen):
                    m = specL[win_base + w, lo:hi].copy()
                    sdiff = specR[win_base + w, lo:hi]
                    specL[win_base + w, lo:hi] = m + sdiff
                    specR[win_base + w, lo:hi] = m - sdiff
        # Intensity stereo: right-channel IS bands reuse the left spectrum
        for g, glen in enumerate(icsR.group_lens):
            win_base = sum(icsR.group_lens[:g])
            for s in range(icsR.max_sfb):
                cb = cbR[g][s]
                if cb not in (INTENSITY_HCB, INTENSITY_HCB2):
                    continue
                sign = 1.0 if cb == INTENSITY_HCB else -1.0
                if ms_used is not None and ms_used[g][s]:
                    sign = -sign
                scale = sign * 2.0 ** (-0.25 * sfR[g][s])
                lo, hi = icsR.swb_offset[s], icsR.swb_offset[s + 1]
                for w in range(glen):
                    specR[win_base + w, lo:hi] = \
                        specL[win_base + w, lo:hi] * scale
    specL = _apply_tns(specL, icsL, tnsL)
    specR = _apply_tns(specR, icsR, tnsR)
    return [(icsL, cbL, sfL, specL), (icsR, cbR, sfR, specR)]


def _decode_pce(br):
    """Parse (and discard) a program_config_element."""
    br.read(4 + 2 + 4)               # tag, object type, sampling index
    counts = [br.read(4), br.read(4), br.read(4), br.read(2),
              br.read(3), br.read(4)]
    if br.read(1):
        br.read(4)                   # mono mixdown
    if br.read(1):
        br.read(4)                   # stereo mixdown
    if br.read(1):
        br.read(3)                   # matrix mixdown
    front, side, back, lfe, assoc, cc = counts
    for _ in range(front + side + back):
        br.read(1 + 4)
    for _ in range(lfe + assoc):
        br.read(4)
    for _ in range(cc):
        br.read(1 + 4)
    br.pos += (-br.pos) % 8          # byte align
    n = br.read(8)
    for _ in range(n):
        br.read(8)


# ------------------------------------------------------------- ADTS layer

class _AdtsHeader:
    __slots__ = ("sample_rate", "channels", "frame_length", "crc",
                 "header_len", "profile")

    def check_supported(self):
        if self.profile != 1:
            raise ValueError(f"AAC profile/object {self.profile + 1} "
                             "unsupported (LC only)")

    def __init__(self, data, pos):
        if pos + 7 > len(data) or data[pos] != 0xFF \
                or (data[pos + 1] & 0xF6) != 0xF0:
            raise ValueError("bad ADTS sync")
        protection_absent = data[pos + 1] & 1
        self.profile = data[pos + 2] >> 6
        sr_idx = (data[pos + 2] >> 2) & 0xF
        if sr_idx >= len(ADTS_RATES):
            raise ValueError(f"bad ADTS sample-rate index {sr_idx}")
        self.sample_rate = ADTS_RATES[sr_idx]
        self.channels = ((data[pos + 2] & 1) << 2) | (data[pos + 3] >> 6)
        self.frame_length = ((data[pos + 3] & 3) << 11) \
            | (data[pos + 4] << 3) | (data[pos + 5] >> 5)
        if self.frame_length < 7:
            raise ValueError("bad ADTS frame length")
        nblocks = data[pos + 6] & 3
        if nblocks:
            raise ValueError("multi-raw-data-block ADTS frames unsupported")
        self.crc = not protection_absent
        self.header_len = 7 + (2 if self.crc else 0)


def _find_adts(data, pos, chain=2):
    """Next offset with a verified ADTS header whose frame lengths chain
    onto `chain` further verified headers (or the end of the stream) —
    spurious sync pairs inside other codecs' payloads don't chain."""
    n = len(data)
    while pos + 7 <= n:
        if data[pos] == 0xFF and (data[pos + 1] & 0xF6) == 0xF0:
            try:
                h = _AdtsHeader(data, pos)
            except ValueError:
                pos += 1
                continue
            nxt = pos + h.frame_length
            ok = True
            for _ in range(chain):
                if nxt == n:
                    break                      # clean end-of-stream
                try:
                    h2 = _AdtsHeader(data, nxt)
                except ValueError:
                    ok = False
                    break
                nxt += h2.frame_length
            if ok and nxt <= n:
                return pos
        pos += 1
    return -1


def decode_aac(data: bytes):
    """Decode an ADTS AAC-LC stream -> (pcm float64 (n, ch), sample_rate).

    Raw decoder output: no encoder-delay trim, matching a reference
    decoder fed the same raw stream (the house convention shared with
    decode_mp3/decode_vorbis).
    """
    pos = _find_adts(bytes(data), 0)
    if pos < 0:
        raise ValueError("no ADTS frames found")
    data = bytes(data)
    lcg = _LCG()
    states = None
    sr = None
    nch = None
    chunks = []
    while pos >= 0 and pos + 7 <= len(data):
        try:
            h = _AdtsHeader(data, pos)
        except ValueError:
            pos = _find_adts(data, pos + 1)
            continue
        h.check_supported()
        end = pos + h.frame_length
        if end > len(data):
            break
        if sr is None:
            sr = h.sample_rate
            nch = h.channels
            if nch not in (1, 2):
                raise ValueError(
                    f"channel config {nch} unsupported (mono/stereo only)")
        payload = data[pos + h.header_len:end]
        br = BitReader(payload)
        frame_ch = []
        while True:
            ele = br.read(3)
            if ele == _ID_END:
                break
            if ele == _ID_SCE or ele == _ID_LFE:
                frame_ch.extend(_decode_sce(br, sr, lcg))
            elif ele == _ID_CPE:
                frame_ch.extend(_decode_cpe(br, sr, lcg))
            elif ele == _ID_DSE:
                br.read(4)           # element_instance_tag
                align = br.read(1)
                cnt = br.read(8)
                if cnt == 255:
                    cnt += br.read(8)
                if align:
                    br.pos += (-br.pos) % 8
                br.pos += 8 * cnt
            elif ele == _ID_PCE:
                _decode_pce(br)
            elif ele == _ID_FIL:
                cnt = br.read(4)
                if cnt == 15:
                    cnt += br.read(8) - 1
                br.pos += 8 * cnt
            else:
                raise ValueError(f"unsupported syntax element {ele}")
        if len(frame_ch) != nch:
            raise ValueError(
                f"frame decodes {len(frame_ch)} channels, header says {nch}")
        if states is None:
            states = [_ChannelState() for _ in range(nch)]
        outs = []
        for c, (ics, band_cb, sfs, spec) in enumerate(frame_ch):
            outs.append(_synthesize(spec, ics, states[c]))
        chunks.append(np.stack(outs, axis=1))
        pos = end
        if pos + 7 > len(data):
            break
        if not (data[pos] == 0xFF and (data[pos + 1] & 0xF6) == 0xF0):
            pos = _find_adts(data, pos)
    if not chunks:
        raise ValueError("no decodable AAC frames")
    return np.concatenate(chunks, axis=0), sr
