"""MPEG-1 Layer III frame decoding (ISO/IEC 11172-3 2.4.3.4).

Pipeline per granule/channel: side info -> (bit reservoir) scalefactors ->
Huffman spectrum -> requantize -> reorder (short blocks) -> stereo
(MS/intensity) -> alias reduction -> IMDCT/window/overlap-add ->
frequency inversion -> 18 x 32 subband samples for the shared polyphase
synthesis in io/mp3.py.

Numeric constants that the offline environment could not read from the
spec (scalefactor-band edges, slen pairs, pretab, alias coefficients,
window shapes) follow the hashprint of the standard as implemented here
and are each pinned by a dedicated probe test against the system
reference decoder (tests/test_mp3.py); the Huffman tables are recovered
outright by tools/recover_mp3_huffman.py.
"""

from __future__ import annotations

import numpy as np

from ._mp3_huffman import BIG_VALUE_TABLES, COUNT1_TABLES, tree

# Scalefactor band boundaries (23 entries long / 14 entries short) per
# header sample-rate index 0=44100, 1=48000, 2=32000.
SFB_LONG = (
    (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134, 162,
     196, 238, 288, 342, 418, 576),
    (0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128, 156,
     190, 230, 276, 330, 384, 576),
    (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156, 194,
     240, 296, 364, 448, 550, 576),
)
SFB_SHORT = (
    (0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    (0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    (0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192),
)


def _cum(widths):
    out = [0]
    for w in widths:
        out.append(out[-1] + w)
    return tuple(out)


# MPEG-2 LSF / MPEG-2.5 band boundaries (ISO 13818-3 Annex B), keyed by
# actual sample rate; certified against the reference decoder by the lame
# streams + LSF probes in tests/test_mp3.py.
SFB_LONG_LSF = {
    22050: _cum((6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 38,
                 46, 52, 60, 68, 58, 54)),
    24000: _cum((6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 18, 22, 26, 32, 38,
                 46, 54, 62, 70, 76, 36)),
    16000: _cum((6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 38,
                 46, 52, 60, 68, 58, 54)),
    # MPEG-2.5 11025 AND 12000 both use the 22050-family long table
    # (recovered by table sweep vs the reference decoder — 12000 does
    # NOT follow its 24000 MPEG-2 sibling).
    11025: _cum((6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 38,
                 46, 52, 60, 68, 58, 54)),
    12000: _cum((6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 38,
                 46, 52, 60, 68, 58, 54)),
    8000: _cum((12, 12, 12, 12, 12, 12, 16, 20, 24, 28, 32, 40, 48, 56,
                64, 76, 90, 2, 2, 2, 2, 2)),
}
SFB_SHORT_LSF = {
    22050: _cum((4, 4, 4, 6, 6, 8, 10, 14, 18, 26, 32, 42, 18)),
    24000: _cum((4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 32, 44, 12)),
    16000: _cum((4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 30, 40, 18)),
    # MPEG-2.5 11025/12000 pair the 22050-family long table with the
    # 16000-family short table — recovered by a table sweep against the
    # reference decoder (both probe streams hit the float32 floor only
    # with this combination).
    11025: _cum((4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 30, 40, 18)),
    12000: _cum((4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 30, 40, 18)),
    8000: _cum((8, 8, 8, 12, 16, 20, 24, 28, 36, 2, 2, 2, 26)),
}


def _sfb_tables(h):
    """(long 23-edge, short 14-edge) boundary tables for a frame header."""
    if h.lsf:
        return SFB_LONG_LSF[h.sample_rate], SFB_SHORT_LSF[h.sample_rate]
    return SFB_LONG[h.sr_idx], SFB_SHORT[h.sr_idx]

SLEN = ((0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

PRETAB = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

_CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142,
                -0.0037])
_CS = 1.0 / np.sqrt(1.0 + _CI * _CI)
_CA = _CI / np.sqrt(1.0 + _CI * _CI)

# IMDCT basis: long (36 x 18) and short (12 x 6).
_IMDCT36 = np.cos(np.pi / 72.0 * (2 * np.arange(36)[:, None] + 19)
                  * (2 * np.arange(18)[None, :] + 1))
_IMDCT12 = np.cos(np.pi / 24.0 * (2 * np.arange(12)[:, None] + 7)
                  * (2 * np.arange(6)[None, :] + 1))


def _windows():
    i = np.arange(36)
    w0 = np.sin(np.pi / 36.0 * (i + 0.5))
    w1 = w0.copy()
    w1[18:24] = 1.0
    w1[24:30] = np.sin(np.pi / 12.0 * (i[24:30] - 18 + 0.5))
    w1[30:] = 0.0
    w3 = w0.copy()
    w3[:6] = 0.0
    w3[6:12] = np.sin(np.pi / 12.0 * (i[6:12] - 6 + 0.5))
    w3[12:18] = 1.0
    ws = np.sin(np.pi / 12.0 * (np.arange(12) + 0.5))
    return {0: w0, 1: w1, 3: w3, "s": ws}


_WIN = _windows()


class GranuleInfo:
    __slots__ = ("part2_3_length", "big_values", "global_gain",
                 "scalefac_compress", "window_switching", "block_type",
                 "mixed_block", "table_select", "subblock_gain",
                 "region0_count", "region1_count", "preflag",
                 "scalefac_scale", "count1table_select")


class Layer3State:
    MAX_RESERVOIR = 2048  # > 511-byte max main_data_begin + one frame

    def __init__(self, nch: int):
        self.nch = nch
        self.reservoir = bytearray()
        self.overlap = [np.zeros((32, 18)) for _ in range(nch)]


def _read_side_info(h, br):
    """Both layouts: MPEG-1 (2 granules, scfsi, 4-bit scalefac_compress,
    preflag bit) and LSF (1 granule, no scfsi, 9-bit scalefac_compress,
    preflag implied by the partition class)."""
    nch = h.channels
    main_data_begin = br.read(8 if h.lsf else 9)
    br.read((1 if h.lsf else 5) if nch == 1 else (2 if h.lsf else 3))
    if h.lsf:
        scfsi = [[0] * 4 for _ in range(nch)]
    else:
        scfsi = [[br.read(1) for _ in range(4)] for _ in range(nch)]
    granules = []
    for _gr in range(1 if h.lsf else 2):
        chs = []
        for _ch in range(nch):
            g = GranuleInfo()
            g.part2_3_length = br.read(12)
            g.big_values = br.read(9)
            g.global_gain = br.read(8)
            g.scalefac_compress = br.read(9 if h.lsf else 4)
            g.window_switching = br.read(1)
            if g.window_switching:
                g.block_type = br.read(2)
                g.mixed_block = br.read(1)
                g.table_select = [br.read(5), br.read(5), 0]
                g.subblock_gain = [br.read(3) for _ in range(3)]
                g.region0_count = 7   # implied under window switching:
                g.region1_count = 36  # region0 = 36 lines, region1 = rest
            else:
                g.block_type = 0
                g.mixed_block = 0
                g.table_select = [br.read(5), br.read(5), br.read(5)]
                g.subblock_gain = [0, 0, 0]
                g.region0_count = br.read(4)
                g.region1_count = br.read(3)
            g.preflag = 0 if h.lsf else br.read(1)
            g.scalefac_scale = br.read(1)
            g.count1table_select = br.read(1)
            chs.append(g)
        granules.append(chs)
    return main_data_begin, scfsi, granules


# LSF scalefactor partition sizes (ISO 13818-3 2.4.3.2): indexed by
# [partition class][block class][group], block class 0 = long, 1 = short,
# 2 = mixed. Groups are read with slen[0..3] respectively.
_NR_OF_SFB = (
    ((6, 5, 5, 5), (9, 9, 9, 9), (6, 9, 9, 9)),
    ((6, 5, 7, 3), (9, 9, 12, 6), (6, 9, 12, 6)),
    ((11, 10, 0, 0), (18, 18, 0, 0), (15, 18, 0, 0)),
    ((7, 7, 7, 0), (12, 12, 12, 0), (6, 15, 12, 0)),
    ((6, 6, 6, 3), (12, 9, 9, 6), (6, 12, 9, 6)),
    ((8, 8, 5, 0), (15, 12, 9, 0), (6, 18, 9, 0)),
)


def _lsf_slen(g, is_ch):
    """LSF decomposition of the 9-bit scalefac_compress: slen[4],
    partition class, preflag, intensity_scale (IS position channel)."""
    sc = g.scalefac_compress
    preflag = 0
    int_scale = 0
    if is_ch:
        int_scale = sc & 1
        sc >>= 1
        if sc < 180:
            slen = (sc // 36, (sc % 36) // 6, sc % 6, 0)
            bn = 3
        elif sc < 244:
            sc -= 180
            slen = ((sc & 63) >> 4, (sc & 15) >> 2, sc & 3, 0)
            bn = 4
        else:
            sc -= 244
            slen = (sc // 3, sc % 3, 0, 0)
            bn = 5
    else:
        if sc < 400:
            slen = ((sc >> 4) // 5, (sc >> 4) % 5, (sc & 15) >> 2, sc & 3)
            bn = 0
        elif sc < 500:
            sc -= 400
            slen = ((sc >> 2) // 5, (sc >> 2) % 5, sc & 3, 0)
            bn = 1
        else:
            sc -= 500
            slen = (sc // 3, sc % 3, 0, 0)
            bn = 2
            preflag = 1
    return slen, bn, preflag, int_scale


def _read_scalefactors_lsf(br, g, is_ch):
    """Returns (scf_l[22], scf_s[13][3], max_scf_l, max_scf_s): the max_*
    arrays carry each slot's (2^slen - 1) marker, the LSF illegal
    intensity position."""
    slen, bn, preflag, _int_scale = _lsf_slen(g, is_ch)
    g.preflag = preflag
    short = g.window_switching and g.block_type == 2
    cls = 2 if (short and g.mixed_block) else (1 if short else 0)
    counts = _NR_OF_SFB[bn][cls]
    vals = []
    maxes = []
    for i in range(4):
        for _ in range(counts[i]):
            vals.append(br.read(slen[i]))
            maxes.append((1 << slen[i]) - 1)
    scf_l = np.zeros(22, int)
    scf_s = np.zeros((13, 3), int)
    max_l = np.zeros(22, int)
    max_s = np.zeros((13, 3), int)
    if cls == 0:
        scf_l[:21] = vals
        max_l[:21] = maxes
    elif cls == 1:
        scf_s[:12] = np.array(vals).reshape(12, 3)
        max_s[:12] = np.array(maxes).reshape(12, 3)
    else:
        scf_l[:6] = vals[:6]
        max_l[:6] = maxes[:6]
        scf_s[3:12] = np.array(vals[6:]).reshape(9, 3)
        max_s[3:12] = np.array(maxes[6:]).reshape(9, 3)
    return scf_l, scf_s, max_l, max_s


def _read_scalefactors(br, g, sr_idx, scfsi_ch, prev):
    """Returns (scf_long[22], scf_short[13][3], part2_bits)."""
    slen1, slen2 = SLEN[g.scalefac_compress]
    scf_l = np.zeros(22, int)
    scf_s = np.zeros((13, 3), int)
    bits = 0
    if g.window_switching and g.block_type == 2:
        if g.mixed_block:
            for sfb in range(8):
                scf_l[sfb] = br.read(slen1)
                bits += slen1
            for sfb in range(3, 12):
                slen = slen1 if sfb < 6 else slen2
                for w in range(3):
                    scf_s[sfb, w] = br.read(slen)
                    bits += slen
        else:
            for sfb in range(12):
                slen = slen1 if sfb < 6 else slen2
                for w in range(3):
                    scf_s[sfb, w] = br.read(slen)
                    bits += slen
    else:
        groups = ((0, 6), (6, 11), (11, 16), (16, 21))
        for gi, (lo, hi) in enumerate(groups):
            if prev is not None and scfsi_ch[gi]:
                scf_l[lo:hi] = prev[0][lo:hi]
            else:
                slen = slen1 if gi < 2 else slen2
                for sfb in range(lo, hi):
                    scf_l[sfb] = br.read(slen)
                    bits += slen
    return scf_l, scf_s, bits


def _decode_huffman(br, g, sfb_l, end_bit, h=None):
    """Huffman-decode 576 spectral values (in coded order)."""
    xs = np.zeros(576)
    lsf = h is not None and h.lsf
    mpeg25 = h is not None and h.mpeg25
    if g.window_switching:
        # Implied regions under window switching (probe-pinned against
        # the reference decoder): MPEG-1 uses 36 lines; MPEG-2 LSF uses
        # 36 for short blocks and 54 for start/stop (types 1/3);
        # MPEG-2.5 derives them from the band table (sfb 6 for pure
        # short blocks, sfb 8 otherwise).
        if mpeg25:
            r0_end = sfb_l[6 if (g.block_type == 2
                                 and not g.mixed_block) else 8]
        elif lsf and g.block_type != 2:
            r0_end = 54
        else:
            r0_end = 36
        r1_end = 576
    else:
        sfb = sfb_l
        r0_end = sfb[min(g.region0_count + 1, 22)]
        r1_end = sfb[min(g.region0_count + 1 + g.region1_count + 1, 22)]
    bv_end = min(2 * g.big_values, 576)  # malformed big_values: clamp
    i = 0
    while i < bv_end:
        if br.overrun:
            break
        if i < r0_end:
            tsel = g.table_select[0]
        elif i < r1_end:
            tsel = g.table_select[1]
        else:
            tsel = g.table_select[2]
        linbits, table = BIG_VALUE_TABLES[tsel]
        if not table:
            i += 2
            continue
        node = _TREES_BV[tsel]
        while isinstance(node, dict):
            node = node[br.read(1)]
        x, y = node
        if x == 15 and linbits:
            x += br.read(linbits)
        if x and br.read(1):
            x = -x
        if y == 15 and linbits:
            y += br.read(linbits)
        if y and br.read(1):
            y = -y
        xs[i] = x
        if i + 1 < 576:
            xs[i + 1] = y
        i += 2
        if br.pos > end_bit:
            xs[i - 2:i] = 0
            break
    # count1 region
    ctree = _TREES_C1[g.count1table_select]
    while br.pos < end_bit and i + 3 < 576 and not br.overrun:
        mark = br.pos
        node = ctree
        while isinstance(node, dict):
            node = node[br.read(1)]
        vals = list(node)
        for j in range(4):
            if vals[j] and br.read(1):
                vals[j] = -vals[j]
        if br.pos > end_bit:
            br.pos = mark
            break
        xs[i:i + 4] = vals
        i += 4
    return xs


def _requantize(xs, g, sfb_l, sfb_s, scf_l, scf_s):
    """Coded-order values -> xr (reordered to subband-line order)."""
    mag = np.abs(xs) ** (4.0 / 3.0) * np.sign(xs)
    step = 0.5 * (1 + g.scalefac_scale)
    xr = np.zeros(576)
    short = g.window_switching and g.block_type == 2
    # mixed long part ends where short sfb 3 starts (36 lines everywhere
    # except 8 kHz LSF, whose wider bands make it 72)
    long_end = (3 * sfb_s[3] if (short and g.mixed_block)
                else (0 if short else 576))
    if long_end:
        gain = 2.0 ** ((g.global_gain - 210) / 4.0)
        exps = np.zeros(576)
        for sfb in range(22):
            lo, hi = sfb_l[sfb], sfb_l[sfb + 1]
            exps[lo:hi] = -step * (scf_l[sfb]
                                   + (PRETAB[sfb] if g.preflag else 0))
        n = long_end
        xr[:n] = mag[:n] * gain * 2.0 ** exps[:n]
    if short:
        start_sfb = 3 if g.mixed_block else 0
        pos = long_end
        for sfb in range(start_sfb, 13):
            width = sfb_s[sfb + 1] - sfb_s[sfb]
            for w in range(3):
                gain = 2.0 ** ((g.global_gain - 210
                                - 8 * g.subblock_gain[w]) / 4.0)
                s = scf_s[sfb, w] if sfb < 12 else 0
                scale = gain * 2.0 ** (-step * s)
                # reorder: dest[3*l + w] within the sfb triple-block
                # (3 * sfb_s[3] == 36 == long_end, so mixed lines up too)
                src = mag[pos:pos + width] * scale
                idx = 3 * sfb_s[sfb] + 3 * np.arange(width) + w
                xr[idx] = src
                pos += width
    return xr


def _alias_reduce(xr, n_boundaries):
    for sb in range(n_boundaries):
        lo = 18 * sb
        for j in range(8):
            a = xr[lo + 17 - j]
            b = xr[lo + 18 + j]
            xr[lo + 17 - j] = a * _CS[j] - b * _CA[j]
            xr[lo + 18 + j] = b * _CS[j] + a * _CA[j]
    return xr


def _imdct_granule(xr, g, overlap_ch, n_long_sb=2):
    """xr (576,) -> (18, 32) time x subband; updates overlap_ch in place.

    n_long_sb: subbands of the mixed long part (long_end/18; 2 everywhere
    except 8 kHz LSF's 4)."""
    out = np.zeros((18, 32))
    short = g.window_switching and g.block_type == 2
    for sb in range(32):
        X = xr[18 * sb:18 * sb + 18]
        is_short = short and not (g.mixed_block and sb < n_long_sb)
        if is_short:
            raw = np.zeros(36)
            for w in range(3):
                y = _IMDCT12 @ X[3 * np.arange(6) + w]
                raw[6 + 6 * w:18 + 6 * w] += y * _WIN["s"]
        else:
            bt = 0 if short else g.block_type  # mixed low subbands: long/0
            raw = (_IMDCT36 @ X) * _WIN[bt]
        out[:, sb] = raw[:18] + overlap_ch[sb]
        overlap_ch[sb] = raw[18:]
    # frequency inversion: odd subbands, odd time samples
    out[1::2, 1::2] *= -1.0
    return out


_TREES_BV = {}
_TREES_C1 = {}


def _rebuild_trees():
    _TREES_BV.clear()
    _TREES_C1.clear()
    for t, (_lb, tab) in BIG_VALUE_TABLES.items():
        if tab:
            _TREES_BV[t] = tree(tab)
    for t, tab in COUNT1_TABLES.items():
        _TREES_C1[t] = tree(tab)


_rebuild_trees()


def _decode_layer3(h, frame, br, state):
    from .mp3 import BitReader

    nch = h.channels
    sfb_l, sfb_s = _sfb_tables(h)
    n_gr = 1 if h.lsf else 2
    main_data_begin, scfsi, granules = _read_side_info(h, br)
    if br.overrun:
        return None  # frame too small for its side info: skip it
    side_bytes = (9 if nch == 1 else 17) if h.lsf else (17 if nch == 1
                                                        else 32)
    head = 4 + (2 if h.protection == 0 else 0) + side_bytes
    main = frame[head:]
    res_before = len(state.reservoir)
    state.reservoir.extend(main)
    start_byte = res_before - main_data_begin
    if start_byte < 0:
        # not enough reservoir (stream start / seek): granules undecodable
        _trim(state)
        return np.zeros((18 * n_gr, 32, nch))
    mbr = BitReader(bytes(state.reservoir), start_byte * 8)
    S = np.zeros((18 * n_gr, 32, nch))
    n_long_sb = (3 * sfb_s[3]) // 18
    prev_scf = [None] * nch
    for gri in range(n_gr):
        xr_ch = []
        cur_scf = []
        cur_max = []
        for ch in range(nch):
            g = granules[gri][ch]
            gstart = mbr.pos
            end_bit = gstart + g.part2_3_length
            if h.lsf:
                is_ch = ch == 1 and (h.mode == 1 and (h.mode_ext & 1))
                scf_l, scf_s, max_l, max_s = _read_scalefactors_lsf(
                    mbr, g, is_ch)
                cur_max.append((max_l, max_s))
            else:
                scf_l, scf_s, _bits = _read_scalefactors(
                    mbr, g, h.sr_idx, scfsi[ch],
                    prev_scf[ch] if gri == 1 else None)
                cur_max.append(None)
            if gri == 0:
                prev_scf[ch] = (scf_l, scf_s)
            cur_scf.append((scf_l, scf_s))
            xs = _decode_huffman(mbr, g, sfb_l, end_bit, h)
            mbr.pos = end_bit
            xr_ch.append(_requantize(xs, g, sfb_l, sfb_s, scf_l, scf_s))
        if nch == 2:
            xr_ch = _stereo(xr_ch, granules[gri], h, cur_scf, cur_max,
                            sfb_l, sfb_s)
        for ch in range(nch):
            g = granules[gri][ch]
            short = g.window_switching and g.block_type == 2
            nb = (n_long_sb - 1 if (short and g.mixed_block)
                  else (0 if short else 31))
            _alias_reduce(xr_ch[ch], nb)
            S[18 * gri:18 * gri + 18, :, ch] = _imdct_granule(
                xr_ch[ch], g, state.overlap[ch], n_long_sb)
    _trim(state)
    return S


# Intensity-stereo split factors: is_ratio = tan(is_pos * pi / 12);
# left' = xr * ratio/(1+ratio), right' = xr / (1+ratio). Position 6 is the
# exact all-left pole; position 7 is "illegal" (MS or passthrough instead).
# Semantics probe-pinned against mpg123 (tests/test_mp3.py intensity cases).
# Positions 8..15 are out-of-spec but encodable when slen > 3; the
# reference decoder applies its table's raw tan-law extension there, so
# the table runs to 16 entries (at the p=9 pole tan = -1 and the
# reference emits NaN; the float64 pole value here is equally garbage but
# finite).
_IS_TAN = np.tan(np.arange(16) * np.pi / 12.0)
_IS_LEFT = _IS_TAN / (1.0 + _IS_TAN)
_IS_RIGHT = 1.0 / (1.0 + _IS_TAN)
_IS_LEFT[6], _IS_RIGHT[6] = 1.0, 0.0  # exact all-left pole
_IS_LEFT[12], _IS_RIGHT[12] = 0.0, 1.0  # tan(pi) rounding


def _is_band_seq(g, sfb_l, sfb_s):
    """Intensity band layout of a granule as (window, lo, hi, sfb) tuples
    in spectral (reordered) order, where window < 0 marks long bands.
    Short-band slices are strided by 3 starting at lo + window."""
    short = g.window_switching and g.block_type == 2
    bands = []
    if not short or g.mixed_block:
        long_end = 3 * sfb_s[3] if short else 576
        for sfb in range(22):
            if sfb_l[sfb] >= long_end:
                break
            bands.append((-1, sfb_l[sfb], sfb_l[sfb + 1], sfb))
    if short:
        start = 3 if g.mixed_block else 0
        for sfb in range(start, 13):
            for w in range(3):
                bands.append((w, 3 * sfb_s[sfb], 3 * sfb_s[sfb + 1], sfb))
    return bands


def _band_slice(xr, band):
    w, lo, hi, _sfb = band
    if w < 0:
        return xr[lo:hi]
    return xr[lo + w:hi:3]


def _lsf_is_factors(is_pos, int_scale):
    """LSF intensity (ISO 13818-3 2.4.3.4): io^ceil(is_pos/2) applied to
    the left channel for odd positions, right for even; io = 2^-1/4
    (intensity_scale 0) or 2^-1/2 (1). Returns (left, right) factors."""
    if is_pos == 0:
        return 1.0, 1.0
    io = 2.0 ** (-0.25 * (1 + int_scale))
    k = io ** ((is_pos + 1) // 2)
    if is_pos % 2:
        return k, 1.0
    return 1.0, k


def _stereo(xr_ch, gr_chs, h, cur_scf, cur_max, sfb_l, sfb_s):
    """Joint-stereo processing: MS (mode_ext & 2) and intensity
    (mode_ext & 1), ISO 11172-3 2.4.3.4.9 / 13818-3 2.4.3.4. Intensity
    applies per scalefactor band (per window for short blocks) strictly
    above the right channel's last nonzero value; is_pos is the right
    channel's scalefactor in that band (the untransmitted last band
    inherits the previous band's position). The illegal position (7 for
    MPEG-1; the slot's all-ones value for LSF) falls back to MS when MS
    is on, else leaves the band untouched. MPEG-1 uses the tan law; LSF
    uses powers of 2^-1/4 or 2^-1/2 selected by intensity_scale."""
    if h.mode != 1 or h.mode_ext == 0:
        return xr_ch
    ms = bool(h.mode_ext & 2)
    intensity = bool(h.mode_ext & 1)
    m, s = xr_ch
    inv = 1.0 / np.sqrt(2.0)
    if not intensity:
        return [(m + s) * inv, (m - s) * inv] if ms else xr_ch
    g_r = gr_chs[1]
    scf_l_r, scf_s_r = cur_scf[1]
    if h.lsf:
        max_l_r, max_s_r = cur_max[1]
        _slen, _bn, _pre, int_scale = _lsf_slen(g_r, True)
    bands = _is_band_seq(g_r, sfb_l, sfb_s)
    # Last nonzero right-channel band per window (-1 = long "window").
    last_nz = {}
    for bi, band in enumerate(bands):
        if np.any(_band_slice(s, band) != 0.0):
            last_nz[band[0]] = bi
    # In mixed blocks a nonzero short part keeps the whole long part out
    # of the zero region (the zero part is a suffix of the spectrum).
    if g_r.window_switching and g_r.block_type == 2 and g_r.mixed_block:
        if any(w >= 0 for w in last_nz):
            last_nz[-1] = max(bi for bi, b in enumerate(bands)
                              if b[0] == -1)
    left = m.copy()
    right = s.copy()
    for bi, band in enumerate(bands):
        w, lo, hi, sfb = band
        if bi <= last_nz.get(w, -1):
            if ms:
                mm = _band_slice(m, band)
                ss = _band_slice(s, band)
                _band_slice(left, band)[:] = (mm + ss) * inv
                _band_slice(right, band)[:] = (mm - ss) * inv
            continue
        if w < 0:
            is_pos = int(scf_l_r[min(sfb, 20)])
            illegal = (int(max_l_r[min(sfb, 20)]) if h.lsf else 7)
        else:
            is_pos = int(scf_s_r[min(sfb, 11), w])
            illegal = (int(max_s_r[min(sfb, 11), w]) if h.lsf else 7)
        mm = _band_slice(m, band)
        if is_pos == illegal:
            if ms:
                ss = _band_slice(s, band)
                _band_slice(left, band)[:] = (mm + ss) * inv
                _band_slice(right, band)[:] = (mm - ss) * inv
            continue
        if h.lsf:
            kl, kr = _lsf_is_factors(is_pos, int_scale)
        else:
            kl, kr = _IS_LEFT[is_pos], _IS_RIGHT[is_pos]
        _band_slice(left, band)[:] = mm * kl
        _band_slice(right, band)[:] = mm * kr
    return [left, right]


def _trim(state):
    if len(state.reservoir) > Layer3State.MAX_RESERVOIR:
        drop = len(state.reservoir) - Layer3State.MAX_RESERVOIR
        del state.reservoir[:drop]
