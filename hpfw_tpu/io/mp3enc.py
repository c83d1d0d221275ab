"""In-repo MPEG-1 audio bitstream composers (fixture generators).

Frame composers for MPEG-1 audio (ISO/IEC 11172-3) used to build
spec-valid test fixtures offline, mirroring the FLAC/Vorbis strategy
(`io/flac.py` encoder, `io/vorbis.py` encoder): the decoder under test is
`hpfw_tpu.io.mp3`; these composers give tests exact control over every
field so each decode path can be exercised deterministically, and —
where system libmpg123 is present — every composed stream can also be
decoded by a real reference decoder and compared.

Layer I composer: direct control of allocation/scalefactor/sample codes
(no psychoacoustics — fixtures need exactness, not compression quality).
Layer II and Layer III composers follow the same raw-field philosophy.

Reference parity: the C++ reference takes decoded PCM from a system audio
library (SURVEY.md §2.1 row 1); fixtures there are real audio files. In
this offline environment fixtures are composed from spec instead.
"""

from __future__ import annotations

import numpy as np

# MPEG-1 bitrate tables, kbps, index 1..14 (0 = free, 15 = forbidden).
BITRATES_L1 = (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
               416, 448)
BITRATES_L2 = (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
               320, 384)
BITRATES_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320)
SAMPLE_RATES = (44100, 48000, 32000)  # header sampling_frequency index 0..2


class BitWriter:
    """MSB-first bit accumulator."""

    def __init__(self):
        self._bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        assert 0 <= value < (1 << n), (value, n)
        for i in range(n - 1, -1, -1):
            self._bits.append((value >> i) & 1)

    def pad_to_bytes(self, total_bytes: int) -> None:
        want = total_bytes * 8
        assert len(self._bits) <= want, (len(self._bits), want)
        self._bits.extend([0] * (want - len(self._bits)))

    def bytes(self) -> bytes:
        assert len(self._bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            b = 0
            for bit in self._bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def frame_header(layer: int, bitrate_idx: int, sr_idx: int, *,
                 mode: int = 3, padding: int = 0, mode_ext: int = 0) -> int:
    """32-bit MPEG-1 frame header. mode 3 = single channel."""
    assert layer in (1, 2, 3)
    layer_bits = {1: 0b11, 2: 0b10, 3: 0b01}[layer]
    h = 0x7FF
    h = (h << 2) | 0b11          # MPEG-1
    h = (h << 2) | layer_bits
    h = (h << 1) | 1             # protection_bit=1: no CRC
    h = (h << 4) | bitrate_idx
    h = (h << 2) | sr_idx
    h = (h << 1) | padding
    h = (h << 1) | 0             # private
    h = (h << 2) | mode
    h = (h << 2) | mode_ext
    h = (h << 1) | 0             # copyright
    h = (h << 1) | 0             # original
    h = (h << 2) | 0             # emphasis
    return h


def layer1_frame_mono(codes: np.ndarray, alloc: np.ndarray,
                      scf: np.ndarray, *, bitrate_idx: int = 14,
                      sr_idx: int = 1) -> bytes:
    """Compose one MPEG-1 Layer I mono frame (384 samples).

    codes: (12, 32) unsigned sample codes (only allocated subbands read);
    alloc: (32,) allocation codes (0 = silent, 1..14 -> nb = code+1 bits);
    scf:   (32,) scalefactor indices 0..62 (only allocated subbands read).
    """
    codes = np.asarray(codes)
    alloc = np.asarray(alloc)
    scf = np.asarray(scf)
    assert codes.shape == (12, 32) and alloc.shape == (32,)
    sr = SAMPLE_RATES[sr_idx]
    kbps = BITRATES_L1[bitrate_idx]
    slots = (12 * kbps * 1000) // sr  # 4-byte slots
    assert 12 * kbps * 1000 % sr == 0, "pick sr/bitrate with no padding"
    nbytes = slots * 4
    w = BitWriter()
    w.write(frame_header(1, bitrate_idx, sr_idx), 32)
    for sb in range(32):
        a = int(alloc[sb])
        assert 0 <= a <= 14
        w.write(a, 4)
    for sb in range(32):
        if alloc[sb]:
            w.write(int(scf[sb]), 6)
    for s in range(12):
        for sb in range(32):
            a = int(alloc[sb])
            if a:
                nb = a + 1
                w.write(int(codes[s, sb]), nb)
    w.pad_to_bytes(nbytes)
    return w.bytes()


def layer2_frame(digits: np.ndarray, alloc: np.ndarray, scfsi: np.ndarray,
                 scf: np.ndarray, *, bitrate_idx: int, sr_idx: int = 1,
                 mode: int = 3, mode_ext: int = 0) -> bytes:
    """Compose one MPEG-1 Layer II frame (1152 samples).

    digits: (36, sblimit, nch) per-sample quantization digits in [0, n)
            (grouped classes are packed into base-n triplet codes here);
    alloc:  (sblimit, nch) allocation codes (for joint stereo, subbands
            >= bound read channel 0);
    scfsi:  (sblimit, nch) scalefactor-selection codes 0..3;
    scf:    (sblimit, nch, 3) scalefactor indices per part (slots beyond
            the scfsi-transmitted count are ignored).
    """
    from ._mpeg_l2_tables import ALLOC_TABLES, QCLASS, select_table
    from ._mp3_layer2 import SCFSI_MAP

    nch = 1 if mode == 3 else 2
    table = ALLOC_TABLES[select_table(sr_idx, nch == 1, bitrate_idx)]
    sblimit = len(table)
    bound = min((mode_ext + 1) * 4, sblimit) if mode == 1 else sblimit
    assert digits.shape == (36, sblimit, nch)
    sr = SAMPLE_RATES[sr_idx]
    kbps = BITRATES_L2[bitrate_idx]
    nbytes = 144 * kbps * 1000 // sr  # padding=0: floor frame size
    w = BitWriter()
    w.write(frame_header(2, bitrate_idx, sr_idx, mode=mode,
                         mode_ext=mode_ext), 32)
    for sb in range(sblimit):
        nbal = table[sb][0]
        for ch in range(1 if sb >= bound else nch):
            a = int(alloc[sb, ch])
            assert a < (1 << nbal)
            w.write(a, nbal)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[sb, ch]:
                w.write(int(scfsi[sb, ch]), 2)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[sb, ch]:
                count, _ = SCFSI_MAP[int(scfsi[sb, ch])]
                for slot in range(count):
                    w.write(int(scf[sb, ch, slot]), 6)
    for gr in range(12):
        for sb in range(sblimit):
            shared = sb >= bound
            for ch in range(1 if shared else nch):
                a = int(alloc[sb, ch])
                if not a:
                    continue
                n = table[sb][1][a - 1]
                bits, grouped = QCLASS[n]
                v = digits[3 * gr:3 * gr + 3, sb, ch]
                assert np.all((v >= 0) & (v < n)), (sb, n, v)
                if grouped:
                    w.write(int(v[0] + n * v[1] + n * n * v[2]), bits)
                else:
                    for i in range(3):
                        w.write(int(v[i]), bits)
    w.pad_to_bytes(nbytes)
    return w.bytes()


def _default_granule() -> dict:
    return dict(big_values=0, global_gain=210, scalefac_compress=0,
                window_switching=0, block_type=0, mixed_block=0,
                table_select=(0, 0, 0), subblock_gain=(0, 0, 0),
                region0_count=0, region1_count=0, preflag=0,
                scalefac_scale=0, count1table_select=0,
                scf_bits=(), huff_bits="")


def layer3_side(granules, w: BitWriter, *, bitrate_idx: int = 13,
                sr_idx: int = 1, mode: int = 3, mode_ext: int = 0,
                main_data_begin: int = 0, scfsi=None) -> None:
    """Write the header + side info of one Layer III frame into `w`."""
    nch = 1 if mode == 3 else 2
    if scfsi is None:
        scfsi = [[0] * 4 for _ in range(nch)]
    w.write(frame_header(3, bitrate_idx, sr_idx, mode=mode,
                         mode_ext=mode_ext), 32)
    w.write(main_data_begin, 9)
    w.write(0, 5 if nch == 1 else 3)
    for ch in range(nch):
        for b in scfsi[ch]:
            w.write(b, 1)
    for gr in range(2):
        for ch in range(nch):
            g = dict(_default_granule(), **granules[gr][ch])
            part2_3 = sum(nb for _v, nb in g["scf_bits"]) \
                + len(g["huff_bits"])
            w.write(part2_3, 12)
            w.write(g["big_values"], 9)
            w.write(g["global_gain"], 8)
            w.write(g["scalefac_compress"], 4)
            w.write(g["window_switching"], 1)
            if g["window_switching"]:
                w.write(g["block_type"], 2)
                w.write(g["mixed_block"], 1)
                for r in range(2):
                    w.write(g["table_select"][r], 5)
                for sw in range(3):
                    w.write(g["subblock_gain"][sw], 3)
            else:
                for r in range(3):
                    w.write(g["table_select"][r], 5)
                w.write(g["region0_count"], 4)
                w.write(g["region1_count"], 3)
            w.write(g["preflag"], 1)
            w.write(g["scalefac_scale"], 1)
            w.write(g["count1table_select"], 1)


def layer3_main_bits(granules, mode: int = 3) -> "BitWriter":
    """Write the main-data bits (scalefactors + Huffman) of a frame."""
    nch = 1 if mode == 3 else 2
    w = BitWriter()
    for gr in range(2):
        for ch in range(nch):
            g = dict(_default_granule(), **granules[gr][ch])
            for v, nb in g["scf_bits"]:
                w.write(int(v), nb)
            for bit in g["huff_bits"]:
                w.write(int(bit), 1)
    return w


def layer3_frame(granules, *, bitrate_idx: int = 13, sr_idx: int = 1,
                 mode: int = 3, mode_ext: int = 0, scfsi=None) -> bytes:
    """Compose one self-contained MPEG-1 Layer III frame.

    granules: [gr][ch] dicts (see _default_granule); `scf_bits` is a
    sequence of (value, nbits) written verbatim as the scalefactor part,
    `huff_bits` a '0'/'1' string written verbatim as the Huffman part —
    part2_3_length is their sum, so probes control the spectrum bit
    layout exactly. main_data_begin = 0: all main data in-frame; use
    layer3_side/layer3_main_bits directly for bit-reservoir layouts.
    """
    sr = SAMPLE_RATES[sr_idx]
    kbps = BITRATES_L3[bitrate_idx]
    nbytes = 144 * kbps * 1000 // sr
    w = BitWriter()
    layer3_side(granules, w, bitrate_idx=bitrate_idx, sr_idx=sr_idx,
                mode=mode, mode_ext=mode_ext, scfsi=scfsi)
    mw = layer3_main_bits(granules, mode)
    for bit in mw._bits:
        w._bits.append(bit)
    w.pad_to_bytes(nbytes)
    return w.bytes()
