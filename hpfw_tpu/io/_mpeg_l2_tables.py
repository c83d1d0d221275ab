"""MPEG-1 Layer II bit-allocation tables (ISO/IEC 11172-3 Tables B.2a-d).

Each allocation table maps subband -> (nbal, allowed quantization classes);
an allocation code a in [1, 2^nbal - 1] selects classes[a - 1]; 0 = silent.
Classes are identified by their level count n; requantization is the
midtread closed form s'' = (2 c + 1 - n) / n, and n in {3, 5, 9} uses
grouped 3-sample codes (ISO Table B.4).

Every (table, subband, allocation code) combination is validated against
the system reference decoder when present (tests/test_mp3.py composes a
frame exercising it and compares PCM), so a wrong row here cannot survive.
"""

from __future__ import annotations

# n-levels -> (bits per code, grouped)
QCLASS = {
    3: (5, True), 5: (7, True), 7: (3, False), 9: (10, True),
    15: (4, False), 31: (5, False), 63: (6, False), 127: (7, False),
    255: (8, False), 511: (9, False), 1023: (10, False), 2047: (11, False),
    4095: (12, False), 8191: (13, False), 16383: (14, False),
    32767: (15, False), 65535: (16, False),
}

_HI = (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383,
       32767, 65535)
_MID = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
        65535)
_LOW = (3, 5, 7, 9, 15, 31, 65535)
_TINY = (3, 5, 65535)
_LBR_HI = (3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
           16383, 32767)
_LBR_LOW = (3, 5, 9, 15, 31, 63, 127)


def _table_a(sblimit):
    rows = []
    for sb in range(sblimit):
        if sb < 3:
            rows.append((4, _HI))
        elif sb < 11:
            rows.append((4, _MID))
        elif sb < 23:
            rows.append((3, _LOW))
        else:
            rows.append((2, _TINY))
    return rows


def _table_lbr(sblimit):
    rows = []
    for sb in range(sblimit):
        rows.append((4, _LBR_HI) if sb < 2 else (3, _LBR_LOW))
    return rows


_LSF_HI = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
           16383)


def _table_lsf():
    """ISO 13818-3 Table B.1: the single MPEG-2 LSF Layer II allocation
    table (sblimit 30). Class lists recovered by candidate sweep against
    the reference decoder over twolame streams (only this combination
    reaches the float32 floor) and certified exhaustively per
    (subband, allocation) in tests/test_mp3.py."""
    rows = []
    for sb in range(30):
        if sb < 4:
            rows.append((4, _LSF_HI))
        elif sb < 11:
            rows.append((3, _LBR_LOW))
        else:
            rows.append((2, (3, 5, 9)))
    return rows


# id 0..3 = ISO Tables B.2a (27), B.2b (30), B.2c (8), B.2d (12);
# id 4 = the MPEG-2 LSF table (13818-3 B.1)
ALLOC_TABLES = (
    _table_a(27),
    _table_a(30),
    _table_lbr(8),
    _table_lbr(12),
    _table_lsf(),
)
LSF_TABLE = 4

# Allocation-table selection by (header sr index, mono?, bitrate index):
# ISO 2.4.2.3's bitrate-per-channel rule expressed directly over header
# fields. 48 kHz never uses B.2b; 32 kHz uses B.2d at 32-48 kbps/ch.
_TRANSLATE = (
    # 44100: stereo, mono
    ((0, 2, 2, 2, 2, 2, 2, 0, 0, 0, 1, 1, 1, 1, 1, 0),
     (0, 2, 2, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0)),
    # 48000
    ((0, 2, 2, 2, 2, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0),
     (0, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)),
    # 32000
    ((0, 3, 3, 3, 3, 3, 3, 0, 0, 0, 1, 1, 1, 1, 1, 0),
     (0, 3, 3, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0)),
)


def select_table(sr_idx: int, mono: bool, bitrate_idx: int) -> int:
    return _TRANSLATE[sr_idx][1 if mono else 0][bitrate_idx]
