"""MPEG-1 Layer II frame decoding (ISO/IEC 11172-3 2.4.3.3).

One frame carries 1152 PCM samples = 36 per subband = 12 granules of 3.
Requantization uses the single midtread closed form s'' = (2c + 1 - n)/n
(equivalent to the spec's Table B.4 C/D constants for every class, and to
the Layer I formula when n = 2^nb - 1); classes with n in {3, 5, 9} read
one grouped code per granule carrying three base-n digits.
"""

from __future__ import annotations

import numpy as np

from ._mpeg_l2_tables import ALLOC_TABLES, LSF_TABLE, QCLASS, select_table

# Scalefactor index sets per scfsi value, per 12-sample part (0, 1, 2):
# value -> (number transmitted, part -> transmitted slot)
SCFSI_MAP = {
    0: (3, (0, 1, 2)),
    1: (2, (0, 0, 1)),
    2: (1, (0, 0, 0)),
    3: (2, (0, 1, 1)),
}


def _requant(code: int, n: int) -> float:
    return (2 * code + 1 - n) / n


def _decode_layer2(h, br):
    from .mp3 import SCALEFACTORS  # late import avoids a cycle

    nch = h.channels
    table = ALLOC_TABLES[LSF_TABLE if h.lsf else
                         select_table(h.sr_idx, nch == 1, h.bitrate_idx)]
    sblimit = len(table)
    bound = min((h.mode_ext + 1) * 4, sblimit) if h.mode == 1 else sblimit

    alloc = np.zeros((sblimit, nch), int)
    for sb in range(sblimit):
        nbal = table[sb][0]
        if sb < bound:
            for ch in range(nch):
                alloc[sb, ch] = br.read(nbal)
        else:
            alloc[sb, :] = br.read(nbal)
    scfsi = np.zeros((sblimit, nch), int)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[sb, ch]:
                scfsi[sb, ch] = br.read(2)
    scf = np.zeros((sblimit, nch, 3))
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[sb, ch]:
                count, part_map = SCFSI_MAP[scfsi[sb, ch]]
                got = [br.read(6) for _ in range(count)]
                for part in range(3):
                    scf[sb, ch, part] = SCALEFACTORS[got[part_map[part]]]

    out = np.zeros((36, 32, nch))
    for gr in range(12):
        part = gr >> 2
        for sb in range(sblimit):
            shared = sb >= bound
            for ch in range(1 if shared else nch):
                a = alloc[sb, ch]
                if not a:
                    continue
                n = table[sb][1][a - 1]
                bits, grouped = QCLASS[n]
                if grouped:
                    c = br.read(bits)
                    vals = (c % n, (c // n) % n, c // (n * n))
                else:
                    vals = (br.read(bits), br.read(bits), br.read(bits))
                raw = [_requant(v, n) for v in vals]
                targets = range(nch) if shared else (ch,)
                for tch in targets:
                    for i, r in enumerate(raw):
                        out[3 * gr + i, sb, tch] = r * scf[sb, tch, part]
    return out
