"""FLAC decode (pure NumPy/Python) + a minimal encoder for fixtures.

The reference wraps a native audio library that reads the common lossless
formats (SURVEY.md §2.1 row 1). This module implements the FLAC bitstream
from the format spec: STREAMINFO parsing, frame headers (all block-size /
sample-rate / sample-size codes), CONSTANT / VERBATIM / FIXED(0-4) /
LPC(1-32) subframes, Rice and Rice2 residual partitions with escape codes,
wasted bits, and the four channel assignments (independent, left/side,
right/side, mid/side). Frame CRC-16s are verified.

A fast C++ twin lives in native/hpfw_native.cc (hpfw_flac_decode) — this
NumPy path is its correctness oracle (tests/test_flac.py asserts
bit-identical sample output) and the always-available fallback.

No FLAC tooling exists in this offline environment, so fixtures come from
`encode_flac` below — a real (if simple) FLAC encoder: fixed-blocksize
frames, CONSTANT/VERBATIM/FIXED subframes with Rice partitions, all four
stereo decorrelation modes, correct CRC-8/CRC-16. Its output round-trips
through both decoders and is byte-level standard FLAC.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}

_BLOCKSIZE_CODE = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                   **{n: 256 << (n - 8) for n in range(8, 16)}}
_SAMPLE_RATE_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                     6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                     11: 96000}
_SAMPLE_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class _BitReader:
    """MSB-first bit reader with O(log n) unary reads.

    Bits are pre-expanded once per stream (np.unpackbits) and one-positions
    indexed, so Rice unary quotients are a searchsorted, not a scan.
    """

    def __init__(self, data: bytes, start_byte: int = 0):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = start_byte * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        b = self.bits[self.pos:self.pos + n]
        if b.shape[0] < n:
            raise ValueError("FLAC bitstream truncated")
        self.pos += n
        v = 0
        for bit in b.tolist():
            v = (v << 1) | bit
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        i = np.searchsorted(self.ones, self.pos)
        if i >= self.ones.shape[0]:
            raise ValueError("FLAC bitstream truncated in unary code")
        one = int(self.ones[i])
        q = one - self.pos
        self.pos = one + 1
        return q

    def read_rice_block(self, count: int, param: int) -> np.ndarray:
        """Vectorized block of `count` Rice codes with parameter `param`."""
        out = np.empty(count, dtype=np.int64)
        for k in range(count):
            q = self.read_unary()
            r = self.read(param) if param else 0
            v = (q << param) | r
            out[k] = (v >> 1) ^ -(v & 1)
        return out

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16_table():
    t = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        crc = i << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        t[i] = crc
    return t


_CRC16 = _crc16_table()


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ int(_CRC16[(crc >> 8) ^ b])
    return crc


def _read_utf8_number(br: _BitReader) -> int:
    """FLAC's UTF-8-style coded number (frame/sample index, up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_extra = 0
    mask = 0x40
    while b0 & mask:
        n_extra += 1
        mask >>= 1
    if n_extra == 0 or n_extra > 6:
        raise ValueError("invalid FLAC UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(n_extra):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _decode_residual(br: _BitReader, blocksize: int, pred_order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_part = 1 << porder
    if blocksize % n_part:
        raise ValueError("FLAC partition order does not divide block size")
    res = np.empty(blocksize - pred_order, dtype=np.int64)
    filled = 0
    for p in range(n_part):
        count = blocksize >> porder
        if p == 0:
            count -= pred_order
        param = br.read(pbits)
        if param == escape:
            raw_bits = br.read(5)
            vals = np.empty(count, dtype=np.int64)
            for k in range(count):
                vals[k] = br.read_signed(raw_bits) if raw_bits else 0
            res[filled:filled + count] = vals
        else:
            res[filled:filled + count] = br.read_rice_block(count, param)
        filled += count
    return res


def _predict_fixed(order: int, warmup: np.ndarray, res: np.ndarray) -> np.ndarray:
    """Fixed predictors are k-fold integer integration — exact via cumsum."""
    x = res.copy()
    w = warmup.astype(np.int64)
    for k in range(order, 0, -1):
        # Integrate once: d^(k-1)[i] = d^k[i] + d^(k-1)[i-1], seeded by the
        # (k-1)-th difference of the warmup's tail.
        seed = np.diff(w, n=k - 1)[-1] if k > 1 else w[-1]
        x = np.cumsum(x) + seed if x.size else x
    return np.concatenate([w, x]) if order else x


def _predict_lpc(warmup: np.ndarray, coefs: list[int], shift: int,
                 res: np.ndarray) -> np.ndarray:
    order = len(coefs)
    out = np.empty(order + res.shape[0], dtype=np.int64)
    out[:order] = warmup
    o = out.tolist()
    c = coefs
    for i in range(res.shape[0]):
        p = 0
        base = order + i
        for j in range(order):
            p += c[j] * o[base - 1 - j]
        v = int(res[i]) + (p >> shift)
        o[base] = v
    return np.asarray(o, dtype=np.int64)


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("invalid FLAC subframe padding bit")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if ftype == 0:                       # CONSTANT
        v = br.read_signed(eff)
        out = np.full(blocksize, v, dtype=np.int64)
    elif ftype == 1:                     # VERBATIM
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(blocksize):
            out[i] = br.read_signed(eff)
    elif 8 <= ftype <= 12:               # FIXED order 0-4
        order = ftype - 8
        warmup = np.array([br.read_signed(eff) for _ in range(order)],
                          dtype=np.int64)
        res = _decode_residual(br, blocksize, order)
        out = _predict_fixed(order, warmup, res)
    elif ftype >= 32:                    # LPC order 1-32
        order = (ftype & 31) + 1
        warmup = np.array([br.read_signed(eff) for _ in range(order)],
                          dtype=np.int64)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        out = _predict_lpc(warmup, coefs, shift, res)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    return out << wasted


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (mono float32 PCM in [-1, 1], sample_rate)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC file")
    pos = 4
    sr = n_ch = bps = 0
    total = -1
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype = hdr & 0x7F
        size = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + size]
        if btype == 0:                   # STREAMINFO
            sr = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            n_ch = ((body[12] >> 1) & 7) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0xF) << 32) | int.from_bytes(body[14:18], "big")
            if total == 0:
                # STREAMINFO total_samples == 0 means "unknown" per the FLAC
                # spec (common in streamed/piped encodes) — decode until the
                # bitstream ends rather than returning an empty stream.
                total = -1
        pos += 4 + size
        if hdr & 0x80:
            break
    if sr <= 0 or n_ch <= 0:
        raise ValueError("FLAC stream missing STREAMINFO")

    br = _BitReader(data, pos)
    chans = [[] for _ in range(n_ch)]
    n_bits = br.bits.shape[0]
    while br.pos + 40 <= n_bits:
        frame_start = br.byte_pos()
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        br.read(1)                       # reserved
        br.read(1)                       # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)                       # reserved
        _read_utf8_number(br)
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_CODE:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        else:
            raise ValueError(f"reserved FLAC block size code {bs_code}")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        if ss_code == 0:
            frame_bps = bps
        elif ss_code not in _SAMPLE_SIZE_CODE:
            # code 3 is reserved; reject like the C++ twin instead of
            # silently falling back to the STREAMINFO bps.
            raise ValueError(f"reserved FLAC sample size code {ss_code}")
        else:
            frame_bps = _SAMPLE_SIZE_CODE[ss_code]
        crc8_pos = br.byte_pos()
        br.read(8)                       # header CRC-8 (covered by CRC-16)
        if _crc8(data[frame_start:crc8_pos]) != data[crc8_pos]:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise ValueError("FLAC frame channel count mismatch")
            sub = [_decode_subframe(br, blocksize, frame_bps)
                   for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            left_bps = frame_bps + (1 if ch_code == 9 else 0)
            right_bps = frame_bps + (1 if ch_code in (8, 10) else 0)
            a = _decode_subframe(br, blocksize, left_bps)
            b = _decode_subframe(br, blocksize, right_bps)
            if ch_code == 8:             # left/side
                sub = [a, a - b]
            elif ch_code == 9:           # right/side
                sub = [b + a, b]
            else:                        # mid/side
                mid = (a << 1) | (b & 1)
                sub = [(mid + b) >> 1, (mid - b) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        br.align()
        crc_end = br.byte_pos()
        if br.read(16) != _crc16(data[frame_start:crc_end]):
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(n_ch):
            chans[c].append(sub[c])
        if total >= 0 and sum(x.shape[0] for x in chans[0]) >= total:
            break

    full = [np.concatenate(c) if c else np.zeros(0, np.int64) for c in chans]
    if total >= 0:
        full = [f[:total] for f in full]
    scale = float(1 << (bps - 1))
    mono = np.mean(np.stack(full, axis=1), axis=1) if n_ch > 1 else full[0]
    return (mono / scale).astype(np.float32), sr


# ---------------------------------------------------------------------------
# Minimal FLAC encoder (fixture generation; real, spec-conforming output).
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


def _write_utf8_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    tails = []
    nbits = v.bit_length()
    n_extra = 1
    while nbits > 6 * n_extra + (6 - n_extra):
        n_extra += 1
    for _ in range(n_extra):
        tails.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = ((0xFF << (7 - n_extra)) & 0xFF) | v
    bw.write(lead, 8)
    for t in reversed(tails):
        bw.write(t, 8)


def _best_rice_param(res: np.ndarray, pbits: int) -> int:
    if res.size == 0:
        return 0
    zig = (np.abs(res.astype(np.int64)) * 2).astype(np.float64)
    mean = max(zig.mean(), 1.0)
    p = max(0, int(np.floor(np.log2(mean))))
    return min(p, (1 << pbits) - 2)


def _encode_residual(bw: _BitWriter, res: np.ndarray, order: int,
                     porder: int, escape_bits: int | None) -> None:
    bw.write(0, 2)                       # Rice method (4-bit params)
    bw.write(porder, 4)
    n_part = 1 << porder
    bs = res.shape[0] + order
    # Partition 0 loses the predictor order; caller guarantees divisibility.
    counts = np.full(n_part, bs >> porder, dtype=np.int64)
    counts[0] -= order
    splits = np.cumsum(counts)[:-1]
    for part in np.split(res, splits):
        if escape_bits is not None:
            bw.write(15, 4)
            bw.write(escape_bits, 5)
            for v in part.tolist():
                bw.write(int(v), escape_bits)
            continue
        param = _best_rice_param(part, 4)
        bw.write(param, 4)
        for v in part.tolist():
            u = (abs(int(v)) << 1) - (1 if v < 0 else 0)   # zigzag
            bw.write_unary(u >> param)
            bw.write(u & ((1 << param) - 1), param)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int, *,
                     mode: str = "fixed", order: int = 2,
                     escape_bits: int | None = None,
                     porder: int = 0, wasted: int = 0) -> None:
    bw.write(0, 1)
    if wasted:
        assert mode == "verbatim"
        x = x >> wasted
    eff = bps - wasted
    if mode == "constant":
        bw.write(0, 6)
        bw.write(1 if wasted else 0, 1)
        if wasted:
            bw.write_unary(wasted - 1)
        bw.write(int(x[0]), eff)
        return
    if mode == "verbatim":
        bw.write(1, 6)
        bw.write(1 if wasted else 0, 1)
        if wasted:
            bw.write_unary(wasted - 1)
        for v in x.tolist():
            bw.write(int(v), eff)
        return
    assert mode == "fixed" and 0 <= order <= 4
    if x.shape[0] <= order:
        order = 0
    bw.write(8 + order, 6)
    bw.write(0, 1)
    res = x.astype(np.int64)
    for _ in range(order):
        res = np.diff(res)
    for v in x[:order].tolist():
        bw.write(int(v), eff)
    if ((x.shape[0] >> porder) << porder) != x.shape[0] or \
            (x.shape[0] >> porder) <= order:
        porder = 0
    _encode_residual(bw, res, order, porder, escape_bits)


def encode_flac(pcm: np.ndarray, sample_rate: int, *, bps: int = 16,
                blocksize: int = 4096, mode: str = "fixed", order: int = 2,
                channel_mode: str = "auto", escape_bits: int | None = None,
                porder: int = 0, wasted: int = 0) -> bytes:
    """Encode float PCM (mono (N,) or stereo (N, 2)) as a FLAC stream.

    mode: 'constant' | 'verbatim' | 'fixed'; channel_mode for stereo input:
    'independent' | 'left_side' | 'right_side' | 'mid_side' | 'auto'.
    """
    x = np.asarray(pcm, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, n_ch = x.shape
    assert n_ch in (1, 2)
    scale = float(1 << (bps - 1))
    ints = np.clip(np.round(x * scale), -scale, scale - 1).astype(np.int64)
    if wasted:
        ints = (ints >> wasted) << wasted

    out = bytearray(b"fLaC")
    si = bytearray(34)
    si[0:2] = struct.pack(">H", blocksize)
    si[2:4] = struct.pack(">H", blocksize)
    si[10] = (sample_rate >> 12) & 0xFF
    si[11] = (sample_rate >> 4) & 0xFF
    si[12] = ((sample_rate & 0xF) << 4) | ((n_ch - 1) << 1) | ((bps - 1) >> 4)
    si[13] = (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF)
    si[14:18] = struct.pack(">I", n & 0xFFFFFFFF)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    ch_modes = {"independent": (1, (0, 0)), "left_side": (8, (0, 1)),
                "right_side": (9, (1, 0)), "mid_side": (10, (0, 1))}
    for fi, start in enumerate(range(0, n, blocksize)):
        blk = ints[start:start + blocksize]
        bs = blk.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)                   # fixed-blocksize stream
        bw.write(7, 4)                   # 16-bit block size - 1 follows
        bw.write(0, 4)                   # sample rate from STREAMINFO
        cm = channel_mode if n_ch == 2 else "independent"
        if cm == "auto":
            cm = "independent"
        ch_code, extra = (ch_modes[cm] if n_ch == 2 else (0, (0,)))
        bw.write(ch_code, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)
        _write_utf8_number(bw, fi)
        bw.write(bs - 1, 16)
        assert bw.nacc == 0  # header fields sum to whole bytes by design
        # CRC-8 over the header bytes from the sync code up to here.
        bw.write(_crc8(bytes(bw.buf)), 8)
        if n_ch == 1:
            subs = [(blk[:, 0], bps)]
        elif ch_code == 1:
            subs = [(blk[:, 0], bps), (blk[:, 1], bps)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if ch_code == 8:
                subs = [(left, bps), (side, bps + 1)]
            elif ch_code == 9:
                subs = [(side, bps + 1), (right, bps)]
            else:
                mid = (left + right) >> 1
                subs = [(mid, bps), (side, bps + 1)]
        for s, sbps in subs:
            _encode_subframe(bw, s, sbps, mode=mode, order=order,
                             escape_bits=escape_bits, porder=porder,
                             wasted=wasted)
        bw.align()
        body = bw.bytes()
        out += body + struct.pack(">H", _crc16(body))
    return bytes(out)
