"""From-spec MPEG audio decoder: Layers I, II, III; MPEG-1 (ISO/IEC
11172-3), MPEG-2 LSF (ISO/IEC 13818-3), and MPEG-2.5 (quarter rates) —
every sample rate from 8 to 48 kHz, free-format streams included.

Standalone NumPy decoder — no system codec library is touched. The
constants that the offline environment could not read from the spec text
were recovered exactly from the system reference decoder by linear probing
(tools/recover_mpeg_window.py -> io/_mpeg_window.py) and are validated
against libmpg123 in tests/test_mp3.py whenever that library is present;
the in-repo composers (io/mp3enc.py) keep those tests runnable offline.

Decode pipeline per frame:
  header -> [layer-specific bit allocation / side info + Huffman]
         -> requantized subband samples (32 bands)
         -> polyphase synthesis filterbank (matrixing + 512-tap window)

Reference parity: the C++ reference wraps a system audio library for
lossy decode (SURVEY.md §2.1 row 1 — mount empty, recollection); this
rebuild implements the codec from spec with NumPy + C++ twins, like
io/flac.py and io/vorbis.py.
"""

from __future__ import annotations

import numpy as np

from ._mpeg_window import SYNTH_WINDOW

BITRATES = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
# MPEG-2 LSF (and 2.5): Layer I has its own table; Layers II/III share one.
BITRATES_LSF = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
SAMPLE_RATES = (44100, 48000, 32000)
SAMPLE_RATES_V2 = (22050, 24000, 16000)
SAMPLE_RATES_V25 = (11025, 12000, 8000)

# ISO Table B.1: scalefactor idx 0..62 -> 2^(1 - idx/3).
SCALEFACTORS = 2.0 ** (1.0 - np.arange(64) / 3.0)
SCALEFACTORS[63] = 0.0  # forbidden index; keep the lookup total

# Synthesis matrixing N[i, k] = cos((16+i)(2k+1)pi/64), i<64, k<32.
_N = np.cos((16 + np.arange(64))[:, None]
            * (2 * np.arange(32) + 1)[None, :] * np.pi / 64)


class BitReader:
    """MSB-first bit reader over a byte buffer.

    Reads past the end return zero bits without advancing and set
    `overrun` (mirroring the C++ twin's fail flag), so malformed frames
    degrade instead of raising; callers check `overrun` to skip them."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits
        self.nbits = len(data) * 8
        self.overrun = False

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.data
        end = self.nbits
        for _ in range(n):
            if p >= end:
                self.pos = p
                self.overrun = True
                return 0
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def bits_left(self) -> int:
        return self.nbits - self.pos


class FrameHeader:
    __slots__ = ("layer", "bitrate_kbps", "bitrate_idx", "sample_rate",
                 "sr_idx", "padding", "mode", "mode_ext", "protection",
                 "frame_bytes", "channels", "lsf", "mpeg25")

    def __init__(self, word: int):
        if (word >> 21) & 0x7FF != 0x7FF:
            raise ValueError("bad sync")
        version = (word >> 19) & 3
        if version == 1:
            raise ValueError("reserved MPEG version")
        # 3 = MPEG-1, 2 = MPEG-2 LSF, 0 = MPEG-2.5 (quarter rates)
        self.lsf = version != 3
        self.mpeg25 = version == 0
        layer_bits = (word >> 17) & 3
        if layer_bits == 0:
            raise ValueError("reserved layer")
        self.layer = {3: 1, 2: 2, 1: 3}[layer_bits]
        self.protection = (word >> 16) & 1
        br_idx = (word >> 12) & 0xF
        if br_idx == 15:
            raise ValueError("forbidden bitrate index")
        self.bitrate_idx = br_idx
        # br_idx 0 = free format: the frame size is measured from the
        # next sync at stream level (decode_mp3) and set on this header.
        self.bitrate_kbps = (BITRATES_LSF if self.lsf
                             else BITRATES)[self.layer][br_idx]
        self.sr_idx = (word >> 10) & 3
        if self.sr_idx == 3:
            raise ValueError("reserved sample rate")
        self.sample_rate = (SAMPLE_RATES_V25 if self.mpeg25
                            else SAMPLE_RATES_V2 if self.lsf
                            else SAMPLE_RATES)[self.sr_idx]
        self.padding = (word >> 9) & 1
        self.mode = (word >> 6) & 3
        self.mode_ext = (word >> 4) & 3
        self.channels = 1 if self.mode == 3 else 2
        br = self.bitrate_kbps * 1000
        if br == 0:
            self.frame_bytes = 0  # free format: filled by the stream loop
        elif self.layer == 1:
            self.frame_bytes = (12 * br // self.sample_rate + self.padding) * 4
        elif self.layer == 3 and self.lsf:
            # LSF Layer III frames carry one granule (576 samples)
            self.frame_bytes = 72 * br // self.sample_rate + self.padding
        else:
            self.frame_bytes = 144 * br // self.sample_rate + self.padding


def _synthesis(S: np.ndarray, state: np.ndarray | None = None):
    """Polyphase synthesis: S (T, 32) subband samples -> (T*32,) PCM.

    state: (15, 64) V-FIFO history from the previous call (or None).
    Returns (pcm, new_state). out_t[j] = sum_q D[64q+j] V[t-2q, j]
    + D[64q+32+j] V[t-2q-1, 32+j]: the 1024-FIFO dewindowing with the sign
    alternation folded into the recovered window table (io/_mpeg_window).
    """
    T = S.shape[0]
    V = S @ _N.T  # (T, 64)
    if state is None:
        state = np.zeros((15, 64))
    Vp = np.concatenate([state, V], axis=0)  # rows t+15 align with V rows t
    out = np.zeros((T, 32))
    D = SYNTH_WINDOW
    for q in range(8):
        out += Vp[15 - 2 * q:15 - 2 * q + T, :32] * D[64 * q:64 * q + 32]
        out += (Vp[14 - 2 * q:14 - 2 * q + T, 32:]
                * D[64 * q + 32:64 * q + 64])
    return out.reshape(-1), Vp[-15:].copy()


# --- Layer I ---------------------------------------------------------------

def _layer1_requant(code: np.ndarray, nb: int) -> np.ndarray:
    """ISO 2.4.3.2: s'' = (2^nb/(2^nb-1)) * (s''' + 2^(1-nb)),
    s''' = code*2^(1-nb) - 1 (offset-binary MSB convention)."""
    f = code.astype(np.float64) * (2.0 ** (1 - nb)) - 1.0
    return (f + 2.0 ** (1 - nb)) * ((1 << nb) / float((1 << nb) - 1))


def _decode_layer1(h: FrameHeader, br: BitReader):
    """One Layer I frame -> (12, 32, ch) requantized subband samples."""
    nch = h.channels
    bound = (h.mode_ext + 1) * 4 if h.mode == 1 else 32
    alloc = np.zeros((32, nch), int)
    for sb in range(32):
        if h.mode == 1 and sb >= bound:
            a = br.read(4)
            alloc[sb, :] = a
        else:
            for ch in range(nch):
                alloc[sb, ch] = br.read(4)
    scf = np.zeros((32, nch), int)
    for sb in range(32):
        for ch in range(nch):
            if alloc[sb, ch]:
                scf[sb, ch] = br.read(6)
    out = np.zeros((12, 32, nch))
    for s in range(12):
        for sb in range(32):
            if h.mode == 1 and sb >= bound:
                if alloc[sb, 0]:
                    nb = alloc[sb, 0] + 1
                    v = _layer1_requant(np.array(br.read(nb)), nb)
                    for ch in range(nch):
                        out[s, sb, ch] = v * SCALEFACTORS[scf[sb, ch]]
            else:
                for ch in range(nch):
                    if alloc[sb, ch]:
                        nb = alloc[sb, ch] + 1
                        v = _layer1_requant(np.array(br.read(nb)), nb)
                        out[s, sb, ch] = v * SCALEFACTORS[scf[sb, ch]]
    return out


# --- Frame iteration / public API -----------------------------------------

def _find_sync(data: bytes, start: int) -> int:
    i = start
    n = len(data)
    while i + 4 <= n:
        if data[i] == 0xFF and (data[i + 1] & 0xE0) == 0xE0:
            try:
                FrameHeader(int.from_bytes(data[i:i + 4], "big"))
                return i
            except ValueError:
                pass
        i += 1
    return -1


def _free_format_size(data: bytes, pos: int, h: "FrameHeader") -> int:
    """Free-format (bitrate index 0) base frame size: the distance to the
    next sync with a matching header, minus the first frame's padding
    slot. Free-format frames are constant-size by spec (padding aside);
    the scan is capped at the format's largest plausible frame."""
    unit = 4 if h.layer == 1 else 1
    limit = min(len(data) - 4, pos + 5000)
    i = pos + 16
    while i <= limit:
        if data[i] == 0xFF and (data[i + 1] & 0xE0) == 0xE0:
            try:
                h2 = FrameHeader(int.from_bytes(data[i:i + 4], "big"))
            except ValueError:
                i += 1
                continue
            if (h2.layer == h.layer and h2.sample_rate == h.sample_rate
                    and h2.channels == h.channels and h2.bitrate_idx == 0):
                return (i - pos) - h.padding * unit
        i += 1
    return -1


def _skip_id3(data: bytes) -> int:
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        return 10 + size
    return 0


def decode_mp3(data: bytes):
    """Decode an MPEG-1 audio stream -> (pcm float64 (n, ch), sample_rate).

    Accepts Layer I/II/III frames (a stream uses one layer; the loop just
    follows the per-frame headers). Raw decoder output — no delay trim —
    matching a reference decoder fed the same raw stream.
    """
    pos = _skip_id3(data)
    chunks = []
    state = None  # per-channel synthesis state, created at first frame
    sr = None
    nch = None
    l3 = None  # Layer III persistent state (bit reservoir, overlap)
    free_size = None  # free-format base frame size, measured once
    while True:
        pos = _find_sync(data, pos)
        if pos < 0:
            break
        h = FrameHeader(int.from_bytes(data[pos:pos + 4], "big"))
        if h.bitrate_idx == 0:  # free format: measure the frame size
            if free_size is None:
                measured = _free_format_size(data, pos, h)
                if measured <= 0:
                    # unmeasurable: a spurious sync in junk (or a lone
                    # trailing frame) — resync past it like any other
                    # false sync instead of aborting the stream
                    pos += 1
                    continue
                free_size = measured
            h.frame_bytes = free_size + h.padding * (4 if h.layer == 1
                                                     else 1)
        if pos + h.frame_bytes > len(data):
            break  # truncated final frame
        frame = data[pos:pos + h.frame_bytes]
        if sr is None:
            sr, nch = h.sample_rate, h.channels
            state = [None] * nch
        elif h.sample_rate != sr or h.channels != nch:
            break  # format change mid-stream: stop at the boundary
        body = BitReader(frame, 32 + (16 if h.protection == 0 else 0))
        if h.layer == 1:
            S = _decode_layer1(h, body)
        elif h.layer == 2:
            S = _decode_layer2(h, body)
        else:
            if l3 is None:
                l3 = Layer3State(nch)
            S = _decode_layer3(h, frame, body, l3)
        if body.overrun:
            S = None  # malformed frame: skip, like the C++ twin
        if S is not None and S.shape[0]:
            pcm = np.zeros((S.shape[0] * 32, nch))
            for ch in range(nch):
                pcm[:, ch], state[ch] = _synthesis(S[:, :, ch], state[ch])
            chunks.append(pcm)
        pos += h.frame_bytes
    if not chunks:
        return np.zeros((0, 1)), sr or 0
    return np.concatenate(chunks, axis=0), sr


# Filled in below (kept after the public API for readability).
from ._mp3_layer2 import _decode_layer2  # noqa: E402
from ._mp3_layer3 import Layer3State, _decode_layer3  # noqa: E402
