"""WAV decode + resample (host-side audio I/O).

The reference wraps a native audio library for decode (SURVEY.md §2.1 row 1).
Here decode is host-side by definition (TPUs don't decode WAV); a C++
implementation lives in native/hpfw_native.cc (loaded via ctypes in
io/native.py) with this pure-NumPy path as the always-available fallback and
correctness oracle for it.

Supports PCM16/24/32, float32/64 WAV, any channel count (downmixed to mono),
with linear resampling to the config sample rate.
"""

from __future__ import annotations

import struct
import wave

import numpy as np

from ..config import HpfwConfig


def load_wav(path: str, cfg: HpfwConfig | None = None) -> tuple[np.ndarray, int]:
    """Decode a WAV file -> (mono float32 PCM in [-1,1], sample_rate).

    Prefers the C++ decoder (native/hpfw_native.cc, bit-identical and
    threaded-runtime grade); falls back to the pure-NumPy path when the
    native library is unavailable. If cfg is given, the PCM is resampled to
    cfg.sample_rate.
    """
    with open(path, "rb") as f:
        data = f.read()
    from . import native

    if native.available():
        try:
            pcm, sr = native.decode_wav(data)
        except ValueError:
            pcm, sr = _decode_wav_bytes(data)
    else:
        pcm, sr = _decode_wav_bytes(data)
    if cfg is not None and sr != cfg.sample_rate:
        pcm = resample_linear(pcm, sr, cfg.sample_rate)
        sr = cfg.sample_rate
    return pcm, sr


def _decode_wav_bytes(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    fmt_body = b""
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, sr, _, _, bits = fmt
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real format code is the first uint16 of
        # the SubFormat GUID at fmt-body offset 24 (16 base + cbSize(2) +
        # validBits(2) + channelMask(4)).
        if len(fmt_body) < 26:
            raise ValueError("extensible WAV with truncated fmt chunk")
        audio_format = struct.unpack("<H", fmt_body[24:26])[0]
    if audio_format == 1:  # integer PCM
        if bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 24:
            b3 = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            x = (
                b3[:, 0].astype(np.int32)
                | (b3[:, 1].astype(np.int32) << 8)
                | (b3[:, 2].astype(np.int8).astype(np.int32) << 16)
            ).astype(np.float32) / 8388608.0
        elif bits == 8:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        x = np.frombuffer(raw, dtype="<f4" if bits == 32 else "<f8").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format code {audio_format}")
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return np.ascontiguousarray(x, dtype=np.float32), sr


def save_wav(path: str, pcm: np.ndarray, sample_rate: int) -> None:
    """Write mono float PCM as 16-bit WAV (fixture generation / debugging)."""
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    ints = (x * 32767.0).round().astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(ints.tobytes())


def resample_linear(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resampler (matches the native C++ one exactly)."""
    if sr_in == sr_out:
        return np.asarray(pcm, dtype=np.float32)
    n_in = pcm.shape[0]
    n_out = int(n_in * sr_out / sr_in)
    src = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    i0 = np.minimum(src.astype(np.int64), n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    frac = (src - i0).astype(np.float32)
    x = np.asarray(pcm, dtype=np.float32)
    return ((1.0 - frac) * x[i0] + frac * x[i1]).astype(np.float32)
