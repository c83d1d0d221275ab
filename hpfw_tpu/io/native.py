"""ctypes bindings for the C++ native runtime (native/hpfw_native.cc).

Builds lazily with `make` on first use if the shared library is missing;
every entry point has a pure-NumPy twin (io/wav.py, oracle.match) and tests
assert bit-identical results (tests/test_native.py). If the toolchain is
unavailable the package silently falls back to the NumPy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libhpfw_native.so"))
_lib = None
_tried = False


def load_library():
    """Return the loaded library or None (builds it on first call)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-s"], cwd=os.path.abspath(_NATIVE_DIR),
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.hpfw_wav_decode.restype = ctypes.c_int
        lib.hpfw_wav_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.hpfw_flac_decode.restype = ctypes.c_int
        lib.hpfw_flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.hpfw_vorbis_decode.restype = ctypes.c_int
        lib.hpfw_vorbis_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.hpfw_mp3_decode.restype = ctypes.c_int
        lib.hpfw_mp3_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.hpfw_aac_decode.restype = ctypes.c_int
        lib.hpfw_aac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.hpfw_opus_decode.restype = ctypes.c_int
        lib.hpfw_opus_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32)]
        lib.hpfw_fingerprint.restype = ctypes.c_int
        lib.hpfw_fingerprint.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int64)]
        lib.hpfw_resample_len.restype = ctypes.c_int64
        lib.hpfw_resample_len.argtypes = [ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
        lib.hpfw_resample_linear.restype = None
        lib.hpfw_resample_linear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.hpfw_resample_sinc_len.restype = ctypes.c_int64
        lib.hpfw_resample_sinc_len.argtypes = [
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
        lib.hpfw_resample_sinc.restype = None
        lib.hpfw_resample_sinc.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.hpfw_match_db.restype = None
        lib.hpfw_match_db.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32]
        lib.hpfw_ingest_files.restype = ctypes.c_void_p
        lib.hpfw_ingest_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32]
        lib.hpfw_ingest_rc.restype = ctypes.c_int32
        lib.hpfw_ingest_rc.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.hpfw_ingest_len.restype = ctypes.c_int64
        lib.hpfw_ingest_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.hpfw_ingest_rate.restype = ctypes.c_int32
        lib.hpfw_ingest_rate.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.hpfw_ingest_get.restype = ctypes.c_int
        lib.hpfw_ingest_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.hpfw_ingest_free.restype = None
        lib.hpfw_ingest_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return load_library() is not None


def _fptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono float32 PCM, sample_rate) via the C++ decoder."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = ctypes.c_int64(0)
    rate = ctypes.c_int32(0)
    rc = lib.hpfw_wav_decode(data, len(data), None, ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"native wav decode failed (code {rc})")
    out = np.empty(n.value, dtype=np.float32)
    rc = lib.hpfw_wav_decode(data, len(data), _fptr(out, ctypes.c_float),
                             ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"native wav decode failed (code {rc})")
    return out, int(rate.value)


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (mono float32 PCM, sample_rate) via the C++ decoder."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = ctypes.c_int64(0)
    rate = ctypes.c_int32(0)
    rc = lib.hpfw_flac_decode(data, len(data), None,
                              ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"native flac decode failed (code {rc})")
    out = np.empty(n.value, dtype=np.float32)
    rc = lib.hpfw_flac_decode(data, len(data), _fptr(out, ctypes.c_float),
                              ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"native flac decode failed (code {rc})")
    return out, int(rate.value)


def decode_vorbis(data: bytes) -> tuple[np.ndarray, int]:
    """Ogg Vorbis bytes -> (mono float32 PCM, sample_rate), C++ decoder."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = ctypes.c_int64(0)
    rate = ctypes.c_int32(0)
    rc = lib.hpfw_vorbis_decode(data, len(data), None,
                                ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"native vorbis decode failed (code {rc})")
    out = np.empty(n.value, dtype=np.float32)
    rc = lib.hpfw_vorbis_decode(data, len(data), _fptr(out, ctypes.c_float),
                                ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"native vorbis decode failed (code {rc})")
    return out, int(rate.value)


def decode_mp3(data: bytes) -> tuple[np.ndarray, int]:
    """MPEG-1 audio bytes -> (mono float32 PCM, sample_rate), C++ decoder.

    Twin of io/mp3.py decode_mp3 + the channel-mean downmix (margin-tested
    against it in tests/test_mp3.py — the float64 pipelines differ only in
    accumulation order)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = ctypes.c_int64(0)
    rate = ctypes.c_int32(0)
    rc = lib.hpfw_mp3_decode(data, len(data), None,
                             ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"native mp3 decode failed (code {rc})")
    out = np.empty(n.value, dtype=np.float32)
    rc = lib.hpfw_mp3_decode(data, len(data), _fptr(out, ctypes.c_float),
                             ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"native mp3 decode failed (code {rc})")
    return out, int(rate.value)


def decode_aac(data: bytes) -> tuple[np.ndarray, int]:
    """ADTS AAC-LC bytes -> (mono float32 PCM, sample_rate), C++ decoder.

    Twin of io/aac.py decode_aac + the channel-mean downmix (margin-tested
    against it in tests/test_aac.py — the float64 pipelines differ only in
    accumulation order)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = ctypes.c_int64(0)
    rate = ctypes.c_int32(0)
    rc = lib.hpfw_aac_decode(data, len(data), None,
                             ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"native aac decode failed (code {rc})")
    out = np.empty(n.value, dtype=np.float32)
    rc = lib.hpfw_aac_decode(data, len(data), _fptr(out, ctypes.c_float),
                             ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"native aac decode failed (code {rc})")
    return out, int(rate.value)


def decode_opus(data: bytes,
                return_final_range: bool = False):
    """Ogg Opus (CELT) bytes -> (mono float32 PCM, 48000), C++ decoder.

    Twin of io/opus.py decode_opus + the channel-mean downmix. The entropy
    path is integer-exact (final_range certified bit-equal against the
    NumPy twin in tests/test_opus.py); the float synthesis is margin-tested
    — the float64 pipelines differ only in accumulation order."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = ctypes.c_int64(0)
    rate = ctypes.c_int32(0)
    fr = ctypes.c_uint32(0)
    rc = lib.hpfw_opus_decode(data, len(data), None,
                              ctypes.byref(n), ctypes.byref(rate),
                              ctypes.byref(fr))
    if rc != 0:
        raise ValueError(f"native opus decode failed (code {rc})")
    out = np.empty(n.value, dtype=np.float32)
    rc = lib.hpfw_opus_decode(data, len(data), _fptr(out, ctypes.c_float),
                              ctypes.byref(n), ctypes.byref(rate),
                              ctypes.byref(fr))
    if rc != 0:
        raise ValueError(f"native opus decode failed (code {rc})")
    if return_final_range:
        return out, int(rate.value), int(fr.value)
    return out, int(rate.value)


def fingerprint_cpu(pcm: np.ndarray, filters: np.ndarray, cfg,
                    n_threads: int = 0) -> np.ndarray:
    """Full native extraction: PCM -> packed hashprints (N, 2) uint32.

    The reference's C++ fingerprint() surface (SURVEY.md §1.2) — CQT,
    projection, delta, sign, pack entirely in hpfw_native.cc, threaded over
    frames. Float64 like the oracle; equal to oracle.fingerprint except at
    ~zero delta margins (margin-audited in tests/test_native.py).
    """
    from ..oracle.pipeline import uint64_to_packed

    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(pcm, dtype=np.float32)
    f = np.ascontiguousarray(filters, dtype=np.float32)
    assert f.shape == (cfg.context_dim, 64)
    n = ctypes.c_int64(0)
    args = (x.shape[0], _fptr(f, ctypes.c_float),
            cfg.sample_rate, cfg.frame_len, cfg.hop, cfg.n_bins,
            cfg.fmin, cfg.bins_per_octave,
            1 if cfg.window == "hamming" else 0, cfg.log_eps,
            cfg.context_w, cfg.delta_lag,
            1 if cfg.bit_order == "msb0" else 0,
            1 if cfg.tie_break == "ge" else 0, n_threads)
    rc = lib.hpfw_fingerprint(_fptr(x, ctypes.c_float), *args,
                              None, ctypes.byref(n))
    if rc != 0:
        raise ValueError(f"native fingerprint failed (code {rc})")
    out = np.empty(max(n.value, 1), dtype=np.uint64)
    rc = lib.hpfw_fingerprint(_fptr(x, ctypes.c_float), *args,
                              _fptr(out, ctypes.c_uint64), ctypes.byref(n))
    if rc != 0:
        raise ValueError(f"native fingerprint failed (code {rc})")
    return uint64_to_packed(out[: n.value])


def resample_linear(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if sr_in == sr_out:
        return np.asarray(pcm, dtype=np.float32)
    x = np.ascontiguousarray(pcm, dtype=np.float32)
    n_out = lib.hpfw_resample_len(x.shape[0], sr_in, sr_out)
    out = np.empty(n_out, dtype=np.float32)
    lib.hpfw_resample_linear(_fptr(x, ctypes.c_float), x.shape[0], sr_in,
                             sr_out, _fptr(out, ctypes.c_float), n_out)
    return out


def resample_sinc(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase Kaiser-sinc resampler (C++; NumPy twin io/wav.resample_sinc,
    equal to ~1 float32 ulp — see tests/test_resample.py)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if sr_in == sr_out:
        return np.asarray(pcm, dtype=np.float32)
    x = np.ascontiguousarray(pcm, dtype=np.float32)
    n_out = lib.hpfw_resample_sinc_len(x.shape[0], sr_in, sr_out)
    out = np.empty(n_out, dtype=np.float32)
    lib.hpfw_resample_sinc(_fptr(x, ctypes.c_float), x.shape[0], sr_in,
                           sr_out, _fptr(out, ctypes.c_float), n_out)
    return out


def match_db(query_packed: np.ndarray, tracks: list[np.ndarray],
             n_threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Threaded CPU Hamming scan. Inputs are (N, 2)-uint32 packed prints.

    Returns per-track (best_scores, best_offsets), semantics identical to
    oracle.match_track.
    """
    from ..oracle.pipeline import packed_to_uint64

    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    q = np.ascontiguousarray(packed_to_uint64(query_packed))
    lengths = np.array([t.shape[0] for t in tracks], dtype=np.int64)
    max_len = max(int(lengths.max(initial=1)), 1)
    db = np.zeros((len(tracks), max_len), dtype=np.uint64)
    for i, t in enumerate(tracks):
        db[i, : t.shape[0]] = packed_to_uint64(t)
    scores = np.empty(len(tracks), dtype=np.int64)
    offsets = np.empty(len(tracks), dtype=np.int64)
    lib.hpfw_match_db(_fptr(q, ctypes.c_uint64), q.shape[0],
                      _fptr(db, ctypes.c_uint64), _fptr(lengths, ctypes.c_int64),
                      len(tracks), max_len,
                      _fptr(scores, ctypes.c_int64), _fptr(offsets, ctypes.c_int64),
                      n_threads)
    return scores, offsets


def ingest_files(paths: list[str], target_rate: int = 0,
                 n_threads: int = 0) -> list[np.ndarray | None]:
    """Threaded native decode (+resample) of many audio files at once.

    The batch ingestion front end (SURVEY.md §3.2 catalog build / §2.1
    row 8): file read, magic dispatch (WAV/AIFF/FLAC/Ogg Vorbis/MPEG),
    downmix, and polyphase sinc resample all happen in C++ across a
    std::thread pool, decoding each file exactly once. Returns one mono
    float32 array per path, or None for files the native driver rejects
    (callers fall back to the Python loader per file — io/ingest.py).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    arr = (ctypes.c_char_p * len(paths))(
        *[os.fsencode(p) for p in paths])
    h = lib.hpfw_ingest_files(arr, len(paths), target_rate, n_threads)
    if not h:
        raise RuntimeError("native ingest failed to allocate")
    try:
        out: list[np.ndarray | None] = []
        for i in range(len(paths)):
            if lib.hpfw_ingest_rc(h, i) != 0:
                out.append(None)
                continue
            pcm = np.empty(lib.hpfw_ingest_len(h, i), dtype=np.float32)
            rc = lib.hpfw_ingest_get(h, i, _fptr(pcm, ctypes.c_float))
            out.append(pcm if rc == 0 else None)
        return out
    finally:
        lib.hpfw_ingest_free(h)
