"""Batch file ingestion: threaded native decode with per-file fallback.

The files -> fingerprints -> DB catalog build's host half (SURVEY.md §3.2;
§2.1 rows 1+8: the reference pairs a native loader with a CPU thread pool
over tracks). `load_files` decodes a list of audio files through the C++
ingest driver (native/hpfw_native.cc `hpfw_ingest_files`: read + magic
dispatch + downmix + polyphase sinc resample, one pass per file, across a
std::thread pool, all outside the GIL) and falls back to the pure-Python
loader per file for anything the native driver rejects (e.g. Sun .au,
exotic WAV variants) or entirely when the toolchain is unavailable.

Output is bit-identical to calling io.wav.load_audio per file when both
paths use the native decoders (they share them), and margin-equal
otherwise (tests/test_ingest.py).
"""

from __future__ import annotations

import numpy as np

from ..config import HpfwConfig
from . import native
from .wav import load_audio


def load_files(paths: list[str], cfg: HpfwConfig | None = None,
               n_threads: int = 0,
               strict: bool = False) -> list[np.ndarray]:
    """Decode many audio files -> list of mono float32 PCM arrays.

    If cfg is given every track is resampled to cfg.sample_rate. With
    strict=True a file that fails BOTH the native driver and the Python
    fallback raises; otherwise it raises too (decode errors should never
    be silent) — strict=False only controls whether native rejections may
    fall back.
    """
    target = cfg.sample_rate if cfg is not None else 0
    results: list[np.ndarray | None] = [None] * len(paths)
    if native.available():
        decoded = native.ingest_files(list(paths), target_rate=target,
                                      n_threads=n_threads)
        for i, pcm in enumerate(decoded):
            results[i] = pcm
    for i, pcm in enumerate(results):
        if pcm is None:
            if strict and native.available():
                raise ValueError(f"native ingest rejected {paths[i]!r}")
            pcm, _sr = load_audio(paths[i], cfg)
            results[i] = pcm
    return results  # type: ignore[return-value]
