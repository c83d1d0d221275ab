"""WAV decode edge cases, NumPy path and native C++ path (bit-identical).

Covers WAVE_FORMAT_EXTENSIBLE (format code 0xFFFE with the real sample
format in the SubFormat GUID) for both PCM and IEEE-float sub-formats —
the most common "weird WAV" in real catalogs (SURVEY.md §2.1 row 1).
"""

import struct

import numpy as np
import pytest

from hpfw_tpu.io import native, wav

# First 2 bytes of the SubFormat GUID are the format code; the remainder is
# the fixed KSDATAFORMAT suffix.
_GUID_SUFFIX = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def _extensible_wav(samples: np.ndarray, sample_rate: int, sub_format: int,
                    n_ch: int = 1) -> bytes:
    """Build a WAVE_FORMAT_EXTENSIBLE file around raw sample bytes."""
    raw = samples.tobytes()
    bits = samples.dtype.itemsize * 8
    block = n_ch * bits // 8
    fmt_body = struct.pack(
        "<HHIIHH", 0xFFFE, n_ch, sample_rate, sample_rate * block, block, bits
    ) + struct.pack("<HHI", 22, bits, (1 << n_ch) - 1) \
      + struct.pack("<H", sub_format) + _GUID_SUFFIX
    chunks = (b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
              + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


@pytest.fixture
def float_samples():
    rng = np.random.default_rng(7)
    return (rng.standard_normal(512) * 0.3).astype(np.float32)


def test_extensible_float32_decodes_exactly(float_samples):
    data = _extensible_wav(float_samples, 22050, sub_format=3)
    pcm, sr = wav._decode_wav_bytes(data)
    assert sr == 22050
    np.testing.assert_array_equal(pcm, float_samples)


def test_extensible_pcm16_decodes_exactly():
    ints = np.array([-32768, -1, 0, 1, 12345, 32767], dtype="<i2")
    data = _extensible_wav(ints, 8000, sub_format=1)
    pcm, sr = wav._decode_wav_bytes(data)
    assert sr == 8000
    np.testing.assert_array_equal(pcm, ints.astype(np.float32) / 32768.0)


def test_extensible_stereo_float_downmixes(float_samples):
    stereo = np.stack([float_samples, -float_samples], axis=1).reshape(-1)
    data = _extensible_wav(stereo, 16000, sub_format=3, n_ch=2)
    pcm, sr = wav._decode_wav_bytes(data)
    assert sr == 16000
    np.testing.assert_allclose(pcm, np.zeros_like(float_samples), atol=1e-7)


def test_extensible_unknown_subformat_raises(float_samples):
    data = _extensible_wav(float_samples, 22050, sub_format=0x0055)  # MP3
    with pytest.raises(ValueError):
        wav._decode_wav_bytes(data)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_extensible_matches_numpy(float_samples):
    ints = (np.clip(float_samples, -1, 1) * 32767).astype("<i2")
    for data in (_extensible_wav(float_samples, 22050, sub_format=3),
                 _extensible_wav(ints, 44100, sub_format=1)):
        got, sr_n = native.decode_wav(data)
        want, sr_p = wav._decode_wav_bytes(data)
        assert sr_n == sr_p
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_extensible_unknown_subformat_rejected(float_samples):
    data = _extensible_wav(float_samples, 22050, sub_format=0x0055)
    with pytest.raises(ValueError):
        native.decode_wav(data)
