"""Ogg Vorbis tests: NumPy decoder vs in-repo encoder roundtrips, C++
decoder equality, Ogg CRC integrity, load_wav dispatch, and fuzzing.

No Vorbis tooling exists in this offline environment, so fixtures come from
hpfw_tpu.io.vorbis.encode_vorbis — a real, spec-conforming encoder
(windowed MDCT, floor-1 posts, residue cascade, self-designed in-band
codebooks, Ogg pages with CRCs). The encoder and the two decoders are three
independent code paths over the wire format.
"""

import numpy as np
import pytest

from hpfw_tpu.io import native, wav
from hpfw_tpu.io.ogg import ogg_crc, parse_pages, write_pages
from hpfw_tpu.io.vorbis import decode_vorbis, encode_vorbis


def _sig(n, sr=22050, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = (0.4 * np.sin(2 * np.pi * 440.0 * t)
         + 0.2 * np.sin(2 * np.pi * 1210.0 * t)
         + 0.1 * np.sin(2 * np.pi * 3300.0 * t * (1 + 0.1 * t))
         + 0.01 * rng.standard_normal(n)).astype(np.float32)
    return x


def _snr(got, want):
    n = min(len(got), len(want))
    err = got[:n].astype(np.float64) - want[:n]
    return 10 * np.log10(np.mean(want[:n] ** 2) / (np.mean(err ** 2) + 1e-30))


CASES = [
    ("residue0", dict(residue_type=0), False),
    ("residue1", dict(residue_type=1), False),
    ("residue2", dict(residue_type=2), False),
    ("block256", dict(residue_type=2, blocksize=256), False),
    ("block1024", dict(residue_type=1, blocksize=1024), False),
    ("stereo_r1", dict(residue_type=1), True),
    ("stereo_r2", dict(residue_type=2), True),
    # long/short block mixing: exercises window-slope narrowing and the
    # unequal-span overlap-add in both decoders.
    ("mixed_blocks", dict(blocksize=256, long_blocksize=1024), False),
    ("mixed_stereo", dict(blocksize=256, long_blocksize=1024,
                          residue_type=1), True),
]


@pytest.mark.parametrize("name,kw,stereo", CASES, ids=[c[0] for c in CASES])
def test_vorbis_roundtrip(name, kw, stereo):
    """Lossy roundtrip: exact length/rate, SNR above the fixture codec's
    quantization floor (~20 dB), which is far above the -10 dB noise the
    matcher is evaluated at."""
    x = _sig(7003, seed=3)
    if stereo:
        x = np.stack([x, np.roll(x, 61) * -0.7], axis=1)
    blob = encode_vorbis(x, 22050, **kw)
    pcm, sr = decode_vorbis(blob)
    assert sr == 22050
    want = x.mean(axis=1) if x.ndim == 2 else x
    assert len(pcm) == len(want)
    assert _snr(pcm, want) > 18.0


@pytest.mark.parametrize("name,kw,stereo", CASES, ids=[c[0] for c in CASES])
def test_vorbis_native_equals_numpy(name, kw, stereo):
    """C++ decoder output matches the NumPy twin to float32 rounding."""
    if not native.available():
        pytest.skip("native library unavailable")
    x = _sig(5407, seed=4)
    if stereo:
        x = np.stack([x, np.roll(x, 61) * -0.7], axis=1)
    blob = encode_vorbis(x, 22050, **kw)
    py, r1 = decode_vorbis(blob)
    cc, r2 = native.decode_vorbis(blob)
    assert r1 == r2 == 22050
    assert py.shape == cc.shape
    np.testing.assert_allclose(py, cc, atol=4e-7)


def test_ogg_crc_and_page_roundtrip():
    pkts = [(b"hello", 0), (b"x" * 700, 5), (b"", 9), (b"y" * 255, 12)]
    blob = write_pages(pkts)
    pages = parse_pages(blob)
    from hpfw_tpu.io.ogg import pages_to_packets

    got = pages_to_packets(pages)
    assert [p for p, _ in got] == [p for p, _ in pkts]
    assert got[-1][1] == 12
    # known-answer sanity for the Ogg CRC variant (poly 0x04C11DB7, init 0)
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"\x00") == 0
    assert ogg_crc(b"\x01") == 0x04C11DB7


def test_vorbis_crc_detects_corruption():
    blob = bytearray(encode_vorbis(_sig(4000), 22050))
    blob[len(blob) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_vorbis(bytes(blob))
    if native.available():
        with pytest.raises(ValueError):
            native.decode_vorbis(bytes(blob))


def test_vorbis_load_wav_dispatch(tmp_path, cfg):
    x = _sig(22050)
    p = tmp_path / "t.ogg"
    p.write_bytes(encode_vorbis(x, 22050))
    pcm, sr = wav.load_wav(str(p), cfg)
    assert sr == cfg.sample_rate
    assert _snr(pcm, x) > 18.0


def test_vorbis_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_vorbis(b"OggX" + b"\x00" * 100)
    blob = encode_vorbis(_sig(3000), 22050)
    with pytest.raises(ValueError):
        decode_vorbis(blob[: len(blob) // 2 + 3])


def test_vorbis_fuzz_no_crash():
    """Random corruptions must raise ValueError (or decode if benign) —
    never crash or hang, in both decoders."""
    rng = np.random.default_rng(8)
    blob = bytearray(encode_vorbis(_sig(3000, seed=9), 22050))
    for _ in range(30):
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(4, len(b)))] ^= int(rng.integers(1, 256))
        try:
            decode_vorbis(bytes(b))
        except ValueError:
            pass
        if native.available():
            try:
                native.decode_vorbis(bytes(b))
            except ValueError:
                pass
