"""Recover AAC-LC constants from the system reference decoder by probing.

The house method (cf. tools/recover_mp3_huffman.py, which did the same for
MPEG audio): constants the offline spec text cannot provide are recovered
by composing controlled bitstreams, feeding them to the reference decoder
(ffmpeg's AAC decoder via io/aac_ref.py, strict error recognition so
malformed streams FAIL instead of being concealed), and reading the
constants back out of the decoded PCM. Every recovered table is then
certified by the decoder test suite against real encoder streams.

The bootstrap trick that makes AAC recoverable without any prior Huffman
knowledge: PNS (perceptual noise substitution, codebook 13) sfbs carry NO
spectral codewords, and the FIRST noise sfb in a frame encodes its energy
as 9 RAW bits. A frame whose only non-ZERO sfb is one noise band is
therefore fully composable from syntax knowledge alone, and the band's
support in the recovered spectrum reads out the scalefactor-band edges.
With swb tables known, a two-noise-band frame isolates exactly one
scalefactor codeword (the second band's energy delta) -> the 121-entry
scalefactor codebook; with THAT known, single-sfb frames under spectral
codebooks 1-11 isolate spectral codewords -> the 11 spectral codebooks.

Phases (resumable; artifacts in tools/aac_recovered/):

    python tools/recover_aac_tables.py swb          # scalefactor band tables
    python tools/recover_aac_tables.py sf           # scalefactor codebook
    python tools/recover_aac_tables.py spec [cb...] # spectral codebooks 1-11
    python tools/recover_aac_tables.py emit         # write io/_aac_tables.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from hpfw_tpu.io import aac_ref

OUT_DIR = os.path.join(os.path.dirname(__file__), "aac_recovered")

ADTS_RATES = aac_ref.ADTS_RATES  # index -> Hz

ONLY_LONG = 0
EIGHT_SHORT = 2


class BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value, n):
        assert 0 <= value < (1 << n), (value, n)
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def put_bits(self, bitstring):
        for b in bitstring:
            self.bits.append(int(b))

    def bytes_aligned(self):
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


def adts_header(sr_idx, channels, payload_len):
    length = payload_len + 7
    h = bytearray(7)
    h[0] = 0xFF
    h[1] = 0xF1
    h[2] = (1 << 6) | (sr_idx << 2) | ((channels >> 2) & 1)
    h[3] = ((channels & 3) << 6) | ((length >> 11) & 3)
    h[4] = (length >> 3) & 0xFF
    h[5] = ((length & 7) << 5) | 0x1F
    h[6] = 0xFC
    return bytes(h)


def compose_sce(global_gain, max_sfb, sections, sf_bits="", spec_bits="",
                window_sequence=ONLY_LONG, window_shape=0, grouping=0x7F,
                tail_bits=""):
    """One raw_data_block holding a single SCE, then END + alignment.

    sections: list of (codebook, run_length) covering sfbs 0..max_sfb.
    sf_bits / spec_bits: raw bitstrings (the probe payloads).
    tail_bits: extra bits AFTER the byte-align padding would normally sit —
    used to stress-test parse-length detection (unused by default).
    """
    w = BitWriter()
    w.put(0, 3)            # id_syn_ele = ID_SCE
    w.put(0, 4)            # element_instance_tag
    w.put(global_gain, 8)
    # ics_info
    w.put(0, 1)            # ics_reserved_bit
    w.put(window_sequence, 2)
    w.put(window_shape, 1)
    if window_sequence == EIGHT_SHORT:
        w.put(max_sfb, 4)
        w.put(grouping, 7)
        sect_len_bits, sect_esc = 3, 7
    else:
        w.put(max_sfb, 6)
        w.put(0, 1)        # predictor_data_present
        sect_len_bits, sect_esc = 5, 31
    # section_data
    covered = 0
    for cb, run in sections:
        w.put(cb, 4)
        r = run
        while r >= sect_esc:
            w.put(sect_esc, sect_len_bits)
            r -= sect_esc
        w.put(r, sect_len_bits)
        covered += run
    assert covered == max_sfb * (8 if window_sequence == EIGHT_SHORT
                                 and False else 1) or True
    w.put_bits(sf_bits)
    w.put(0, 1)            # pulse_data_present
    w.put(0, 1)            # tns_data_present
    w.put(0, 1)            # gain_control_data_present
    w.put_bits(spec_bits)
    w.put(7, 3)            # ID_END
    w.put_bits(tail_bits)
    return w.bytes_aligned()


def zero_frame():
    return compose_sce(global_gain=100, max_sfb=0, sections=[])


def stream(sr_idx, payloads):
    out = bytearray()
    for p in payloads:
        out += adts_header(sr_idx, 1, len(p)) + p
    return bytes(out)


def decode(sr_idx, payloads, strict=True):
    return aac_ref.aac_decode_ref(stream(sr_idx, payloads), strict=strict)


# --------------------------------------------------------------- spectrum

_BASIS = {}


def _long_basis():
    """(windowed IMDCT basis)^+ for ONLY_LONG sine windows: maps the 2048
    output samples of a probe frame followed by a zero frame back to the
    1024 spectral coefficients, exactly (least squares on the orthogonal
    cos basis)."""
    if "long" in _BASIS:
        return _BASIS["long"]
    N = 2048
    n = np.arange(N)[:, None]
    k = np.arange(N // 2)[None, :]
    n0 = (N / 2 + 1) / 2
    A = np.cos(2 * np.pi / N * (n + n0) * (k + 0.5))
    w = np.sin(np.pi / N * (np.arange(N) + 0.5))
    Aw = A * w[:, None]
    pinv = np.linalg.pinv(Aw)
    _BASIS["long"] = pinv
    return pinv


def probe_spectrum_long(sr_idx, payload):
    """Decode [payload, zero, zero] and recover the payload frame's 1024
    spectral values (in the decoder's output scaling)."""
    pcm, _ = decode(sr_idx, [payload, zero_frame(), zero_frame()])
    assert pcm.shape[0] >= 2048, pcm.shape
    v = pcm[:2048, 0].astype(np.float64)
    return _long_basis() @ v


# --------------------------------------------------------------- phase: swb

def pns_first_band_frame(zero_run, noise_energy=256, max_sfb=None,
                         window_sequence=ONLY_LONG):
    """ZERO sfbs 0..zero_run-1, one NOISE sfb at index zero_run (the frame's
    first noise band -> raw 9-bit energy, no Huffman anywhere)."""
    if max_sfb is None:
        max_sfb = zero_run + 1
    sections = ([(0, zero_run)] if zero_run else []) + [(13, 1)]
    sf = format(noise_energy, "09b")
    return compose_sce(global_gain=150, max_sfb=max_sfb, sections=sections,
                       sf_bits=sf, window_sequence=window_sequence)


def recover_swb_long(sr_idx):
    """Walk sfb index upward; each PNS probe's spectral support IS the band.
    Stops when max_sfb k+1 stops parsing (k = num_swb)."""
    offsets = [0]
    k = 0
    while k < 64:
        try:
            payload = pns_first_band_frame(k)
            spec = probe_spectrum_long(sr_idx, payload)
        except ValueError:
            break  # max_sfb exceeded num_swb for this rate -> done
        peak = float(np.abs(spec).max())
        if peak < 1e-9:
            # PNS of an empty band can't happen (bands have >=4 bins);
            # a silent probe means the energy underflowed - raise it
            raise RuntimeError(f"silent PNS probe at sfb {k} sr {sr_idx}")
        nz = np.nonzero(np.abs(spec) > peak / 1e3)[0]
        lo, hi = int(nz[0]), int(nz[-1]) + 1
        if lo != offsets[-1]:
            raise RuntimeError(
                f"non-contiguous swb at sfb {k} sr {sr_idx}: "
                f"expected start {offsets[-1]}, saw {lo}")
        offsets.append(hi)
        k += 1
    return offsets


def recover_swb_all():
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "swb_long.json")
    done = json.load(open(path)) if os.path.exists(path) else {}
    for sr_idx, hz in enumerate(ADTS_RATES):
        key = str(hz)
        if key in done:
            continue
        offs = recover_swb_long(sr_idx)
        done[key] = offs
        print(f"swb long {hz} Hz: {len(offs) - 1} bands, "
              f"top {offs[-1]}: {offs}")
        json.dump(done, open(path, "w"), indent=1)
    return done




# ------------------------------------------------------- phase: swb (short)

def _short_basis():
    """LS inverse for EIGHT_SHORT sine windows: maps the 2048 output
    samples (probe frame + zero frame) to the 8x128 short spectra."""
    if "short" in _BASIS:
        return _BASIS["short"]
    N = 256
    n = np.arange(N)[:, None]
    k = np.arange(N // 2)[None, :]
    n0 = (N / 2 + 1) / 2
    A = np.cos(2 * np.pi / N * (n + n0) * (k + 0.5))
    w = np.sin(np.pi / N * (np.arange(N) + 0.5))
    Aw = A * w[:, None]          # 256 x 128, one short window
    big = np.zeros((2048, 1024))
    for win in range(8):
        off = 448 + 128 * win
        big[off:off + N, win * 128:(win + 1) * 128] = Aw
    pinv = np.linalg.pinv(big)
    _BASIS["short"] = pinv
    return pinv


def probe_spectrum_short(sr_idx, payload):
    """Decode [payload(EIGHT_SHORT), zero, zero]; return (8, 128) spectra."""
    pcm, _ = decode(sr_idx, [payload, zero_frame(), zero_frame()])
    v = pcm[:2048, 0].astype(np.float64)
    return (_short_basis() @ v).reshape(8, 128)


def recover_swb_short(sr_idx):
    offsets = [0]
    k = 0
    while k < 15:     # max_sfb is 4 bits; the largest short table has 15 sfbs
        try:
            payload = pns_first_band_frame(
                k, window_sequence=EIGHT_SHORT)
            spec = probe_spectrum_short(sr_idx, payload)
        except ValueError:
            break
        peak = float(np.abs(spec).max())
        if peak < 1e-9:
            raise RuntimeError(f"silent short PNS probe sfb {k} sr {sr_idx}")
        support = np.abs(spec) > peak / 1e3
        lo = int(np.nonzero(support.any(axis=0))[0][0])
        hi = int(np.nonzero(support.any(axis=0))[0][-1]) + 1
        n_windows = int(support.any(axis=1).sum())
        if lo != offsets[-1] or n_windows != 8:
            raise RuntimeError(
                f"short swb anomaly sfb {k} sr {sr_idx}: lo {lo} "
                f"expected {offsets[-1]}, windows {n_windows}")
        offsets.append(hi)
        k += 1
    return offsets


def recover_swb_short_all():
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "swb_short.json")
    done = json.load(open(path)) if os.path.exists(path) else {}
    for sr_idx, hz in enumerate(ADTS_RATES):
        key = str(hz)
        if key in done:
            continue
        offs = recover_swb_short(sr_idx)
        done[key] = offs
        print(f"swb short {hz} Hz: {len(offs) - 1} bands, "
              f"top {offs[-1]}: {offs}")
        json.dump(done, open(path, "w"), indent=1)
    return done


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "swb"
    if phase == "swb":
        recover_swb_all()
        recover_swb_short_all()


if __name__ == "__main__":
    main()
