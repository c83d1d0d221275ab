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
                tail_bits="", pulse_bits=None, tns_bits=None):
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
    if pulse_bits is None:
        w.put(0, 1)        # pulse_data_present
    else:
        w.put(1, 1)
        w.put_bits(pulse_bits)
    if tns_bits is None:
        w.put(0, 1)        # tns_data_present
    else:
        w.put(1, 1)
        w.put_bits(tns_bits)
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




# ---------------------------------------------------------- phase: sf book

def _band_rms(spec, offsets, k):
    lo, hi = offsets[k], offsets[k + 1]
    return float(np.sqrt(np.mean(spec[lo:hi] ** 2)))


def probe_sf_candidate(sr_idx, bits, offsets):
    """Two-noise-band frame: band 0 energy raw (=256 -> delta 0), band 1
    energy delta = the candidate scalefactor codeword `bits`.

    Returns the decoded delta (int) on clean parse + clean two-band noise
    output, else None."""
    payload = compose_sce(global_gain=150, max_sfb=2, sections=[(13, 2)],
                          sf_bits=format(256, "09b") + bits)
    try:
        spec = probe_spectrum_long(sr_idx, payload)
    except ValueError:
        return None
    peak = float(np.abs(spec).max())
    if peak < 1e-12:
        return None
    support = np.abs(spec) > peak / 1e4
    if support[offsets[2]:].any():
        return None                      # junk outside the two bands
    r0 = _band_rms(spec, offsets, 0)
    r1 = _band_rms(spec, offsets, 1)
    if r0 < 1e-12 or r1 < 1e-12:
        return None                      # a silent band: misparse
    delta4 = 4 * np.log2(r1 / r0)
    d = int(np.round(delta4))
    if abs(delta4 - d) > 1e-2 or not -60 <= d <= 60:
        return None
    return d


def recover_sf_book(sr_idx=4):
    """Prefix-tree walk of the scalefactor codebook (121 entries, delta
    -60..+60, max length 19 bits)."""
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "sf_book.json")
    if os.path.exists(path):
        return {int(k): v for k, v in json.load(open(path)).items()}
    offsets = json.load(open(os.path.join(OUT_DIR, "swb_long.json")))[
        str(ADTS_RATES[sr_idx])]
    book = {}          # delta -> codeword bitstring
    frontier = ["0", "1"]
    probes = 0
    while frontier:
        cand = frontier.pop()
        if len(cand) > 19:
            raise RuntimeError(f"prefix {cand[:24]} exceeded max length")
        d = probe_sf_candidate(sr_idx, cand, offsets)
        probes += 1
        if d is not None:
            if d in book:
                raise RuntimeError(
                    f"delta {d} for both {book[d]} and {cand}")
            book[d] = cand
            if len(book) % 20 == 0:
                print(f"  {len(book)}/121 codewords ({probes} probes)")
        else:
            frontier.append(cand + "0")
            frontier.append(cand + "1")
    if len(book) != 121:
        raise RuntimeError(f"recovered {len(book)} != 121 codewords")
    # Kraft equality certifies a complete prefix code
    kraft = sum(2.0 ** -len(c) for c in book.values())
    assert abs(kraft - 1.0) < 1e-12, kraft
    json.dump({str(k): v for k, v in sorted(book.items())},
              open(path, "w"), indent=0)
    print(f"sf book complete: 121 codewords, {probes} probes, kraft=1")
    return book

# ----------------------------------------------------- phase: spectral books

# (dims, signed) per spectral codebook 1..11
SPEC_CB = {1: (4, True), 2: (4, True), 3: (4, False), 4: (4, False),
           5: (2, True), 6: (2, True), 7: (2, False), 8: (2, False),
           9: (2, False), 10: (2, False), 11: (2, False)}

_SCALE = {}     # recovered dequant scale for the probe global_gain


def _sf0_bits():
    book = {int(k): v for k, v in json.load(
        open(os.path.join(OUT_DIR, "sf_book.json"))).items()}
    return book[0]


def probe_spec_unit(sr_idx, cb, bits, offsets, sf0):
    """One-spectral-band frame: sfb0 under codebook cb, scalefactor =
    global_gain (delta-0 codeword), spectral bits = `bits` (the candidate
    codeword(+sign/escape) unit(s)). Returns the 4 sfb0 bin values on a
    clean parse with silence elsewhere, else None."""
    payload = compose_sce(global_gain=150, max_sfb=1, sections=[(cb, 1)],
                          sf_bits=sf0, spec_bits=bits)
    try:
        spec = probe_spectrum_long(sr_idx, payload)
    except ValueError:
        return None
    peak = float(np.abs(spec).max())
    support = np.abs(spec) > max(peak / 1e4, 1e-12)
    if support[offsets[1]:].any():
        return None                      # junk outside sfb0: misparse
    return spec[:offsets[1]].copy()


def _values_from_bins(v):
    """Map sfb0 bin values to integer quantized values via the |q|^(4/3)
    ladder; the global scale is calibrated from codebook 1 (values 0/±1)
    and persisted so later recovery processes agree."""
    calib = os.path.join(OUT_DIR, "calib.json")
    s = _SCALE.get("s")
    if s is None and os.path.exists(calib):
        s = _SCALE["s"] = json.load(open(calib))["scale"]
    av = np.abs(v)
    if s is None:
        nz = av[av > 1e-12]
        if nz.size == 0:
            return np.zeros(len(v), int)
        s = float(nz.min())              # codebook 1: smallest nonzero = 1
        _SCALE["s"] = s
        json.dump({"scale": s}, open(calib, "w"))
    q = np.zeros(len(v), int)
    for i, a in enumerate(av):
        if a < s * 0.5:
            q[i] = 0
            continue
        qi = int(np.round((a / s) ** 0.75))
        if qi < 1 or abs(a - s * qi ** (4.0 / 3.0)) > 0.02 * a + 1e-12:
            return None                  # off the ladder: misparse
        q[i] = qi
    return np.where(np.signbit(v), -q, q)


def recover_spec_book(cb, sr_idx=4):
    """Prefix-tree walk of spectral codebook `cb`'s units (codeword +
    sign bits for unsigned books). Returns {values_tuple: codeword}."""
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"spec_book_{cb}.json")
    if os.path.exists(path):
        return json.load(open(path))
    offsets = json.load(open(os.path.join(OUT_DIR, "swb_long.json")))[
        str(ADTS_RATES[sr_idx])]
    assert offsets[1] == 4, "probe design assumes a width-4 sfb0"
    sf0 = _sf0_bits()
    dims, signed = SPEC_CB[cb]
    # pair books need a known all-zero unit for the second pair of sfb0;
    # find it first: shortest z with z+z parsing to silence.
    zero_unit = ""
    if dims == 2:
        frontier = ["0", "1"]
        while frontier:
            c = frontier.pop()
            if len(c) > 20:
                raise RuntimeError("no zero unit found")
            v = probe_spec_unit(sr_idx, cb, c + c, offsets, sf0)
            if v is not None and np.abs(v).max() < 1e-12:
                zero_unit = c
                break
            frontier.insert(0, c + "0")
            frontier.insert(0, c + "1")
        print(f"cb {cb}: zero unit {zero_unit!r}")

    units = {}        # unit bits -> values tuple
    frontier = ["0", "1"]
    probes = 0
    maxlen = 24 if cb == 11 else 22
    while frontier:
        cand = frontier.pop()
        if len(cand) > maxlen:
            raise RuntimeError(
                f"cb {cb}: prefix {cand[:26]} exceeded max length "
                f"({len(units)} units so far)")
        tail = zero_unit if dims == 2 else ""
        v = probe_spec_unit(sr_idx, cb, cand + tail, offsets, sf0)
        probes += 1
        ok = False
        if v is not None:
            q = _values_from_bins(v)
            if q is not None and (dims == 4 or not np.any(q[2:])):
                units[cand] = tuple(int(x) for x in q[:dims])
                ok = True
        if not ok:
            frontier.append(cand + "0")
            frontier.append(cand + "1")
        if probes % 500 == 0:
            print(f"  cb {cb}: {len(units)} units ({probes} probes)")

    # Factor units into codewords + sign bits (sign bit 1 = negative,
    # verified below); certify by Kraft equality over unique codewords.
    book = {}         # codeword -> tuple of |values| (or signed for 1,2,5,6)
    for u, vals in sorted(units.items(), key=lambda kv: (len(kv[0]), kv[0])):
        if signed:
            cw, key = u, vals
        else:
            k = sum(1 for x in vals if x)
            cw, key = (u[:-k] if k else u), tuple(abs(x) for x in vals)
            signs = u[len(cw):]
            expect = "".join("1" if x < 0 else "0" for x in vals if x)
            if signs != expect:
                raise RuntimeError(
                    f"cb {cb}: sign convention mismatch {u} {vals}")
        if cw in book:
            if book[cw] != key:
                raise RuntimeError(f"cb {cb}: {cw} -> {book[cw]} and {key}")
        else:
            book[cw] = key
    kraft = sum(2.0 ** -len(c) for c in book)
    if abs(kraft - 1.0) > 1e-9:
        raise RuntimeError(f"cb {cb}: kraft {kraft} != 1 "
                           f"({len(book)} codewords)")
    json.dump({c: list(vs) for c, vs in sorted(book.items())},
              open(path, "w"), indent=0)
    print(f"cb {cb}: {len(book)} codewords, {len(units)} units, "
          f"{probes} probes, kraft=1")
    return book


def recover_spec_book_11(sr_idx=4):
    """Codebook 11 (ESC): codeword values 0..16 where 16 marks an escape.
    The walk treats a candidate as cw+signs and supplies minimal escape
    words (N=0, mantissa 0 -> spectral value 16) for each escaped
    coefficient, so mantissa space is never enumerated; escape-word
    semantics are pinned afterwards by targeted probes in test_aac.py."""
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "spec_book_11.json")
    if os.path.exists(path):
        return json.load(open(path))
    offsets = json.load(open(os.path.join(OUT_DIR, "swb_long.json")))[
        str(ADTS_RATES[sr_idx])]
    sf0 = _sf0_bits()
    E = "00000"                      # one escape word: N=0, mantissa 0000

    # zero unit for the second pair (no signs, no escapes on zeros)
    zero_unit = None
    frontier = ["0", "1"]
    while frontier:
        c = frontier.pop()
        if len(c) > 20:
            raise RuntimeError("cb 11: no zero unit found")
        v = probe_spec_unit(sr_idx, 11, c + c, offsets, sf0)
        if v is not None and np.abs(v).max() < 1e-12:
            zero_unit = c
            break
        frontier.insert(0, c + "0")
        frontier.insert(0, c + "1")
    print(f"cb 11: zero unit {zero_unit!r}")

    units = {}       # (cw+signs bits) -> (values tuple, n_escapes)
    frontier = ["0", "1"]
    probes = 0
    while frontier:
        cand = frontier.pop()
        if len(cand) > 23:
            raise RuntimeError(
                f"cb 11: prefix {cand[:26]} exceeded max length "
                f"({len(units)} units so far)")
        ok = False
        for nesc in (0, 1, 2):
            v = probe_spec_unit(sr_idx, 11, cand + E * nesc + zero_unit,
                                offsets, sf0)
            probes += 1
            if v is None:
                continue
            q = _values_from_bins(v)
            if q is None or np.any(q[2:]):
                continue
            vals = tuple(int(x) for x in q[:2])
            if sum(1 for x in vals if abs(x) == 16) != nesc:
                continue             # escape count must match the supply
            units[cand] = (vals, nesc)
            ok = True
            break
        if not ok:
            frontier.append(cand + "0")
            frontier.append(cand + "1")
        if probes % 500 == 0:
            print(f"  cb 11: {len(units)} units ({probes} probes)")

    book = {}
    for u, (vals, nesc) in sorted(units.items(),
                                  key=lambda kv: (len(kv[0]), kv[0])):
        k = sum(1 for x in vals if x)
        cw = u[:-k] if k else u
        signs = u[len(cw):]
        expect = "".join("1" if x < 0 else "0" for x in vals if x)
        if signs != expect:
            raise RuntimeError(f"cb 11: sign mismatch {u} {vals}")
        key = tuple(abs(x) for x in vals)
        if cw in book:
            if book[cw] != key:
                raise RuntimeError(f"cb 11: {cw} -> {book[cw]} and {key}")
        else:
            book[cw] = key
    kraft = sum(2.0 ** -len(c) for c in book)
    if abs(kraft - 1.0) > 1e-9:
        raise RuntimeError(f"cb 11: kraft {kraft} != 1 ({len(book)})")
    if len(book) != 289:
        raise RuntimeError(f"cb 11: {len(book)} codewords != 289")
    json.dump({c: list(vs) for c, vs in sorted(book.items())},
              open(path, "w"), indent=0)
    print(f"cb 11: 289 codewords, {len(units)} units, {probes} probes")
    return book


# ----------------------------------------------------------- phase: emit

def emit_tables():
    """Write hpfw_tpu/io/_aac_tables.py from the recovered JSON artifacts
    (the checked-in Python source of truth, like _mp3_huffman.py)."""
    swb_l = json.load(open(os.path.join(OUT_DIR, "swb_long.json")))
    swb_s = json.load(open(os.path.join(OUT_DIR, "swb_short.json")))
    sf = json.load(open(os.path.join(OUT_DIR, "sf_book.json")))
    books = {cb: json.load(open(os.path.join(OUT_DIR,
                                             f"spec_book_{cb}.json")))
             for cb in range(1, 12)}
    path = os.path.join(os.path.dirname(__file__), "..", "hpfw_tpu", "io",
                        "_aac_tables.py")
    with open(path, "w") as f:
        f.write('"""AAC-LC tables, GENERATED by tools/recover_aac_tables.py.\n'
                '\nEvery entry was recovered from the system reference\n'
                'decoder by bitstream probing and certified complete\n'
                '(Kraft equality per codebook); do not edit by hand —\n'
                're-run the recovery tool instead.\n"""\n\n')
        f.write("# scalefactor-band offsets per sample rate\n")
        f.write("SWB_LONG = {\n")
        for k, v in sorted(swb_l.items(), key=lambda kv: -int(kv[0])):
            f.write(f"    {k}: {v},\n")
        f.write("}\n\nSWB_SHORT = {\n")
        for k, v in sorted(swb_s.items(), key=lambda kv: -int(kv[0])):
            f.write(f"    {k}: {v},\n")
        f.write("}\n\n")
        f.write("# scalefactor codebook: (length, code) -> delta\n")
        f.write("SF_BOOK = {\n")
        for d, bits in sorted(sf.items(), key=lambda kv: (len(kv[1]), kv[1])):
            f.write(f"    ({len(bits)}, 0b{bits or '0'}): {d},\n")
        f.write("}\n\n")
        f.write("# spectral codebooks: cb -> {(length, code) -> values}\n")
        f.write("SPEC_BOOKS = {\n")
        for cb, book in books.items():
            f.write(f"  {cb}: {{\n")
            for bits, vals in sorted(book.items(),
                                     key=lambda kv: (len(kv[0]), kv[0])):
                f.write(f"    ({len(bits)}, 0b{bits}): {tuple(vals)},\n")
            f.write("  },\n")
        f.write("}\n")
    print(f"wrote {path}")


# ------------------------------------------------- phase: tns_max_bands

def _tns_probe_filtered(sr_idx, offsets, sfb, short=False):
    """True if an impulse at the START of sfb `sfb` gets TNS-filtered by a
    full-length order-1 filter (i.e. sfb < tns_max_bands)."""
    b1 = json.load(open(os.path.join(OUT_DIR, "spec_book_1.json")))
    cw = {tuple(v): c for c, v in b1.items()}
    sf0 = _sf0_bits()
    num_swb = len(offsets) - 1
    nq = offsets[num_swb] // 4
    q = offsets[sfb] // 4
    spec = cw[(0, 0, 0, 0)] * q + cw[(1, 0, 0, 0)] \
        + cw[(0, 0, 0, 0)] * (nq - 1 - q)
    w = BitWriter()
    if short:
        w.put(1, 1); w.put(0, 1)
        w.put(num_swb, 4); w.put(1, 3)
        w.put(0, 1); w.put(0, 1); w.put(3, 3)
        # 7 remaining windows: n_filt = 0
        for _ in range(7):
            w.put(0, 1)
        raise NotImplementedError  # short path built in the short prober
    w.put(1, 2); w.put(0, 1)
    w.put(min(num_swb, 63), 6); w.put(1, 5)
    w.put(0, 1); w.put(0, 1); w.put(3, 3)       # direction 0, coef idx 3
    tns = "".join(str(b) for b in w.bits)
    payload = compose_sce(global_gain=150, max_sfb=num_swb,
                          sections=[(1, num_swb)], sf_bits=sf0 * num_swb,
                          spec_bits=spec, tns_bits=tns)
    out = probe_spectrum_long(sr_idx, payload)
    nz = np.nonzero(np.abs(out) > np.abs(out).max() / 1e3)[0]
    return nz.size > 2         # impulse spread = filtered


def recover_tns_max_bands():
    """tns_max_bands (long windows) per rate: the first sfb whose impulse
    is NOT filtered by a bottom-to-top full filter is the clamp."""
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "tns_max_bands_long.json")
    done = json.load(open(path)) if os.path.exists(path) else {}
    swb_l = json.load(open(os.path.join(OUT_DIR, "swb_long.json")))
    for sr_idx, hz in enumerate(ADTS_RATES):
        key = str(hz)
        if key in done:
            continue
        offsets = swb_l[key]
        num_swb = len(offsets) - 1
        lo, hi = 0, num_swb          # filtered at < clamp, not at >= clamp
        # binary search for the boundary
        while lo < hi:
            mid = (lo + hi) // 2
            if _tns_probe_filtered(sr_idx, offsets, mid):
                lo = mid + 1
            else:
                hi = mid
        done[key] = lo
        print(f"tns_max_bands long {hz} Hz: {lo} (num_swb {num_swb})")
        json.dump(done, open(path, "w"), indent=1)
    return done


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "swb"
    if phase == "swb":
        recover_swb_all()
        recover_swb_short_all()
    if phase == "sf":
        recover_sf_book()
    if phase == "tnsmax":
        recover_tns_max_bands()
    if phase == "emit":
        emit_tables()
    if phase == "spec":
        cbs = [int(a) for a in sys.argv[2:]] or list(range(1, 12))
        for cb in cbs:
            if cb == 11:
                recover_spec_book_11()
            else:
                recover_spec_book(cb)


if __name__ == "__main__":
    main()