"""BASELINE config 1: single 10 s WAV query -> CQT -> hashprints -> Hamming
match vs a 100-track in-memory DB, bit-exact to the reference oracle.

(The C++ reference mount was empty — SURVEY.md §0 — so the float64 NumPy
oracle is the bit-exactness anchor, with every constant exposed in
HpfwConfig for later snapping to the C++ behavior.)

Run on CPU or TPU; asserts zero differing bits and correct identification.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log, make_filters
from hpfw_tpu import api, oracle
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth, wav


def main():
    cfg = HpfwConfig()
    filters = make_filters(cfg)
    log("building 100-track catalog (20 s tracks)...")
    tracks = synth.synth_catalog(100, 20.0, cfg)
    db = api.build_db(tracks, filters, cfg)

    # A real WAV file round-trip, as the config demands.
    true_idx = 42
    q_pcm = synth.make_query(tracks[true_idx], 3.0, 10.0, cfg, noise_db=-20.0, seed=9)
    wav.save_wav("/tmp/hpfw_c1_query.wav", q_pcm, cfg.sample_rate)
    q_loaded, _ = wav.load_wav("/tmp/hpfw_c1_query.wav", cfg)

    qfp = api.fingerprint(q_loaded, filters, cfg)
    want = oracle.fingerprint(np.asarray(q_loaded, np.float64), filters, cfg)
    diff_bits = int(np.bitwise_count(np.bitwise_xor(qfp, want).astype(np.uint64)).sum())
    total_bits = qfp.size * 32
    emit("config1_differing_bits", diff_bits, "bits", total_bits=total_bits)

    t0 = time.perf_counter()
    ids, scores, offs = api.match(qfp, db, top_k=5)
    dt = (time.perf_counter() - t0) * 1e3
    ok = ids[0] == str(true_idx)
    exp_off = round(3.0 * cfg.sample_rate / cfg.hop)
    emit("config1_match_correct", bool(ok and abs(int(offs[0]) - exp_off) <= 1), "bool",
         top1=ids[0], offset=int(offs[0]), expected_offset=exp_off,
         match_ms=round(dt, 1))

    # The config says "on CPU": the threaded C++ matcher is the CPU engine.
    from hpfw_tpu.io import native

    if native.available():
        track_list = [db.prints[i, : db.lengths[i]] for i in range(db.n_tracks)]
        t0 = time.perf_counter()
        s_cpu, o_cpu = native.match_db(qfp, track_list)
        dt_cpu = (time.perf_counter() - t0) * 1e3
        best = int(np.argmax(s_cpu))
        agree = (best == int(ids[0]) and int(o_cpu[best]) == int(offs[0])
                 and int(s_cpu[best]) == int(scores[0]))
        emit("config1_cpu_native_match_ms", round(dt_cpu, 1), "ms",
             agrees_with_tpu=bool(agree))
        assert agree, "native CPU matcher disagrees with device matcher"

    assert diff_bits == 0, f"{diff_bits} differing bits"
    assert ok, f"got {ids[0]}"
    log("config1 PASS")


if __name__ == "__main__":
    main()
