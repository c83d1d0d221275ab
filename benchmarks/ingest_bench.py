"""Files -> fingerprints -> DB ingestion benchmark (VERDICT r3 item 3).

Every prior catalog build synthesized PCM on device, so the decode stack —
the repo's largest subsystem — had no throughput number and no files->DB
driver. This measures, on real encoded files:

  1. per-codec native decode throughput (x realtime per core), one-pass
     threaded ingest driver (native hpfw_ingest_files);
  2. the NumPy-twin decode for comparison;
  3. end-to-end files -> fingerprints -> DB via api.build_db_from_files
     (threaded host decode overlapped with device extraction), reporting
     tracks/hour and the decode-vs-extract split.

    python benchmarks/ingest_bench.py fixtures [n_per_codec] [seconds]
    python benchmarks/ingest_bench.py decode   [reps]
    python benchmarks/ingest_bench.py e2e
    python benchmarks/ingest_bench.py all

Fixtures: device-free synth music written as WAV / FLAC / Ogg Vorbis (all
at the pipeline rate) + MP3 at 44.1 kHz through system libmp3lame (the
realistic streaming-codec leg: decode INCLUDES the polyphase sinc resample
to 22.05 kHz). Host: this VM exposes ONE core (nproc=1), so x realtime per
core IS the host throughput; the thread pool is correctness-tested here
and its scaling is left labeled as unmeasurable on this box.
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from hpfw_tpu.config import HpfwConfig

ROOT = "/tmp/hpfw_ingest"
N_PER_CODEC = 40
SECONDS = 30.0
CODECS = ("wav", "flac", "ogg", "mp3", "aac")


def fdir(codec):
    d = os.path.join(ROOT, f"{N_PER_CODEC}_{int(SECONDS)}", codec)
    os.makedirs(d, exist_ok=True)
    return d


def fixtures(n=N_PER_CODEC, secs=SECONDS):
    from hpfw_tpu.io import synth
    from hpfw_tpu.io.flac import encode_flac
    from hpfw_tpu.io.mpeg_ref import lame_encode
    from hpfw_tpu.io.vorbis import encode_vorbis
    from hpfw_tpu.io.wav import resample, save_wav

    global N_PER_CODEC, SECONDS
    N_PER_CODEC, SECONDS = n, secs
    cfg = HpfwConfig()
    done = os.path.join(ROOT, f"{n}_{int(secs)}", "fixtures.done")
    if os.path.exists(done):
        log("fixtures already built")
        return
    t0 = time.time()
    for i in range(n):
        pcm = synth.synth_track(7000 + i, secs, cfg)
        save_wav(os.path.join(fdir("wav"), f"t{i:04d}.wav"), pcm,
                 cfg.sample_rate)
        ints = (np.clip(pcm, -1, 1) * 32767.0).round().astype(np.int16)
        with open(os.path.join(fdir("flac"), f"t{i:04d}.flac"), "wb") as f:
            f.write(encode_flac(ints[:, None], cfg.sample_rate))
        with open(os.path.join(fdir("ogg"), f"t{i:04d}.ogg"), "wb") as f:
            f.write(encode_vorbis(pcm, cfg.sample_rate))
        with open(os.path.join(fdir("mp3"), f"t{i:04d}.mp3"), "wb") as f:
            f.write(lame_encode(resample(pcm, cfg.sample_rate, 44100), 44100))
        from hpfw_tpu.io import aac_ref
        with open(os.path.join(fdir("aac"), f"t{i:04d}.aac"), "wb") as f:
            f.write(aac_ref.aac_encode(
                resample(pcm, cfg.sample_rate, 44100).astype(np.float32),
                44100, 128))
        if i and i % 10 == 0:
            log(f"  {i}/{n} fixture tracks ({time.time() - t0:.0f}s)")
    open(done, "w").write("ok")
    log(f"fixtures built in {time.time() - t0:.0f}s")


def decode(reps=3):
    from hpfw_tpu.io import ingest, native

    cfg = HpfwConfig()
    assert native.available()
    rows = {}
    for codec in CODECS:
        paths = sorted(glob.glob(os.path.join(fdir(codec), "*")))
        assert paths, f"no fixtures for {codec}; run fixtures first"
        audio_s = len(paths) * SECONDS
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = native.ingest_files(paths, target_rate=cfg.sample_rate,
                                      n_threads=1)
            best = min(best, time.perf_counter() - t0)
        assert all(p is not None for p in out)
        # NumPy-twin comparison (single rep; it is the slow path)
        t0 = time.perf_counter()
        for p in paths[: max(2, len(paths) // 8)]:
            _import_numpy_decode(p, cfg)
        numpy_s = (time.perf_counter() - t0) / max(2, len(paths) // 8)
        rows[codec] = {
            "native_xrt_per_core": round(audio_s / best, 1),
            "numpy_xrt_per_core": round(SECONDS / numpy_s, 1),
            "files": len(paths),
        }
        log(f"{codec}: native {rows[codec]['native_xrt_per_core']}x rt/core, "
            f"numpy {rows[codec]['numpy_xrt_per_core']}x rt/core")
    emit("ingest_decode_xrt_per_core", rows["mp3"]["native_xrt_per_core"],
         "x_realtime", **{f"{c}_native": rows[c]["native_xrt_per_core"]
                          for c in CODECS},
         **{f"{c}_numpy": rows[c]["numpy_xrt_per_core"] for c in CODECS})
    return rows


def _import_numpy_decode(path, cfg):
    """Force the pure-NumPy decode path for the twin comparison."""
    from hpfw_tpu.io import wav as wavmod
    from hpfw_tpu.io.flac import decode_flac
    from hpfw_tpu.io.mp3 import decode_mp3
    from hpfw_tpu.io.vorbis import decode_vorbis

    data = open(path, "rb").read()
    if data[:4] == b"fLaC":
        pcm, sr = decode_flac(data)
    elif data[:4] == b"OggS":
        pcm, sr = decode_vorbis(data)
    elif data[:4] == b"RIFF":
        pcm, sr = wavmod._decode_wav_bytes(data)
    elif wavmod._looks_like_adts(data):
        from hpfw_tpu.io.aac import decode_aac

        raw, sr = decode_aac(data)
        pcm = raw.mean(axis=1)
    else:
        raw, sr = decode_mp3(data)
        pcm = raw.mean(axis=1) if raw.ndim > 1 and raw.shape[1] > 1 \
            else raw.reshape(-1)
    if sr != cfg.sample_rate:
        pcm = wavmod.resample_sinc(np.asarray(pcm, np.float32), sr,
                                   cfg.sample_rate)
    return pcm


def e2e():
    """files -> fingerprints -> DB on the real device, mixed codecs."""
    from hpfw_tpu import api
    from hpfw_tpu.io import ingest
    from hpfw_tpu.oracle import fix_eigenvector_signs

    cfg = HpfwConfig()
    paths = []
    for codec in CODECS:
        paths.extend(sorted(glob.glob(os.path.join(fdir(codec), "*"))))
    assert paths, "run fixtures first"
    rng = np.random.default_rng(0)
    filters = fix_eigenvector_signs(
        rng.standard_normal((cfg.context_dim, cfg.n_filters))
        / np.sqrt(cfg.context_dim)).astype(np.float32)

    # decode-only wall (the host half, no device work)
    t0 = time.perf_counter()
    pcms = ingest.load_files(paths, cfg, n_threads=1)
    t_decode = time.perf_counter() - t0
    del pcms

    # overlapped end-to-end build (decode chunk i+1 while chunk i extracts)
    t0 = time.perf_counter()
    db = api.build_db_from_files(paths, filters, cfg, n_threads=1)
    t_total = time.perf_counter() - t0
    audio_s = len(paths) * SECONDS
    res = {
        "files": len(paths),
        "decode_only_s": round(t_decode, 2),
        "e2e_s": round(t_total, 2),
        "e2e_xrt": round(audio_s / t_total, 1),
        "tracks_per_hour": round(len(paths) / t_total * 3600.0, 0),
        "overlap_overhead_s": round(t_total - t_decode, 2),
        "prints": int(db.lengths.sum()),
    }
    emit("ingest_e2e_tracks_per_hour", res["tracks_per_hour"], "tracks/h",
         **{k: v for k, v in res.items() if k != "tracks_per_hour"})
    log(json.dumps(res))
    return res


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    args = [float(a) for a in sys.argv[2:]]
    if cmd == "fixtures":
        fixtures(*([int(args[0])] if args else []),
                 *([args[1]] if len(args) > 1 else []))
    elif cmd == "decode":
        fixtures()
        decode(*([int(args[0])] if args else []))
    elif cmd == "e2e":
        fixtures()
        e2e()
    elif cmd == "all":
        fixtures()
        decode()
        e2e()
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
