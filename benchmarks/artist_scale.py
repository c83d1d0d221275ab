"""Known-artist mode at catalog scale (VERDICT r2 weak #5).

The paper's known-artist setting with 10k+ tracks PER ARTIST: each artist
gets a filter bank learned on their own material and a TwoStageDB bank;
`ArtistDB.match(query, artist=...)` must hit two-stage latency, with
exact-on-pool agreement against the dense scan.

    python benchmarks/artist_scale.py [n_artists] [tracks_per_artist]
                                      [track_s] [n_queries_per_artist]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from hpfw_tpu import api
from hpfw_tpu.artist import ArtistDB
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth_jax

BATCH = 16
QUERY_SECONDS = 8.0


def main(n_artists=3, tracks_per_artist=10_000, track_s=30.0, n_q=50):
    import jax.numpy as jnp

    cfg = HpfwConfig()
    banks = {}
    t_all = time.time()
    for a in range(n_artists):
        name = f"artist{a}"
        log(f"building {name}: learning filters on 16 held-out tracks...")
        corpus = [np.asarray(p) for p in synth_jax.synth_artist_batch(
            a, 10_000_000 + np.arange(16), track_s, cfg)]
        filters = api.learn_filters(corpus, cfg)
        filters_dev = jnp.asarray(filters)
        npq = cfg.n_hashprints(int(track_s * cfg.sample_rate))
        prints = np.empty((tracks_per_artist, npq, 2), np.uint32)
        fp_fn = api._fingerprint_batch_jit(cfg, int(track_s * cfg.sample_rate),
                                           False)
        t0 = time.time()
        pending = []
        for start in range(0, tracks_per_artist, BATCH):
            ids = np.arange(start, min(start + BATCH, tracks_per_artist))
            pcm = synth_jax.synth_artist_batch(a, ids, track_s, cfg)
            pending.append((start, ids.shape[0], fp_fn(pcm, filters_dev)))
            if len(pending) >= 2:
                s0, b0, r = pending.pop(0)
                prints[s0:s0 + b0] = np.asarray(r)[:b0, :npq]
        for s0, b0, r in pending:
            prints[s0:s0 + b0] = np.asarray(r)[:b0, :npq]
        log(f"  {tracks_per_artist} tracks fingerprinted in "
            f"{time.time() - t0:.0f}s")
        banks[name] = api.FingerprintDB(
            cfg, filters, [f"a{a}t{i}" for i in range(tracks_per_artist)],
            prints, np.full(tracks_per_artist, npq, np.int32))

    adb = ArtistDB(cfg, banks, scaled=True)
    log(f"ArtistDB built in {time.time() - t_all:.0f}s; deriving banks...")
    for a in adb.artists:
        t0 = time.time()
        adb.two_stage(a)
        log(f"  {a} two-stage ready {time.time() - t0:.0f}s")

    rng = np.random.default_rng(5)
    lat_known = []
    hits = total = 0
    for a in range(n_artists):
        name = f"artist{a}"
        tids = rng.integers(0, tracks_per_artist, n_q)
        starts = rng.integers(0, int((track_s - QUERY_SECONDS - 1)
                                     * cfg.sample_rate), n_q)
        ts_bank = adb.two_stage(name)
        filters_dev = jnp.asarray(banks[name].filters)
        for i in range(n_q):
            pcm = np.asarray(synth_jax.synth_artist_batch(
                a, [int(tids[i])], track_s, cfg))[0]
            s0 = int(starts[i])
            clip = pcm[s0:s0 + int(QUERY_SECONDS * cfg.sample_rate)].copy()
            noise = rng.standard_normal(clip.shape[0]).astype(np.float32)
            rms = float(np.sqrt(np.mean(clip ** 2))) + 1e-12
            clip = clip + noise * (rms * 10 ** (-10 / 20)
                                   / (np.sqrt(np.mean(noise ** 2)) + 1e-12))
            qfp = api.fingerprint(clip, banks[name].filters, cfg)
            t0 = time.perf_counter()
            ids, s, o = ts_bank.match(qfp)
            lat_known.append((time.perf_counter() - t0) * 1e3)
            hits += ids[0] == f"a{a}t{int(tids[i])}"
            total += 1
    lat = np.array(lat_known)
    emit("artist_scale_known_match_ms", round(float(np.percentile(lat, 50)), 2),
         "ms", p99=round(float(np.percentile(lat, 99)), 2),
         recall_top1=round(hits / total, 4), n_artists=n_artists,
         tracks_per_artist=tracks_per_artist,
         note="e2e known-artist two-stage match incl. relay")
    log(f"known-artist: p50 {np.percentile(lat, 50):.1f} ms  "
        f"recall {hits}/{total}")

    # Device-side queued latency (the production number).
    name = "artist0"
    ts_bank = adb.two_stage(name)
    q = np.asarray(synth_jax.synth_artist_batch(0, [7], track_s, cfg))[0]
    qfp = api.fingerprint(q[: int(QUERY_SECONDS * cfg.sample_rate)],
                          banks[name].filters, cfg)
    qd = jnp.asarray(qfp)
    qd.block_until_ready()
    ts_bank.dispatch(qd).block_until_ready()
    t0 = time.perf_counter()
    outs = [ts_bank.dispatch(qd) for _ in range(20)]
    np.asarray(outs[-1])
    per_ms = (time.perf_counter() - t0) / 20 * 1e3
    emit("artist_scale_device_ms", round(per_ms, 2), "ms",
         tracks_per_artist=tracks_per_artist,
         note="device-side queued known-artist two-stage match")
    log(f"device-side known-artist match: {per_ms:.2f} ms")


if __name__ == "__main__":
    args = [float(a) for a in sys.argv[1:]]
    main(*[int(a) if i != 2 else a for i, a in enumerate(args)])
