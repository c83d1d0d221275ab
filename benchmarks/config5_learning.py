"""BASELINE config 5: projection learning on TPU + robustness eval.

Learns the 64 spectro-temporal filters with the streaming covariance + eigh
path, then measures identification accuracy of the full system under additive
noise and pitch-shift degradations, against a random-projection baseline (the
value of learning the filters) — the SURVEY.md §4.5 eval harness.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log, make_filters
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth


def accuracy(db, filters, tracks, cfg, degrade, n_eval, rng, matcher=None):
    hits = 0
    for i in range(n_eval):
        tid = int(rng.integers(0, len(tracks)))
        start = rng.uniform(0.5, 2.0)
        q = synth.make_query(tracks[tid], start, 8.0, cfg, seed=int(rng.integers(1 << 30)),
                             **degrade.get("query_kwargs", {}))
        if "pitch_semitones" in degrade:
            q = synth.pitch_shift(q, degrade["pitch_semitones"], cfg)
        # fixed query length -> one jit shape across all conditions
        q = q[: int(7.0 * cfg.sample_rate)]
        qfp = api.fingerprint(q, filters, cfg)
        if qfp.shape[0] == 0:
            continue
        if matcher is not None:
            ids, _, _ = matcher.match(qfp, top_k=1)
        else:
            ids, _, _ = api.match(qfp, db, top_k=1)
        hits += ids[0] == str(tid)
    return hits / n_eval


def artist_eval(cfg, n_eval, *, n_artists=6, tracks_per=8, track_seconds=30.0):
    """Known-artist robustness: per-artist filter banks vs one global bank vs
    random projections, matched within the true artist's catalog (the
    paper's known-artist setting). Pitch conditions are where learned
    spectro-temporal structure should pay off."""
    from hpfw_tpu.artist import ArtistDB

    catalogs = {
        f"artist{a}": {f"a{a}t{i}": synth.synth_artist_track(a, i, track_seconds, cfg)
                       for i in range(tracks_per)}
        for a in range(n_artists)
    }
    log(f"artist eval: {n_artists} artists x {tracks_per} tracks")
    adb = ArtistDB.build(catalogs, cfg)           # per-artist learned banks
    all_tracks = [t for c in catalogs.values() for t in c.values()]
    global_f = api.learn_filters(all_tracks, cfg)
    random_f = make_filters(cfg, seed=123)
    banks = {
        "perartist": adb.banks,
        "global": {a: api.build_db(c, global_f, cfg) for a, c in catalogs.items()},
        "random": {a: api.build_db(c, random_f, cfg) for a, c in catalogs.items()},
    }
    conditions = [("clean", 0.0), ("pitch_+0.5st", 0.5),
                  ("pitch_-0.5st", -0.5), ("pitch_+1st", 1.0)]
    for mode, dbs in banks.items():
        for cond, semis in conditions:
            rng = np.random.default_rng(42)
            hits = 0
            for _ in range(n_eval):
                a = f"artist{int(rng.integers(0, n_artists))}"
                ti = int(rng.integers(0, tracks_per))
                q = synth.make_query(catalogs[a][f"{a.replace('artist', 'a')}t{ti}"],
                                     rng.uniform(0.5, 2.0), 8.0, cfg,
                                     noise_db=-20.0,
                                     seed=int(rng.integers(1 << 30)))
                if semis:
                    q = synth.pitch_shift(q, semis, cfg)
                q = q[: int(7.0 * cfg.sample_rate)]
                qfp = api.fingerprint(q, dbs[a].filters, cfg)
                ids, _, _ = api.match(qfp, dbs[a], top_k=1)
                hits += ids[0] == f"{a.replace('artist', 'a')}t{ti}"
            acc = hits / n_eval
            emit(f"config5_artist_{mode}_{cond}", round(acc, 3), "accuracy",
                 n_eval=n_eval)
            log(f"artist {mode:9s} {cond:14s} top1={acc:.2f}")


def main(n_tracks=50, track_seconds=30.0, n_train=12, n_eval=100):
    cfg = HpfwConfig()
    rng = np.random.default_rng(7)
    log(f"catalog {n_tracks} x {track_seconds}s; training on {n_train} tracks")
    tracks = synth.synth_catalog(n_tracks, track_seconds, cfg)

    t0 = time.time()
    learned = api.learn_filters(tracks[:n_train], cfg)
    emit("config5_learn_seconds", round(time.time() - t0, 1), "s",
         context_dim=cfg.context_dim, train_tracks=n_train)

    random_f = make_filters(cfg, seed=123)
    conditions = [
        ("clean", {}),
        ("noise_-20dB", {"query_kwargs": {"noise_db": -20.0}}),
        ("noise_-10dB", {"query_kwargs": {"noise_db": -10.0}}),
        ("noise_-5dB", {"query_kwargs": {"noise_db": -5.0}}),
        ("pitch_+0.5st", {"pitch_semitones": 0.5}),
        ("pitch_-0.5st", {"pitch_semitones": -0.5}),
        ("pitch_+1st", {"pitch_semitones": 1.0}),
    ]
    for name, filters in [("learned", learned), ("random", random_f)]:
        db = api.build_db(tracks, filters, cfg)
        for cond, degrade in conditions:
            rng_eval = np.random.default_rng(99)
            acc = accuracy(db, filters, tracks, cfg, degrade, n_eval, rng_eval)
            emit(f"config5_top1_{name}_{cond}", round(acc, 3), "accuracy")
            log(f"{name:8s} {cond:14s} top1={acc:.2f}")

    # Two-stage matcher recall on REAL audio (not iid prints): does the
    # coarse majority-vote peak land within +/-fine_window of the true
    # alignment? Studied at two strides — stride 32 halves the 1M-track
    # coarse cost if recall holds.
    from hpfw_tpu.match.scaled import TwoStageDB

    db = api.build_db(tracks, learned, cfg)
    for stride in (16, 32):
        ts = TwoStageDB(db, stride=stride)
        for cond, degrade in [("noise_-10dB", {"query_kwargs": {"noise_db": -10.0}}),
                              ("noise_-5dB", {"query_kwargs": {"noise_db": -5.0}})]:
            rng_eval = np.random.default_rng(99)
            acc = accuracy(db, learned, tracks, cfg, degrade, n_eval, rng_eval,
                           matcher=ts)
            emit(f"config5_twostage_s{stride}_{cond}", round(acc, 3), "accuracy")
            log(f"two-stage s={stride:2d} {cond:12s} top1={acc:.2f}")

    artist_eval(cfg, n_eval)


if __name__ == "__main__":
    args = [int(float(a)) for a in sys.argv[1:]]
    main(*args)
