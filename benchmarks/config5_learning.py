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


def main(n_tracks=50, track_seconds=30.0, n_train=12, n_eval=20):
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


if __name__ == "__main__":
    args = [int(float(a)) for a in sys.argv[1:]]
    main(*args)
