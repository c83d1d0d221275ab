"""Two-stage recall study on REAL-AUDIO statistics at catalog scale.

VERDICT r1 item 5: the stride/pool operating point was pinned on iid random
prints; real catalogs have correlated prints (cover versions, shared
progressions). This study builds a >=10k-track catalog of synthesized MUSIC
(including a fraction of pitch-shifted "cover versions" as correlated-print
stress), then sweeps coarse stride x fine pool and reports two-stage top-1
agreement with the exhaustive dense matcher.

    python benchmarks/recall_study.py [n_tracks] [track_seconds] [n_queries]

Tracks are deterministic functions of their seed, so query audio is
re-synthesized on demand instead of holding ~13 GB of PCM.
"""

import sys
import time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log, make_filters
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth

COVER_FRACTION = 0.1   # pitch-shifted near-duplicates (correlated prints)


def _synth_one(args):
    i, seconds, cfg = args
    base = synth.synth_track(i, seconds, cfg)
    if i % int(1 / COVER_FRACTION) == 3:
        # a "cover" of another track: same audio, slightly pitch-shifted
        base = synth.pitch_shift(synth.synth_track(i - 3, seconds, cfg), 0.25, cfg)
        n = int(seconds * cfg.sample_rate)
        base = np.pad(base, (0, max(0, n - base.shape[0])))[:n]
    return i, base


def build_prints(n_tracks, seconds, filters, cfg, workers=None, batch=32):
    """Synthesize + fingerprint the catalog in streaming batches."""
    import os

    workers = workers or os.cpu_count() or 1
    t0 = time.time()

    def stream():
        args = [(i, seconds, cfg) for i in range(n_tracks)]
        if workers > 1:
            with ProcessPoolExecutor(max_workers=workers) as pool:
                yield from pool.map(_synth_one, args, chunksize=8)
        else:
            yield from map(_synth_one, args)

    fps, buf = [], []
    for i, pcm in stream():
        buf.append(pcm)
        if len(buf) == batch:
            fps.append(api.fingerprint_batch(np.stack(buf), filters, cfg))
            buf = []
            if (len(fps) * batch) % 1024 == 0:
                log(f"  {len(fps) * batch}/{n_tracks} tracks ({time.time() - t0:.0f}s)")
    for pcm in buf:
        fps.append(api.fingerprint(pcm, filters, cfg)[None])
    prints = np.concatenate(fps, axis=0)
    log(f"catalog fingerprinted in {time.time() - t0:.0f}s: {prints.shape}")
    return prints


def main(n_tracks=10_000, track_seconds=15, n_queries=300):
    import os

    cfg = HpfwConfig()
    filters = make_filters(cfg)
    cache = f"/tmp/recall_prints_{n_tracks}_{track_seconds}.npz"
    if os.path.exists(cache):
        log(f"loading cached catalog prints from {cache}")
        prints = np.load(cache)["prints"]
    else:
        log(f"building {n_tracks} x {track_seconds}s real-audio catalog "
            f"({COVER_FRACTION:.0%} pitch-shifted covers)...")
        prints = build_prints(n_tracks, float(track_seconds), filters, cfg)
        np.savez(cache, prints=prints)
    lengths = np.full(n_tracks, prints.shape[1], np.int32)
    db = api.FingerprintDB(cfg, filters, [str(i) for i in range(n_tracks)],
                           prints, lengths)

    # Queries: noisy excerpts of random non-cover tracks, fixed length.
    rng = np.random.default_rng(11)
    q_secs = min(8.0, track_seconds - 3.0)
    queries, truths = [], []
    for _ in range(n_queries):
        tid = int(rng.integers(0, n_tracks))
        pcm = synth.synth_track(tid, float(track_seconds), cfg)
        q = synth.make_query(pcm, rng.uniform(0.2, 2.0), q_secs, cfg,
                             noise_db=-10.0, seed=int(rng.integers(1 << 30)))
        qfp = api.fingerprint(q[: int((q_secs - 1) * cfg.sample_rate)], filters, cfg)
        queries.append(qfp)
        truths.append(tid)

    # Exhaustive dense baseline (ground truth for agreement).
    log("exhaustive dense baseline...")
    dense_top = []
    for qfp in queries:
        ids, s, o = api.match(qfp, db, top_k=1)
        dense_top.append((ids[0], int(s[0]), int(o[0])))
    dense_correct = np.mean([d[0] == str(t) for d, t in zip(dense_top, truths)])
    emit("recall_dense_top1", round(float(dense_correct), 4), "accuracy",
         n_tracks=n_tracks, n_queries=n_queries)

    from hpfw_tpu.match.scaled import TwoStageDB

    for kind in ("sum", "sign"):
        for stride in (16, 32, 64):
            ts = TwoStageDB(db, stride=stride, coarse_kind=kind)
            for pool_k in (64, 256, 1024):
                agree = hit = 0
                for qfp, (d_id, d_s, d_o), tid in zip(queries, dense_top, truths):
                    ids, s, o = ts.match(qfp, top_k=1, pool=pool_k)
                    agree += (ids[0] == d_id and int(s[0]) == d_s and int(o[0]) == d_o)
                    hit += ids[0] == str(tid)
                emit(f"recall_{kind}_s{stride}_p{pool_k}",
                     round(hit / n_queries, 4), "top1_accuracy",
                     agreement_with_dense=round(agree / n_queries, 4),
                     n_tracks=n_tracks)
                log(f"{kind:4s} stride={stride:2d} pool={pool_k:4d}: "
                    f"top1 {hit / n_queries:.4f} "
                    f"dense-agreement {agree / n_queries:.4f}")
            del ts


if __name__ == "__main__":
    main(*[int(float(a)) for a in sys.argv[1:]])
