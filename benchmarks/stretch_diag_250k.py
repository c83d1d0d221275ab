"""Diagnose the 250k stretch-scan gap (scan 0.32 vs the 400-track study's 0.91).

The study (benchmarks/stretch_study.py) scored variants with the DENSE
matcher; robustness_250k.py scan runs them through the TWO-STAGE program.
Two candidate causes for the 59-point gap, isolated here on the stretch+3%
condition (n=100, same deterministic query plan):

  a. two-stage-under-distortion: a re-timed rendition's prints carry
     within-context distortion; the coarse stage (already the recall
     bottleneck at 0.865 vs 0.91 dense) may degrade disproportionately.
     Measured by matching the ORACLE-INVERSE variant (re-timed at the true
     factor) as a plain query — no scan, no variant competition.
  b. variant competition: ranking 7 hypotheses of 250k tracks together
     inflates the imposter max (the study bounded this at <=1 point at 400
     tracks; the imposter tail is far denser at 250k). Measured as the gap
     between (a) and the full scan.
  Knob legs (pool / fine_window / phases escalation) say whether candidate
  escalation recovers whichever stage is losing the truth.

Run: python benchmarks/stretch_diag_250k.py [stretch] [n_q]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.real_catalog import paths
from benchmarks.robustness_250k import (N_TRACKS, N_Q, TRACK_S,
                                        _extract_queries, _two_stage)
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.match.stretch import print_variants


def main(stretch=1.03, n_q=100):
    import os

    import jax.numpy as jnp

    cfg = HpfwConfig.catalog_scale()
    d = paths(N_TRACKS, TRACK_S)
    filters = np.load(os.path.join(d, "filters.npy"))
    prints = np.load(os.path.join(d, "prints.npy"), mmap_mode="r")
    ts = _two_stage(cfg, prints, filters)
    fdev = jnp.asarray(filters)
    qprints, truths = _extract_queries(fdev, 0.0, stretch, cfg)
    qprints, truths = qprints[:n_q], truths[:n_q]

    def leg(tag, qs, bsz=10, **kw):
        correct = 0
        t0 = time.time()
        for i in range(0, qs.shape[0], bsz):
            for j, (tid, s, o) in enumerate(
                    ts.match_batch(qs[i:i + bsz], top_k=1, **kw)):
                correct += int(tid[0]) == truths[i + j]
        acc = correct / qs.shape[0]
        log(f"{tag}: top-1 {acc:.3f} ({time.time() - t0:.0f}s)")
        return acc

    inv = print_variants(qprints, [stretch])[:, 0]   # oracle re-timing
    # Spec-level re-extraction (api.fingerprint_scan_batch): the full
    # 7-hypothesis stack, and the oracle single-hypothesis row at the true
    # factor — separates variant competition from representation quality.
    qspec, _ = _extract_queries(fdev, 0.0, stretch, cfg, scan_span=0.03)
    qspec = qspec[:n_q]
    s_idx = int(round((stretch - 1.0) / 0.01)) + 3   # row of the true factor
    out = {
        "plain_rigid": leg("plain rigid", qprints),
        "oracle_inverse": leg("oracle-inverse print gather", inv),
        "oracle_inverse_pool4096": leg("oracle-inverse gather pool4096", inv,
                                       pool=4096, bsz=10),
        "scan": leg("7-pt print-gather scan", qprints, stretch_span=0.03),
        # bsz 4: 4*7*4096 candidates stays under the fine kernel's ~130k
        # SMEM prefetch bound (bsz 10 OOMs the SMEM allocator).
        "scan_pool4096": leg("7-pt print-gather scan pool4096", qprints,
                             stretch_span=0.03, pool=4096, bsz=4),
        "spec_oracle_row": leg("spec re-extraction, true-factor row",
                               qspec[:, s_idx]),
        "specscan": leg("7-pt spec scan", qspec),
        "specscan_pool4096": leg("7-pt spec scan pool4096", qspec,
                                 pool=4096, bsz=4),
        # Per-hypothesis background calibration: the specscan<->oracle-row
        # gap is pure variant competition (the true factor is ON the
        # grid); ranking by excess-over-row-median should close it.
        "specscan_cal": leg("7-pt spec scan calibrated", qspec,
                            calibrate=True),
        "scan_cal": leg("7-pt print scan calibrated", qprints,
                        stretch_span=0.03, calibrate=True),
    }
    emit("stretch_diag_250k", out["oracle_inverse"], "top1_accuracy",
         stretch=stretch, n_q=n_q,
         **{k: round(v, 4) for k, v in out.items()})


def dense_retimed(stretch=1.03, n_q=50):
    """The honest ceiling for ANY query-side re-timing at 250k: exhaustive
    DENSE matching of the spec-level TRUE-FACTOR re-extraction. If dense
    lands near the two-stage oracle-row 0.66, the residual loss is the
    REPRESENTATION under this distortion (the rendition's frames differ
    beyond re-timing) and no matcher work can recover it; if dense is well
    above, the two-stage coarse stage drops distorted truths and matcher
    escalation has headroom. Chunk-resumable like dense_1m."""
    import os

    import jax
    import jax.numpy as jnp

    from benchmarks.real_catalog import paths
    from hpfw_tpu.match import matcher

    cfg = HpfwConfig.catalog_scale()
    d = paths(N_TRACKS, TRACK_S)
    filters = np.load(os.path.join(d, "filters.npy"))
    prints = np.load(os.path.join(d, "prints.npy"), mmap_mode="r")
    fdev = jnp.asarray(filters)
    qspec, truths = _extract_queries(fdev, 0.0, stretch, cfg, scan_span=0.03)
    s_idx = int(round((stretch - 1.0) / 0.01)) + 3
    qrow = qspec[:n_q, s_idx]
    truths = truths[:n_q]

    @jax.jit
    def dense_chunk(qs, prints_dev, lengths_dev):
        return jax.lax.map(
            lambda q: matcher.score_tracks(q, prints_dev, lengths_dev), qs)

    chunk_t, qbatch = 8192, 10
    ids = np.full(n_q, -1, np.int64)
    scores = np.full(n_q, -1, np.int64)
    part = os.path.join(d, f"dense_retimed_{stretch}_{n_q}_part.npz")
    c_start = 0
    if os.path.exists(part):
        z = np.load(part)
        ids, scores, c_start = z["ids"], z["scores"], int(z["c_next"])
        log(f"resuming at chunk {c_start}")
    t0 = time.time()
    lengths_dev = jnp.full((chunk_t,), prints.shape[1], jnp.int32)
    for c0 in range(c_start, N_TRACKS, chunk_t):
        pd = jnp.asarray(np.asarray(prints[c0:c0 + chunk_t]))
        for q0 in range(0, n_q, qbatch):
            q1 = min(q0 + qbatch, n_q)
            s_all, o_all = (np.asarray(x) for x in dense_chunk(
                jnp.asarray(qrow[q0:q1]), pd, lengths_dev))
            best = np.argmax(s_all, axis=1)
            for i in range(q1 - q0):
                s0, gi0 = int(s_all[i, best[i]]), c0 + int(best[i])
                gq = q0 + i
                if s0 > scores[gq] or (s0 == scores[gq] and gi0 < ids[gq]):
                    scores[gq], ids[gq] = s0, gi0
        np.savez(part, ids=ids, scores=scores, c_next=c0 + chunk_t)
        if (c0 // chunk_t) % 4 == 0:
            log(f"chunk {c0}/{N_TRACKS} ({time.time() - t0:.0f}s)")
        del pd
    top1 = float(np.mean(ids == truths))
    log(f"dense on true-factor re-timed row: top-1 {top1:.3f} "
        f"({(time.time() - t0) / n_q:.1f} s/query)")
    emit("stretch_dense_ceiling_250k", top1, "top1_accuracy",
         stretch=stretch, n_q=n_q)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "dense":
        dense_retimed(*(float(a) if "." in a else int(a)
                        for a in sys.argv[2:]))
    else:
        main(*(float(a) if "." in a else int(a) for a in sys.argv[1:]))
