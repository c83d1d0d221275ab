"""Escalation-criterion probe at 250k: what separates a CONFIDENT TRUE
rigid match from a wrong one?

The first escalation design used an absolute score threshold (0.62 of
perfect) and failed: 83% of 3%-stretched queries — whose rigid top-1 is
wrong 99% of the time — score ABOVE it (real-audio imposters at 430
prints sit far above the binomial floor). This probe prints the rigid
top-1 score and the top1->top2 margin distributions for noise-only
(86.5% correct) vs stretch+3% (~1% correct) queries, split by
correctness, to pick the serving criterion.

Run: python benchmarks/escalation_probe.py [n_q]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.real_catalog import paths
from benchmarks.robustness_250k import (N_TRACKS, TRACK_S,
                                        _extract_queries, _two_stage)
from hpfw_tpu.config import HpfwConfig


def main(n_q=100):
    import jax.numpy as jnp

    cfg = HpfwConfig.catalog_scale()
    d = paths(N_TRACKS, TRACK_S)
    filters = np.load(os.path.join(d, "filters.npy"))
    prints = np.load(os.path.join(d, "prints.npy"), mmap_mode="r")
    ts = _two_stage(cfg, prints, filters)
    fdev = jnp.asarray(filters)
    out = {}
    for name, stretch in [("noise", 1.0), ("stretch+3%", 1.03)]:
        qprints, truths = _extract_queries(fdev, 0.0, stretch, cfg)
        qprints, truths = qprints[:n_q], truths[:n_q]
        n = qprints.shape[1]
        t0 = time.time()
        sims, margins, correct = [], [], []
        for i in range(0, n_q, 10):
            for j, (ids, sc, off) in enumerate(
                    ts.match_batch(qprints[i:i + 10], top_k=2,
                                   stretch_span=0.0)):
                s1 = float(sc[0]) / (64.0 * n)
                s2 = float(sc[1]) / (64.0 * n) if len(sc) > 1 else 0.0
                sims.append(s1)
                margins.append((s1 - s2) / max(s1, 1e-9))
                correct.append(int(ids[0]) == truths[i + j])
        sims, margins = np.array(sims), np.array(margins)
        correct = np.array(correct, bool)
        for tag, m in [("correct", correct), ("wrong", ~correct)]:
            if m.sum() == 0:
                continue
            log(f"{name}/{tag} (n={int(m.sum())}): "
                f"sim p10/p50/p90 = {np.percentile(sims[m], 10):.3f}/"
                f"{np.percentile(sims[m], 50):.3f}/"
                f"{np.percentile(sims[m], 90):.3f}  "
                f"margin p10/p50/p90 = {np.percentile(margins[m], 10):.4f}/"
                f"{np.percentile(margins[m], 50):.4f}/"
                f"{np.percentile(margins[m], 90):.4f}")
            out[f"{name}_{tag}"] = {
                "n": int(m.sum()),
                "sim": [round(float(np.percentile(sims[m], p)), 4)
                        for p in (10, 50, 90)],
                "margin": [round(float(np.percentile(margins[m], p)), 4)
                           for p in (10, 50, 90)],
            }
        log(f"{name}: {time.time() - t0:.0f}s")
    emit("escalation_probe", n_q, "queries", **out)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
