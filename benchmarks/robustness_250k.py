"""Live-performance robustness at catalog scale (VERDICT r3 missing #2).

The system's stated purpose is LIVE song ID; live renditions differ from
the catalog in pitch (different key) and tempo — but every 250k/1M eval so
far used additive noise only, and the pitch table that justifies learned
filters stopped at 50 tracks. This re-runs the real-catalog eval with
pitch-shifted and time-stretched live renditions (io/synth_jax.py
live_query_batch: same score, different key/tempo, -10 dB noise) at the
`catalog_scale()` operating point, n=200 per condition, learned vs random
filters.

    python benchmarks/robustness_250k.py learned [conditions...]
    python benchmarks/robustness_250k.py random  [conditions...]
    python benchmarks/robustness_250k.py recover [pitch_st]   # knob sweep
    python benchmarks/robustness_250k.py scan    [conditions...]  # tempo scan
        (learned filters + stretch_span=0.03: the match/stretch.py
         mitigation for the measured time-stretch cliff, at 250k)
    python benchmarks/robustness_250k.py specscan [conditions...]
        (the QUALITY rung: api.fingerprint_scan_batch re-times the CQT
         frames before context assembly — no within-context drift, the
         failure mode that caps the print-level scan at 0.32 here)
    python benchmarks/robustness_250k.py pitchscan [conditions...]
        (spec-level PITCH-hypothesis scan: re-key the log-mag CQT by bin
         rolls ±2 (= ±1 st at 24 bins/octave) before context assembly —
         the round-4 verdict's missing mitigation for the measured
         16-24-point pitch hole; V = 5, tempo grid off)
    python benchmarks/robustness_250k.py fullscan [conditions...]
        (the combined pitch x tempo product grid, V = 5*7 = 35: the
         realistic live case where both axes move at once)

Artifacts reuse /tmp/hpfw_real_cat/250000_60 (benchmarks/real_catalog.py);
`random` extracts a second catalog under random filters once (~11 min) into
prints_random.npy.
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import emit, log
from benchmarks.real_catalog import NOISE_DB, QUERY_SECONDS, paths
from hpfw_tpu import api
from hpfw_tpu.config import HpfwConfig
from hpfw_tpu.io import synth_jax
from hpfw_tpu.match.scaled import TwoStageDB

N_TRACKS = 250_000
TRACK_S = 60.0
N_Q = 200
BATCH = 16

# (name, pitch_st, stretch)
CONDITIONS = [
    ("noise", 0.0, 1.0),
    ("pitch+0.5", 0.5, 1.0),
    ("pitch-0.5", -0.5, 1.0),
    ("pitch+1", 1.0, 1.0),
    ("pitch-1", -1.0, 1.0),
    ("stretch+3%", 0.0, 1.03),
    ("stretch-3%", 0.0, 0.97),
    ("pitch+0.5/stretch+3%", 0.5, 1.03),
]


def _query_plan():
    """Same deterministic plan as real_catalog.queries (seed 11)."""
    rng = np.random.default_rng(11)
    cfg = HpfwConfig()
    truths = rng.integers(0, N_TRACKS, N_Q)
    starts = rng.integers(0, int((TRACK_S - QUERY_SECONDS - 1)
                                 * cfg.sample_rate), N_Q)
    nseeds = rng.integers(0, 1 << 30, N_Q)
    return truths, starts, nseeds


def _extract_queries(filters_dev, pitch_st, stretch, cfg, scan_span=0.0,
                     scan_pitch=0):
    """scan_span>0 / scan_pitch>0: spec-level rendition scan — (N_Q, V, N,
    2) variant stacks via api.fingerprint_scan_batch (one shared NDFT pass
    per query; tempo re-timing x pitch bin-roll re-keying)."""
    import jax.numpy as jnp  # noqa: F401

    truths, starts, nseeds = _query_plan()
    qs_samples = int(QUERY_SECONDS * cfg.sample_rate)
    fp_fn = api._fingerprint_batch_jit(cfg, qs_samples, False)
    out = []
    for i in range(0, N_Q, BATCH):
        sl = slice(i, min(i + BATCH, N_Q))
        pcm = synth_jax.live_query_batch(
            truths[sl], starts[sl], TRACK_S, QUERY_SECONDS, cfg,
            pitch_st=pitch_st, stretch=stretch, noise_db=NOISE_DB,
            noise_seeds=nseeds[sl])
        if scan_span > 0.0 or scan_pitch > 0:
            out.append(api.fingerprint_scan_batch(
                np.asarray(pcm), np.asarray(filters_dev), cfg,
                span=scan_span, pitch_span_bins=scan_pitch))
        else:
            out.append(np.asarray(fp_fn(pcm, filters_dev)))
    return np.concatenate(out, axis=0), truths


def _random_filters(cfg):
    from hpfw_tpu.oracle import fix_eigenvector_signs

    rng = np.random.default_rng(123)
    f = rng.standard_normal((cfg.context_dim, cfg.n_filters)) \
        / np.sqrt(cfg.context_dim)
    return fix_eigenvector_signs(f).astype(np.float32)


def _random_catalog(cfg, filters):
    """Extract the SAME 250k tracks under random filters (once)."""
    import jax.numpy as jnp

    d = paths(N_TRACKS, TRACK_S)
    ppath = os.path.join(d, "prints_random.npy")
    if os.path.exists(ppath + ".done"):
        return np.load(ppath, mmap_mode="r")
    npq = cfg.n_hashprints(int(TRACK_S * cfg.sample_rate))
    prints = np.lib.format.open_memmap(
        ppath, mode="w+", dtype=np.uint32, shape=(N_TRACKS, npq, 2))
    fp_fn = api._fingerprint_batch_jit(cfg, int(TRACK_S * cfg.sample_rate),
                                       False)
    fdev = jnp.asarray(filters)
    t0 = time.time()
    pending = []
    for s0 in range(0, N_TRACKS, BATCH):
        ids = np.arange(s0, min(s0 + BATCH, N_TRACKS))
        pcm = synth_jax.synth_batch(ids, TRACK_S, cfg)
        pending.append((s0, ids.shape[0], fp_fn(pcm, fdev)))
        if len(pending) >= 2:
            a, b, r = pending.pop(0)
            prints[a:a + b] = np.asarray(r)[:b, :npq]
        if s0 and s0 % 4096 == 0:
            log(f"  random-filter catalog {s0}/{N_TRACKS} "
                f"({time.time() - t0:.0f}s)")
    for a, b, r in pending:
        prints[a:a + b] = np.asarray(r)[:b, :npq]
    prints.flush()
    open(ppath + ".done", "w").write("ok")
    log(f"random-filter catalog built in {time.time() - t0:.0f}s")
    return prints


def _two_stage(cfg, prints, filters):
    lengths = np.full(N_TRACKS, prints.shape[1], np.int32)
    db = api.FingerprintDB(cfg, filters,
                           [str(i) for i in range(N_TRACKS)],
                           prints, lengths)
    t0 = time.time()
    ts = TwoStageDB(db)
    log(f"two-stage ready in {time.time() - t0:.0f}s")
    return ts


def run(filter_kind="learned", conditions=None, pool=None):
    # mode -> (tempo span, pitch half-width, spec-level?)
    modes = {"scan": (0.03, 0, False), "specscan": (0.03, 0, True),
             "speccal": (0.03, 0, True), "pitchscan": (0.0, 2, True),
             "fullscan": (0.03, 2, True)}
    span, pitch, specscan = modes.get(filter_kind, (0.0, 0, False))
    scan = filter_kind in modes
    calibrate = filter_kind == "speccal"
    cfg = HpfwConfig.catalog_scale()
    d = paths(N_TRACKS, TRACK_S)
    if filter_kind == "random":
        filters = _random_filters(cfg)
        prints = _random_catalog(cfg, filters)
    else:
        filters = np.load(os.path.join(d, "filters.npy"))
        prints = np.load(os.path.join(d, "prints.npy"), mmap_mode="r")
    import jax.numpy as jnp

    fdev = jnp.asarray(filters)
    ts = _two_stage(cfg, prints, filters)
    if conditions is None and scan:
        # Each scan targets its measured hole; noise is the control
        # (does the hypothesis grid cost undistorted recall?).
        conditions = {"pitchscan": ["noise", "pitch+0.5", "pitch-0.5",
                                    "pitch+1", "pitch-1"],
                      "fullscan": ["noise", "pitch+1", "stretch+3%",
                                   "pitch+0.5/stretch+3%"],
                      }.get(filter_kind, ["noise", "stretch+3%",
                                          "stretch-3%",
                                          "pitch+0.5/stretch+3%"])
    conds = ([c for c in CONDITIONS if c[0] in conditions]
             if conditions else CONDITIONS)
    results = {}
    wall_ms = {}
    for name, pst, stretch in conds:
        qprints, truths = _extract_queries(
            fdev, pst, stretch, cfg, scan_span=span if specscan else 0.0,
            scan_pitch=pitch if specscan else 0)
        t0 = time.time()
        correct = 0
        # Keep B*V*pool under the fine kernel's SMEM candidate bound
        # (~130k): 10 queries/dispatch at V<=7/pool 1024, fewer on bigger
        # grids or deeper pools (HPFW_SCAN_POOL recall probes).
        v = qprints.shape[1] if qprints.ndim == 4 else 7
        pool_eff = pool or cfg.fine_candidates
        bsz = max(1, min(10, 70 // v, 130_000 // (v * pool_eff)))
        for i in range(0, N_Q, bsz):
            # specscan: qprints is 4-D — match_batch's pre-scanned path
            # supersedes the print-level scan (stretch_span ignored there).
            res = ts.match_batch(qprints[i:i + bsz], top_k=1, pool=pool,
                                 stretch_span=0.0 if specscan else span,
                                 calibrate=calibrate)
            for j, (tid, s, o) in enumerate(res):
                correct += int(tid[0]) == truths[i + j]
        top1 = correct / N_Q
        results[name] = top1
        wall_ms[name] = (time.time() - t0) / N_Q * 1000
        log(f"{filter_kind} / {name}: top-1 {top1:.3f} "
            f"({time.time() - t0:.0f}s)")
    emit(f"robustness_250k_{filter_kind}",
         results.get("pitch+1", results.get("noise")), "top1_accuracy",
         n_tracks=N_TRACKS, n_queries=N_Q, noise_db=NOISE_DB,
         preset="catalog_scale", stretch_span=span, pitch_span_bins=pitch,
         pool=pool,
         wall_ms_per_query={k: round(v, 1) for k, v in wall_ms.items()},
         **{k: round(v, 4) for k, v in results.items()})
    return results


def escalate(conditions=None, threshold=0.62, pitch=0, retry_pool=None,
             structure_gate=None, override_unstructured=None):
    """Identity-first + rendition-scan escalation (api.match_scan_
    escalating) at 250k: in-tempo queries must keep the rigid 0.865 (no
    variant-competition cost, no scan latency), distorted queries must
    keep the scan recovery. pitch>0 adds the bin-roll axis to the
    escalation grid (V = 7 * (2*pitch+1)). retry_pool/structure_gate
    enable the round-5 cheap rungs below the scan (deep-pool rigid retry,
    alignment-structure accept). Reports escalation/retry/structure-kept
    rates per condition."""
    import jax.numpy as jnp

    cfg = HpfwConfig.catalog_scale()
    d = paths(N_TRACKS, TRACK_S)
    filters = np.load(os.path.join(d, "filters.npy"))
    prints = np.load(os.path.join(d, "prints.npy"), mmap_mode="r")
    fdev = jnp.asarray(filters)
    ts = _two_stage(cfg, prints, filters)
    if conditions is None:
        conditions = (["noise", "pitch+0.5", "pitch+1", "stretch+3%",
                       "pitch+0.5/stretch+3%"] if pitch else
                      ["noise", "stretch+3%", "stretch-3%",
                       "pitch+0.5/stretch+3%"])
    conds = [c for c in CONDITIONS if c[0] in conditions]
    truths_all, starts, nseeds = _query_plan()
    qs_samples = int(QUERY_SECONDS * cfg.sample_rate)
    results, esc_rate, wall_ms = {}, {}, {}
    retry_rate, kept_rate = {}, {}
    for name, pst, stretch in conds:
        correct = esc = retried = kept = 0
        t0 = time.time()
        for i in range(0, N_Q, BATCH):
            sl = slice(i, min(i + BATCH, N_Q))
            pcm = np.asarray(synth_jax.live_query_batch(
                truths_all[sl], starts[sl], TRACK_S, QUERY_SECONDS, cfg,
                pitch_st=pst, stretch=stretch, noise_db=NOISE_DB,
                noise_seeds=nseeds[sl]))
            st: dict = {}
            res = api.match_scan_escalating(
                pcm, filters, ts, cfg, threshold=threshold, span=0.03,
                pitch_span_bins=pitch,
                override=float(os.environ.get("HPFW_ESC_OVERRIDE", "0.02")),
                top_k=1, batch=10, retry_pool=retry_pool,
                structure_gate=structure_gate,
                override_unstructured=override_unstructured, stats=st)
            esc += len(st["escalated"])
            retried += len(st.get("retried", []))
            kept += len(st.get("structure_kept", []))
            for j, (tid, s, o) in enumerate(res):
                correct += int(tid[0]) == truths_all[sl][j]
        results[name] = correct / N_Q
        esc_rate[name] = esc / N_Q
        retry_rate[name] = retried / N_Q
        kept_rate[name] = kept / N_Q
        wall_ms[name] = (time.time() - t0) / N_Q * 1000
        log(f"escalate / {name}: top-1 {results[name]:.3f} "
            f"(esc {esc_rate[name]:.2f}, retry {retry_rate[name]:.2f}, "
            f"kept {kept_rate[name]:.2f}, {time.time() - t0:.0f}s)")
    emit("robustness_250k_escalate"
         + ("_rung" if (retry_pool or structure_gate) else "")
         + ("_pitch" if pitch else ""),
         results.get("noise"), "top1_accuracy",
         n_tracks=N_TRACKS, n_queries=N_Q, noise_db=NOISE_DB,
         preset="catalog_scale", threshold=threshold,
         pitch_span_bins=pitch, retry_pool=retry_pool,
         structure_gate=structure_gate,
         override_unstructured=override_unstructured,
         esc_rate={k: round(v, 3) for k, v in esc_rate.items()},
         retry_rate={k: round(v, 3) for k, v in retry_rate.items()},
         kept_rate={k: round(v, 3) for k, v in kept_rate.items()},
         wall_ms_per_query={k: round(v, 1) for k, v in wall_ms.items()},
         **{k: round(v, 4) for k, v in results.items()})
    return results


def recover(pitch_st=1.0):
    """Does escalating phases / fine_window / pool recover pitched recall?"""
    cfg = HpfwConfig.catalog_scale()
    d = paths(N_TRACKS, TRACK_S)
    filters = np.load(os.path.join(d, "filters.npy"))
    prints = np.load(os.path.join(d, "prints.npy"), mmap_mode="r")
    import jax.numpy as jnp

    fdev = jnp.asarray(filters)
    ts = _two_stage(cfg, prints, filters)
    qprints, truths = _extract_queries(fdev, pitch_st, 1.0, cfg)
    out = {}
    for tag, kw in [("preset", {}),
                    ("pool4096", {"pool": 4096}),
                    ("fw256", {"fine_window": 256}),
                    ("pool4096+fw256", {"pool": 4096, "fine_window": 256})]:
        correct = 0
        t0 = time.time()
        for i in range(0, N_Q, 10):
            res = ts.match_batch(qprints[i:i + 10], top_k=1, **kw)
            for j, (tid, s, o) in enumerate(res):
                correct += int(tid[0]) == truths[i + j]
        out[tag] = correct / N_Q
        log(f"recover pitch{pitch_st:+.1f} / {tag}: top-1 {out[tag]:.3f} "
            f"({time.time() - t0:.0f}s)")
    emit("robustness_250k_recovery", out.get("pool4096+fw256"),
         "top1_accuracy", pitch_st=pitch_st,
         **{k: round(v, 4) for k, v in out.items()})
    return out


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "learned"
    if mode == "recover":
        recover(*[float(a) for a in sys.argv[2:]])
    elif mode == "escalate":
        escalate(conditions=sys.argv[2:] or None)
    elif mode == "pitchesc":
        escalate(conditions=sys.argv[2:] or None, pitch=2)
    elif mode == "rungesc":
        # round-5 serving candidate: full pitch x tempo escalation grid
        # with the cheap rungs (deep-pool retry, structure gate) in front.
        ou = os.environ.get("HPFW_OVERRIDE_UNSTRUCT")
        escalate(conditions=sys.argv[2:] or None, pitch=2,
                 retry_pool=int(os.environ.get("HPFW_RETRY_POOL", "4096")),
                 structure_gate=float(
                     os.environ.get("HPFW_STRUCT_GATE", "0.75")),
                 override_unstructured=float(ou) if ou is not None else None)
    else:
        sp = os.environ.get("HPFW_SCAN_POOL")
        run(mode, conditions=sys.argv[2:] or None,
            pool=int(sp) if sp else None)
