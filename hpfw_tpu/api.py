"""Public API — mirrors the reference's surface (SURVEY.md §1.2):

    fingerprint(audio)      -> hashprint sequence
    match(query, db)        -> ranked track IDs
    build_db(catalog)       -> FingerprintDB
    learn_filters(corpus)   -> projection filters

plus save/load and a streaming session (hpfw_tpu.streaming). Hot compute runs
on the default JAX backend (TPU when present); decode and final ranking are
host-side. All functions accept/return NumPy; device placement is internal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import DEFAULT_CONFIG, HpfwConfig
from .match import matcher
from .ops import fingerprint as fp_ops
from .ops import frontend


def _pipeline(cfg: HpfwConfig, use_pallas: bool):
    """The un-jitted PCM -> packed prints function (shared by all wrappers)."""
    if use_pallas:
        from .ops import fused  # deferred: TPU-only

        def run(pcm, filters):
            return fused.fingerprint(pcm, filters, cfg)
    else:
        def run(pcm, filters):
            spec = frontend.cqt(pcm, cfg)
            return fp_ops.fingerprint_from_spec(spec, filters, cfg)

    return run


@functools.lru_cache(maxsize=32)
def _fingerprint_jit(cfg: HpfwConfig, n_samples: int, use_pallas: bool):
    """Jitted PCM -> packed prints for a fixed input length (static shapes)."""
    return jax.jit(_pipeline(cfg, use_pallas))


def fingerprint(
    pcm: np.ndarray,
    filters: np.ndarray,
    cfg: HpfwConfig = DEFAULT_CONFIG,
    *,
    use_pallas: bool = False,
    bucket_s: float = 1.0,
) -> np.ndarray:
    """Audio -> packed 64-bit hashprints, shape (N, 2) uint32.

    Reference surface: fingerprint(audio) -> hashprint sequence (SURVEY.md
    §1.2). Use oracle.packed_to_uint64 for a (N,) uint64 view.

    bucket_s: input length is zero-padded up to this granularity so a
    variable-length catalog compiles one program per bucket instead of one
    per distinct length. EXACT: the first n_hashprints(true_len) prints
    depend only on samples within the true length, and only those are
    returned. bucket_s=0 disables.
    """
    pcm = np.asarray(pcm, dtype=np.float32).reshape(-1)
    n_true = cfg.n_hashprints(pcm.shape[0])
    if n_true == 0:
        return np.zeros((0, 2), dtype=np.uint32)
    if bucket_s:
        bucket = max(1, int(round(bucket_s * cfg.sample_rate)))
        padded = -(-pcm.shape[0] // bucket) * bucket
        if padded != pcm.shape[0]:
            pcm = np.concatenate([pcm, np.zeros(padded - pcm.shape[0], np.float32)])
    fn = _fingerprint_jit(cfg, pcm.shape[0], use_pallas)
    out = np.asarray(fn(jnp.asarray(pcm), jnp.asarray(filters, dtype=jnp.float32)))
    return out[:n_true]


@functools.lru_cache(maxsize=16)
def _fingerprint_batch_jit(cfg: HpfwConfig, n_samples: int, use_pallas: bool):
    """Jitted (B, S) PCM batch -> (B, N, 2) prints, bounded memory.

    lax.map over tracks keeps the per-track frame buffer (~tens of MB) from
    scaling with B while each track's NDFT GEMM already saturates the MXU —
    the TPU-native replacement for the reference's CPU thread pool over
    tracks (SURVEY.md §2.1 row 8).
    """
    single = _pipeline(cfg, use_pallas)

    def run(pcms, filters):
        return jax.lax.map(lambda p: single(p, filters), pcms)

    return jax.jit(run)


def fingerprint_batch(
    pcms: np.ndarray,
    filters: np.ndarray,
    cfg: HpfwConfig = DEFAULT_CONFIG,
    *,
    use_pallas: bool = False,
) -> np.ndarray:
    """Fingerprint a batch of equal-length tracks, shape (B, N, 2) uint32."""
    pcms = np.asarray(pcms, dtype=np.float32)
    if pcms.ndim != 2:
        raise ValueError(f"expected (B, S) PCM batch, got shape {pcms.shape}")
    if cfg.n_hashprints(pcms.shape[1]) == 0:
        return np.zeros((pcms.shape[0], 0, 2), dtype=np.uint32)
    fn = _fingerprint_batch_jit(cfg, pcms.shape[1], use_pallas)
    return np.asarray(fn(jnp.asarray(pcms), jnp.asarray(filters, dtype=jnp.float32)))


def scan_from_spec(spec, filters, cfg: HpfwConfig, factors: tuple,
                   interp: str = "linear"):
    """Jittable (F, n_bins) log-mag CQT frames -> (V, F-halo, 2) variants.

    The back half of the spec-level rendition scan. Each hypothesis is a
    tempo factor s (plain float, back-compatible) or a (s, roll) pair:

    - TEMPO: gather the frames back onto the catalog frame grid (frame
      i <- rendition frame i/s, the print_variants geometry), so context
      windows + delta lags are built on catalog-cadence frames — no
      within-context drift; the residual is sub-frame interpolation
      ("linear" blends adjacent frames, "nearest" rounds).
    - PITCH: re-key by rolling the log-mag bins (catalog bin k <- query
      bin k+roll, edge-clamped) — exact at 24 bins/octave where a key
      shift of roll*0.5 st IS a roll-bin translation of the CQT
      (match/stretch.py pitch_grid). BASELINE.json:11's pitch axis.

    Then re-run context assembly + projection + delta + sign + pack per
    hypothesis; the NDFT frontend (the expensive GEMM) is shared. Used by
    fingerprint_scan_batch (offline, from PCM) and StreamingSession's
    frame-ring scan (live)."""
    hyps = [h if isinstance(h, tuple) else (float(h), 0) for h in factors]
    f, nb = spec.shape
    base = jnp.arange(f, dtype=jnp.float32)
    bins = jnp.arange(nb, dtype=jnp.int32)

    def variant(s, roll):
        sv = spec if roll == 0 else spec[:, jnp.clip(bins + roll, 0, nb - 1)]
        pos = jnp.clip(base / s, 0.0, f - 1.0)
        if interp == "linear":
            i0 = jnp.floor(pos).astype(jnp.int32)
            i1 = jnp.minimum(i0 + 1, f - 1)
            frac = (pos - i0.astype(jnp.float32))[:, None]
            return sv[i0] * (1.0 - frac) + sv[i1] * frac
        return sv[jnp.round(pos).astype(jnp.int32)]

    specs = jnp.stack([variant(s, r) for s, r in hyps])  # (V, F, n_bins)
    return jax.vmap(
        lambda sv: fp_ops.fingerprint_from_spec(sv, filters, cfg))(specs)


def _scan_pipeline(cfg: HpfwConfig, factors: tuple, interp: str):
    """Un-jitted PCM -> (V, N, 2) catalog-tempo print variants: the NDFT
    frontend runs ONCE, then scan_from_spec's V cheap back-half passes."""

    def run(pcm, filters):
        spec = frontend.cqt(pcm, cfg)                       # (F, n_bins)
        return scan_from_spec(spec, filters, cfg, factors, interp)

    return run


@functools.lru_cache(maxsize=16)
def _fingerprint_scan_batch_jit(cfg: HpfwConfig, n_samples: int,
                                factors: tuple, interp: str):
    single = _scan_pipeline(cfg, factors, interp)

    def run(pcms, filters):
        return jax.lax.map(lambda p: single(p, filters), pcms)

    return jax.jit(run)


def scan_hypotheses(cfg: HpfwConfig, span=None, step=None,
                    pitch_span_bins=None) -> tuple:
    """The (tempo factor, pitch roll) product grid a scan call will use.

    Resolves span/step/pitch_span_bins against the config's knobs; the
    combined identity hypothesis (1.0, 0) always sits at index V//2.
    """
    from .match.stretch import hypothesis_grid, pitch_grid, stretch_grid

    span = span if span is not None else cfg.stretch_span
    step = step if step is not None else cfg.stretch_step
    p = (pitch_span_bins if pitch_span_bins is not None
         else cfg.pitch_span_bins)
    if span <= 0.0 and p <= 0:
        raise ValueError("scan needs a positive stretch span and/or pitch "
                         "span (set cfg.stretch_span / cfg.pitch_span_bins "
                         "or pass span= / pitch_span_bins=)")
    factors = stretch_grid(span, step) if span > 0.0 else [1.0]
    return tuple(hypothesis_grid(factors, pitch_grid(max(p, 0))))


def fingerprint_scan_batch(
    pcms: np.ndarray,
    filters: np.ndarray,
    cfg: HpfwConfig = DEFAULT_CONFIG,
    *,
    span: float | None = None,
    step: float | None = None,
    pitch_span_bins: int | None = None,
    interp: str = "linear",
) -> np.ndarray:
    """(B, S) PCM -> (B, V, N, 2) uint32: rendition-hypothesis variants.

    The quality rung of the live-rendition scan: V = (2*span/step + 1) *
    (2*pitch_span_bins + 1) catalog-tempo, catalog-key re-extractions per
    query, sharing one NDFT frontend pass (the scan costs V cheap
    projection GEMMs, not V full extractions). Feed the stack straight to
    TwoStageDB.match_batch — a 4-D query batch ranks each query's variant
    rows together. span/step/pitch_span_bins default to the config's
    stretch_span/stretch_step/pitch_span_bins knobs. The middle variant
    (index V//2) is always the combined identity hypothesis — exact plain
    extraction.
    """
    pcms = np.asarray(pcms, dtype=np.float32)
    if pcms.ndim != 2:
        raise ValueError(f"expected (B, S) PCM batch, got shape {pcms.shape}")
    if interp not in ("linear", "nearest"):
        raise ValueError(f"unknown interp {interp!r}")
    hyps = scan_hypotheses(cfg, span, step, pitch_span_bins)
    if cfg.n_hashprints(pcms.shape[1]) == 0:
        return np.zeros((pcms.shape[0], len(hyps), 0, 2), dtype=np.uint32)
    fn = _fingerprint_scan_batch_jit(cfg, pcms.shape[1], hyps, interp)
    return np.asarray(fn(jnp.asarray(pcms),
                         jnp.asarray(filters, dtype=jnp.float32)))


def rigid_confident(scores, n_prints: int, *, threshold: float = 0.62,
                    margin: float = 0.04, hi_sim: float = 0.78) -> bool:
    """The escalation gate: is a rigid ranked result CONFIDENT (final)?

    True when top-1 similarity >= hi_sim (no wrong rigid answer was
    measured above ~0.74 at 250k), or >= threshold with a top1->top2
    relative margin >= margin (wrong answers sit nearly TIED with their
    imposter tail — RESULTS r4 escalation probe). hi_sim <= 0 disables
    escalation entirely. Shared by match_scan_escalating and
    serve.EscalatingMatchServer so batch and serving gate identically.
    """
    if hi_sim <= 0.0:
        return True
    if not len(scores):
        return False
    s1 = float(scores[0])
    if s1 >= hi_sim * 64.0 * n_prints:
        return True
    if s1 < threshold * 64.0 * n_prints:
        return False
    s2 = float(scores[1]) if len(scores) > 1 else 0.0
    return (s1 - s2) / max(s1, 1e-9) >= margin


def scan_overrides(scan_scores, rigid_scores, *,
                   override: float = 0.02) -> bool:
    """The override rule: does a scan result REPLACE the rigid answer?

    Only when its top score beats the rigid top score by the relative
    `override` margin: variant competition beats a weak-but-correct rigid
    answer only barely (tied imposter tails), while a genuine rendition
    rescue clears it decisively (RESULTS r4, escalation-override)."""
    if not len(scan_scores):
        return False
    rigid_s = float(rigid_scores[0]) if len(rigid_scores) else 0.0
    return float(scan_scores[0]) > (1.0 + override) * rigid_s


def rigid_structured(query_prints, track_prints, offset, *,
                     inlier: float = 0.75, slope_tol: float = 0.005,
                     k: int = 8, band: int = 24, tol: float = 2.0,
                     length: int | None = None) -> bool:
    """Structural second opinion on a rigid answer (match/align.py).

    A genuine rigid match's per-sub-window best offsets lie on a ~zero-
    slope line (the rigid aligner already absorbed any sub-0.5% tempo
    residual); an imposter's scatter across the band. True when the
    Theil-Sen fit has inlier_frac >= `inlier` AND |slope| <= `slope_tol`
    (slope estimates the tempo error directly — a large slope means the
    answer needs the tempo scan even if collinear)."""
    from .match.align import structure_evidence

    ev = structure_evidence(np.asarray(query_prints),
                            np.asarray(track_prints), int(offset),
                            k=k, band=band, tol=tol, length=length)
    return ev["inlier_frac"] >= inlier and abs(ev["slope"]) <= slope_tol


def match_scan_escalating(
    pcms: np.ndarray,
    filters: np.ndarray,
    ts,
    cfg: HpfwConfig = DEFAULT_CONFIG,
    *,
    threshold: float = 0.62,
    margin: float = 0.04,
    hi_sim: float = 0.78,
    override: float = 0.02,
    span: float | None = None,
    step: float | None = None,
    pitch_span_bins: int | None = None,
    top_k: int | None = None,
    pool: int | None = None,
    batch: int = 10,
    retry_pool: int | None = None,
    retry_fine_window: int | None = None,
    structure_gate: float | None = None,
    structure_slope_tol: float = 0.005,
    override_unstructured: float | None = None,
    stats: dict | None = None,
) -> list:
    """Identity-first matching with tempo-scan ESCALATION — the production
    serving shape for live-rendition queries against a TwoStageDB.

    Every query is first extracted and matched rigid (one cheap dispatch).
    A query escalates — re-extracted as a spec-level rendition-hypothesis
    stack (fingerprint_scan_batch: tempo re-timing x pitch re-keying) and
    re-matched with every hypothesis ranking together — unless its rigid
    answer is CONFIDENT: similarity
    >= `hi_sim` (no wrong rigid answer was measured above ~0.74 at 250k),
    or similarity >= `threshold` with a top1->top2 relative margin >=
    `margin`. The margin is the discriminative half: at 250k real-audio
    tracks a wrong rigid answer (tempo-distorted query) sits in a dense
    imposter tail whose top scores are both HIGH (0.62+ of perfect — an
    absolute threshold alone fails, measured; escalation_probe.py) and
    nearly TIED (margin p50 0.007), while a true match clears its
    runner-up (margin p50 0.090).

    The scan result then only OVERRIDES the rigid answer when its top
    score beats the rigid top score by the relative `override` margin:
    variant competition beats a weak-but-correct rigid answer only
    BARELY (tied imposter tails), while a genuine tempo rescue clears the
    rigid score decisively — so escalation can recover distorted queries
    without ever degrading in-tempo ones (measured: always-scan and
    unconditional-replace both cost ~2 points of noise-only top-1).

    `hi_sim <= 0` disables escalation entirely (every query is rigid-only,
    including ones whose rigid result set is empty) — the explicit "pin
    exact rigid behavior" switch for deployments that never see
    tempo-distorted queries.

    Two cheaper rungs sit between "confident" and the rendition scan:

    - `retry_pool` / `retry_fine_window`: an unconfident query is first
      re-matched RIGID with a deeper candidate pool / wider fine window
      (one extra dispatch, no variant competition). Deepening the
      two-stage search can only raise a true track's score, so the retry
      result replaces the first unconditionally; a now-confident retry
      skips the scan.
    - `structure_gate`: a still-unconfident rigid answer is accepted
      WITHOUT scanning when its sub-window offset structure is collinear
      at ~zero slope (rigid_structured: inlier_frac >= structure_gate,
      |slope| <= structure_slope_tol) — score arithmetic says "tied with
      the imposter tail", alignment geometry says "real" (match/align.py;
      imposters' per-window argmaxes scatter). Host-side, a few 10 s of
      microseconds per candidate; needs host print rows (ts.db.prints).

    `override_unstructured` (only meaningful with `structure_gate`): the
    override bar applied to queries whose rigid answer FAILED the
    structure gate. The +2% default bar exists to protect weak-but-
    correct rigid answers from tied variant competition — but a rigid
    answer the gate just measured as geometrically scattered is almost
    never correct (stretch/F median inlier 0.375 at 250k, RESULTS r5),
    so for those the bar only blocks genuine rescues. Set it to 0.0 to
    let the scan win on any score improvement once structure has already
    voted against the rigid answer.

    Returns match_batch-shaped results: a list of (ids, scores, offsets).
    If `stats` is given it is filled with {"escalated": [indices],
    "overridden": [indices], "retried": [indices],
    "structure_kept": [indices]}.
    """
    pcms = np.asarray(pcms, dtype=np.float32)
    if pcms.ndim != 2:
        raise ValueError(f"expected (B, S) PCM batch, got shape {pcms.shape}")
    prints = fingerprint_batch(pcms, filters, cfg)
    n = prints.shape[1]
    k_int = max(2, top_k if top_k is not None else cfg.top_k)
    results = []
    for i in range(0, prints.shape[0], batch):
        results.extend(ts.match_batch(prints[i:i + batch], top_k=k_int,
                                      pool=pool, stretch_span=0.0))

    def unconfident(items):
        return [i for i in items
                if not rigid_confident(results[i][1], n, threshold=threshold,
                                       margin=margin, hi_sim=hi_sim)]

    low = unconfident(range(len(results)))
    if stats is not None:
        stats["escalated"] = []
        stats["overridden"] = []
        stats["retried"] = list(low) if (retry_pool or retry_fine_window) \
            else []
        stats["structure_kept"] = []
    if low and (retry_pool or retry_fine_window):
        for i in range(0, len(low), batch):
            chunk = low[i:i + batch]
            retried = ts.match_batch(prints[chunk], top_k=k_int,
                                     pool=retry_pool or pool,
                                     fine_window=retry_fine_window,
                                     stretch_span=0.0)
            for j, r in zip(chunk, retried):
                results[j] = r
        low = unconfident(low)
    if low and structure_gate is not None:
        kept, still = [], []
        for i in low:
            ids, sc, off = results[i]
            if len(ids) and rigid_structured(
                    prints[i], ts.db.prints[ts.db.index_of(ids[0])], off[0],
                    inlier=structure_gate, slope_tol=structure_slope_tol,
                    length=int(ts.db.lengths[ts.db.index_of(ids[0])])):
                kept.append(i)
            else:
                still.append(i)
        low = still
        if stats is not None:
            stats["structure_kept"] = kept
    if stats is not None:
        stats["escalated"] = list(low)
    if low:
        stacks = fingerprint_scan_batch(pcms[low], filters, cfg,
                                        span=span, step=step,
                                        pitch_span_bins=pitch_span_bins)
        # B*V*pool rides in the fine kernel's SMEM candidate window; size
        # the scan dispatches so bigger hypothesis grids batch fewer
        # queries (~70 variant rows per dispatch at the default pool).
        sbatch = max(1, min(batch, 70 // stacks.shape[1]))
        rescued = []
        for i in range(0, stacks.shape[0], sbatch):
            rescued.extend(ts.match_batch(stacks[i:i + sbatch], top_k=k_int,
                                          pool=pool))
        ov = (override_unstructured
              if (structure_gate is not None
                  and override_unstructured is not None) else override)
        for i, r in zip(low, rescued):
            if scan_overrides(r[1], results[i][1], override=ov):
                results[i] = r
                if stats is not None:
                    stats["overridden"].append(i)
    k = top_k if top_k is not None else cfg.top_k
    if k < k_int:   # the internal rank ran deeper for the margin test
        results = [(ids[:k], sc[:k], off[:k]) for ids, sc, off in results]
    return results


def fingerprint_stream(
    batches,
    filters: np.ndarray,
    cfg: HpfwConfig = DEFAULT_CONFIG,
    *,
    use_pallas: bool = False,
):
    """Fingerprint an iterator of equal-shaped (B, S) PCM batches with
    double-buffered host->device streaming (SURVEY.md §7.1 step 6): batch
    i+1 uploads asynchronously while batch i computes, so extraction
    overlaps the host link instead of alternating with it. Yields (B, N, 2)
    uint32 per input batch, in order.
    """
    filters_dev = jnp.asarray(filters, dtype=jnp.float32)
    fn = None
    pending = []  # [(device_input, result_future)]
    for batch in batches:
        batch = np.asarray(batch, dtype=np.float32)
        if fn is None:
            fn = _fingerprint_batch_jit(cfg, batch.shape[1], use_pallas)
        dev = jnp.asarray(batch)          # async H2D
        pending.append(fn(dev, filters_dev))   # async dispatch
        if len(pending) >= 2:             # keep two batches in flight
            yield np.asarray(pending.pop(0))
    for r in pending:
        yield np.asarray(r)


@functools.lru_cache(maxsize=16)
def _fingerprint_multi_jit(cfg: HpfwConfig, n_samples: int, n_banks: int):
    """PCM -> (A, N, 2) prints under A filter banks, CQT computed once.

    The per-bank projections fuse into ONE (M, D) @ (D, A*64) GEMM, then
    delta/sign/pack vmap over banks. Bit-identical to fingerprinting with
    each bank separately (each output column's dot is independent)."""

    def run(pcm, filter_stack):           # filter_stack: (A, D, 64)
        spec = frontend.cqt(pcm, cfg)
        a, d, nf = filter_stack.shape
        wide = jnp.transpose(filter_stack, (1, 0, 2)).reshape(d, a * nf)
        y = fp_ops.project_features(spec, wide, cfg)      # (M, A*64)
        y = y.reshape(-1, a, nf).transpose(1, 0, 2)       # (A, M, 64)
        return jax.vmap(
            lambda yy: fp_ops.binarize_and_pack(fp_ops.delta(yy, cfg), cfg)
        )(y)

    return jax.jit(run)


def fingerprint_multi(
    pcm: np.ndarray,
    filter_stack: np.ndarray,
    cfg: HpfwConfig = DEFAULT_CONFIG,
) -> np.ndarray:
    """Fingerprint one clip under A filter banks -> (A, N, 2) uint32.

    The known-artist path (hpfw_tpu.artist): adding banks widens one MXU
    GEMM instead of re-running the pipeline per artist.
    """
    pcm = np.asarray(pcm, dtype=np.float32).reshape(-1)
    filter_stack = np.asarray(filter_stack, dtype=np.float32)
    if filter_stack.ndim != 3:
        raise ValueError(f"expected (A, D, 64) filter stack, got {filter_stack.shape}")
    n_true = cfg.n_hashprints(pcm.shape[0])
    if n_true == 0:
        return np.zeros((filter_stack.shape[0], 0, 2), dtype=np.uint32)
    fn = _fingerprint_multi_jit(cfg, pcm.shape[0], filter_stack.shape[0])
    out = np.asarray(fn(jnp.asarray(pcm), jnp.asarray(filter_stack)))
    return out[:, :n_true]


def match(
    query_prints: np.ndarray,
    db: "FingerprintDB",
    *,
    top_k: int | None = None,
):
    """Rank DB tracks against a query print sequence.

    Returns (track_ids, scores, offsets) sorted by descending similarity,
    ties broken by ascending track index — identical to oracle.match.
    """
    top_k = top_k if top_k is not None else db.cfg.top_k
    q = jnp.asarray(np.asarray(query_prints, dtype=np.uint32))
    prints, lengths = db.device_arrays()
    if q.shape[0] > prints.shape[1]:
        # Oracle semantics for tracks shorter than the query are truncated
        # head overlap at offset 0; padding the print array up to the query
        # length makes the masked scan reproduce that exactly.
        prints = jnp.pad(prints, ((0, 0), (0, q.shape[0] - prints.shape[1]), (0, 0)))
    # One host materialization (each D2H sync costs a full roundtrip on a
    # tunneled host link).
    both = np.asarray(_score_tracks_stacked(q, prints, lengths))
    order, s, o = matcher.rank(both[0], both[1], top_k)
    return [db.track_ids[i] for i in order], s, o


@jax.jit
def _score_tracks_stacked(q, prints, lengths):
    scores, offsets = matcher.score_tracks(q, prints, lengths)
    return jnp.stack([scores, offsets])


class FingerprintDB:
    """In-memory fingerprint database: packed prints + config + filters.

    The reference analog is its serialized catalog cache (SURVEY.md §2.1
    row 6). The config and filters ride along so a DB is self-describing
    (SURVEY.md §5 "Config/flag system").
    """

    def __init__(self, cfg: HpfwConfig, filters: np.ndarray,
                 track_ids: list[str], prints: np.ndarray, lengths: np.ndarray):
        self.cfg = cfg
        self.filters = np.asarray(filters, dtype=np.float32)
        self.track_ids = list(track_ids)
        self.prints = np.asarray(prints, dtype=np.uint32)    # (T, L, 2) padded
        self.lengths = np.asarray(lengths, dtype=np.int32)   # (T,)
        self._device = None
        self._id_index = None

    def index_of(self, track_id: str) -> int:
        """Track-id -> row index (lazy dict; O(1) per lookup after the
        first call — match results carry ids, structure evidence needs
        print rows)."""
        if self._id_index is None:
            self._id_index = {t: i for i, t in enumerate(self.track_ids)}
        return self._id_index[track_id]

    def device_arrays(self):
        if self._device is None:
            self._device = (jnp.asarray(self.prints), jnp.asarray(self.lengths))
        return self._device

    @property
    def n_tracks(self) -> int:
        return len(self.track_ids)

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            format_version=np.int32(1),
            config_json=np.frombuffer(self.cfg.to_json().encode(), dtype=np.uint8),
            filters=self.filters,
            track_ids=np.array(self.track_ids),
            prints=self.prints,
            lengths=self.lengths,
        )

    @classmethod
    def load(cls, path: str) -> "FingerprintDB":
        z = np.load(path, allow_pickle=False)
        if int(z["format_version"]) != 1:
            raise ValueError(
                f"unsupported DB format version {int(z['format_version'])}")
        cfg = HpfwConfig.from_json(bytes(z["config_json"].tobytes()).decode())
        return cls(cfg, z["filters"], [str(t) for t in z["track_ids"]],
                   z["prints"], z["lengths"])


def build_db(
    catalog: dict[str, np.ndarray] | list[np.ndarray],
    filters: np.ndarray,
    cfg: HpfwConfig = DEFAULT_CONFIG,
    *,
    use_pallas: bool = False,
) -> FingerprintDB:
    """Fingerprint a catalog of tracks into a matchable database."""
    if isinstance(catalog, dict):
        ids, tracks = list(catalog.keys()), list(catalog.values())
    else:
        ids = [str(i) for i in range(len(catalog))]
        tracks = list(catalog)
    fps = [fingerprint(t, filters, cfg, use_pallas=use_pallas) for t in tracks]
    prints, lengths = matcher.pad_prints(fps, min_len=1)
    return FingerprintDB(cfg, filters, ids, prints, lengths)


def build_db_from_files(
    paths: list[str],
    filters: np.ndarray,
    cfg: HpfwConfig = DEFAULT_CONFIG,
    *,
    n_threads: int = 0,
    batch: int = 8,
    bucket_seconds: float = 30.0,
    use_pallas: bool = False,
    track_ids: list[str] | None = None,
    progress=None,
) -> FingerprintDB:
    """Fingerprint a catalog of audio FILES into a matchable database.

    The full ingestion pipeline (SURVEY.md §3.2): the threaded native
    decoder (io/ingest.py -> native hpfw_ingest_files) decodes + resamples
    chunk i+1 on host CPU threads while chunk i extracts on the TPU —
    decode and extraction overlap instead of alternating. Tracks are
    zero-padded up to multiples of `bucket_seconds` so the jit cache holds
    one extraction program per bucket length; padding does not change the
    emitted prints (prints only consume frames fully inside the true
    track, asserted by tests/test_ingest.py against build_db).
    """
    from concurrent.futures import ThreadPoolExecutor

    from .io.ingest import load_files

    filters_dev = jnp.asarray(filters, dtype=jnp.float32)
    bucket = max(int(bucket_seconds * cfg.sample_rate), cfg.min_samples())
    fns: dict[int, object] = {}
    fps: list[np.ndarray | None] = [None] * len(paths)
    chunk = max(batch * 4, 32)
    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(load_files, list(paths[:chunk]), cfg, n_threads)
        start = 0
        while start < len(paths):
            pcms = fut.result()
            nxt = start + len(pcms)
            if nxt < len(paths):
                fut = ex.submit(load_files, list(paths[nxt:nxt + chunk]),
                                cfg, n_threads)
            order = sorted(range(len(pcms)), key=lambda i: pcms[i].shape[0])
            for g0 in range(0, len(order), batch):
                grp = order[g0:g0 + batch]
                longest = max(pcms[i].shape[0] for i in grp)
                s = -(-max(longest, cfg.min_samples()) // bucket) * bucket
                arr = np.zeros((batch, s), np.float32)
                for row, i in enumerate(grp):
                    arr[row, : pcms[i].shape[0]] = pcms[i]
                fn = fns.get(s)
                if fn is None:
                    fn = fns[s] = _fingerprint_batch_jit(cfg, s, use_pallas)
                out = np.asarray(fn(jnp.asarray(arr), filters_dev))
                for row, i in enumerate(grp):
                    n_true = cfg.n_hashprints(pcms[i].shape[0])
                    fps[start + i] = out[row, :n_true]
            if progress is not None:
                progress(nxt, len(paths))
            start = nxt
    ids = list(track_ids) if track_ids is not None else [str(p) for p in paths]
    prints, lengths = matcher.pad_prints(fps, min_len=1)
    return FingerprintDB(cfg, filters, ids, prints, lengths)


def learn_filters(
    corpus: list[np.ndarray],
    cfg: HpfwConfig = DEFAULT_CONFIG,
) -> np.ndarray:
    """Learn the 64 spectro-temporal projection filters on device.

    Streaming covariance accumulation (rank-k GEMM updates on the MXU) +
    eigh — see learn/pca.py. Returns (context_dim, 64) float32.
    """
    from .learn import pca

    return pca.learn_filters(corpus, cfg)
