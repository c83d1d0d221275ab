"""Two-stage coarse->fine matcher for catalog-scale databases (1M tracks).

Stage 1 (coarse, MXU): majority-vote coarse prints (ops/coarse.py) for every
track are scanned against the coarse query with one int8 +/-1 correlation
GEMM — all tracks, all coarse offsets, exact int32 arithmetic. Cost shrinks
by stride^2 vs the full scan and runs at matrix-unit speed.

Stage 2 (fine, exact): the top `pool` tracks by coarse peak are rescanned
with the exact XOR+popcount scoring, restricted to a +/-fine_window offset
band around each coarse peak. Scores returned are EXACT Hamming similarities
(identical semantics to match/matcher.py on the evaluated offsets).

The two-stage result is exact-on-pool: if the coarse stage ranks the true
track into the pool (measured by the robustness eval, BASELINE config 5),
its reported score/offset equals the exhaustive scan's. ShardedTwoStage runs
the same code per mesh shard with an all-gather candidate merge, so a
1M-track catalog splits into per-chip shards scanned in parallel
(SURVEY.md §3.3 rebuild).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import coarse as coarse_ops
from ..parallel.mesh import DB_AXIS, pad_tracks_to_mesh
from .stretch import print_variants, stretch_grid


def _fine_rescan(query, cand_prints, cand_lengths, o_centers, *, fine_window):
    """Exact masked scores for offsets o_centers-fw .. o_centers+fw.

    query (N, 2) uint32; cand_prints (K, L, 2); o_centers (K,) int32.
    Returns (scores (K,), offsets (K,)) — best exact score in the band,
    first offset on ties.
    """
    k, l, _ = cand_prints.shape
    n = query.shape[0]
    fw = fine_window
    span = 2 * fw + n
    o_lo = jnp.clip(o_centers - fw, 0, jnp.maximum(l - span, 0))

    def one(prints_row, length, lo):
        win = jax.lax.dynamic_slice_in_dim(prints_row, lo, span, axis=0)
        idx = jnp.arange(2 * fw + 1, dtype=jnp.int32)[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]
        wins = win[idx]                                    # (2fw+1, N, 2)
        x = jnp.bitwise_xor(wins, query[None])
        sim = 64 - jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
        pos = lo + idx
        sim = jnp.where(pos < length, sim, 0)
        score = jnp.sum(sim, axis=-1)                      # (2fw+1,)
        o = lo + jnp.arange(2 * fw + 1, dtype=jnp.int32)
        valid = o <= jnp.maximum(length - n, 0)
        score = jnp.where(valid, score, -1)
        best = jnp.max(score)
        first = jnp.min(jnp.where(score == best, o, jnp.int32(2 ** 30)))
        return best, first

    return jax.vmap(one)(cand_prints, cand_lengths, o_lo)


_POOL_ROWS = 64

# Resident phase-stack bytes allowed per stacked coarse kernel call; larger
# batch x phases products are chunked into multiple DB sweeps (see
# _coarse_best_batch_phased). ~5 MB leaves room in the ~16 MB scoped-vmem
# arena for the double-buffered DB tile and the unrolled GEMM temporaries
# (an 18.6 MB compile OOM was observed at a 9.96 MB stack).
_PHASED_STACK_BUDGET = 5 * 2 ** 20


def _pool_candidates(best_corr, pool: int):
    """EXACT top-`pool` track indices, padded to a multiple of 8 (the Pallas
    candidate tile) by repeating the first candidate; duplicates are
    deduplicated in the host-side ranking.

    Exact lax.top_k (not approx_max_k): exact pooling is what the module
    docstring's exact-on-pool guarantee rests on, and it measures FASTER on
    the v5e at catalog scale (benchmarks/profile_stages.py). At catalog
    sizes the selection runs TWO-LEVEL — per-row top-k over a (64, T/64)
    reshape, then top-k of the 64k survivors — which is ~1.5x faster than
    one flat top_k at 100k+ scores (benchmarks/tune_matcher.py) and returns
    the identical candidate list: any global top-k element is a top-k
    element of its row, rows partition the index space in ascending order,
    and lax.top_k breaks ties toward lower indices at both levels."""
    t = best_corr.shape[0]
    k0 = max(1, min(pool, t))
    k = -(-k0 // 8) * 8
    kk = min(k, t)
    if t % _POOL_ROWS == 0 and t // _POOL_ROWS >= kk and t >= 2 * _POOL_ROWS * kk:
        cols = t // _POOL_ROWS
        vals, idx = jax.lax.top_k(best_corr.reshape(_POOL_ROWS, cols), kk)
        gidx = idx.astype(jnp.int32) + (
            jnp.arange(_POOL_ROWS, dtype=jnp.int32) * cols)[:, None]
        _, i2 = jax.lax.top_k(vals.reshape(-1), kk)
        cand = jnp.take(gidx.reshape(-1), i2)
    else:
        _, cand = jax.lax.top_k(best_corr, kk)
        cand = cand.astype(jnp.int32)
    if k > kk:
        cand = jnp.concatenate([cand, jnp.broadcast_to(cand[:1], (k - kk,))])
    return cand


def _rank_dedup(scores, idx, offs, track_ids, top_k, aux=None):
    """Host ranking: desc score, asc index, duplicates dropped. aux: an
    optional per-candidate array returned ranked alongside (e.g. tempo-
    variant provenance)."""
    order = np.lexsort((idx, -scores))
    seen = set()
    keep = []
    for i in order:
        if int(idx[i]) not in seen:
            seen.add(int(idx[i]))
            keep.append(i)
        if len(keep) == top_k:
            break
    keep = np.array(keep, dtype=np.int64)
    out = ([track_ids[i] for i in idx[keep]], scores[keep], offs[keep])
    return out if aux is None else out + (aux[keep],)


def _two_stage_local(query, query_c, prints, lengths, db_c,
                     *, stride, pool, fine_window):
    """One shard's coarse scan + fine rescan. Returns (scores, idx, offsets)."""
    t = prints.shape[0]
    corr = coarse_ops.coarse_correlation(query_c, db_c)     # (T, Ac) int32
    best_corr = jnp.max(corr, axis=1)
    best_a = jnp.argmax(corr, axis=1).astype(jnp.int32)
    k = min(pool, t)
    _, cand = jax.lax.top_k(best_corr, k)
    cand = cand.astype(jnp.int32)
    scores, offsets = _fine_rescan(
        query,
        prints[cand],
        lengths[cand],
        best_a[cand] * stride,
        fine_window=fine_window,
    )
    return scores, cand, offsets


class TwoStageDB:
    """Catalog-scale database: packed prints + int8 coarse prints on device.

    mesh=None keeps everything on the default device; with a mesh, both
    arrays shard over tracks and matching runs per shard with an all-gather
    candidate merge.

    On TPU both stages run as Pallas kernels: the coarse scan streams the
    flat int8 coarse DB once and fuses the phase GEMM with max/argmax
    (ops/pallas_coarse.py — the XLA conv formulation reads ~4x the bytes),
    and the fine stage DMAs each candidate window straight from HBM
    (ops/pallas_fine.py — XLA's row gather is orders of magnitude too slow
    for that access pattern). Elsewhere the XLA twins are used.
    use_pallas_fine / use_pallas_coarse override the defaults.
    """

    def __init__(self, db, *, stride: int | None = None, mesh: Mesh | None = None,
                 use_pallas_fine: bool | None = None,
                 use_pallas_coarse: bool | None = None,
                 coarse_kind: str | None = None,
                 coarse_channels: int | None = None,
                 coarse_tile: int | None = None,
                 pallas_interpret: bool = False,
                 keep_host: bool = False,
                 query_phases: int | None = None,
                 prefilter: int | None = None,
                 prefilter_phases: int | None = None,
                 prefilter_channels: int | None = None,
                 prefilter_pack4: bool | None = None):
        self.db = db
        self._host_state = None
        cfg = db.cfg
        self.stride = stride if stride is not None else cfg.db_downsample
        self.coarse_kind = (coarse_kind if coarse_kind is not None
                            else getattr(cfg, "coarse_kind", "sign"))
        self.coarse_channels = (coarse_channels if coarse_channels is not None
                                else getattr(cfg, "coarse_channels", 64))
        self.query_phases = (query_phases if query_phases is not None
                             else getattr(cfg, "coarse_query_phases", 1))
        self.prefilter = (prefilter if prefilter is not None
                          else getattr(cfg, "coarse_prefilter", 0))
        self.prefilter_phases = (
            prefilter_phases if prefilter_phases is not None
            else getattr(cfg, "coarse_prefilter_phases", 1))
        pc = (prefilter_channels if prefilter_channels is not None
              else getattr(cfg, "coarse_prefilter_channels", 0))
        self.prefilter_channels = pc if pc else self.coarse_channels
        if self.prefilter_channels > self.coarse_channels:
            raise ValueError("prefilter_channels must be <= coarse_channels")
        self.prefilter_pack4 = bool(
            prefilter_pack4 if prefilter_pack4 is not None
            else getattr(cfg, "coarse_prefilter_pack4", False))
        if self.stride % self.query_phases:
            raise ValueError("query_phases must divide the coarse stride")
        if self.prefilter_phases > 1 and self.stride % self.prefilter_phases:
            raise ValueError("prefilter_phases must divide the coarse stride")
        self.mesh = mesh
        self.pallas_interpret = pallas_interpret
        if use_pallas_fine is None:
            use_pallas_fine = jax.default_backend() == "tpu"
        self.use_pallas_fine = use_pallas_fine
        if use_pallas_coarse is None:
            use_pallas_coarse = use_pallas_fine
        # The fused coarse kernel stores the coarse DB flat, which only the
        # Pallas match paths consume.
        use_pallas_coarse = use_pallas_coarse and use_pallas_fine
        self.use_pallas_coarse = use_pallas_coarse
        prints = db.prints
        lengths = db.lengths
        t = prints.shape[0]
        if coarse_tile is None:
            # Largest vmem-safe tile: HBM reads dominate the coarse scan and
            # bigger blocks DMA faster (ops/pallas_coarse.auto_track_tile).
            from ..ops.pallas_coarse import auto_track_tile

            c = self.coarse_channels
            unit_lc = 128 // int(np.gcd(c, 128))
            lc_pad = -(-(prints.shape[1] // self.stride) // unit_lc) * unit_lc
            coarse_tile = auto_track_tile(lc_pad * c) if t >= 4096 else 128
        self.coarse_tile = coarse_tile
        # Track-count padding: whole tracks per mesh shard, and whole track
        # tiles per shard for the fused coarse kernel (zero tracks score 0
        # and fall to the n_real cut).
        unit = mesh.devices.size if mesh is not None else 1
        if use_pallas_coarse:
            unit *= coarse_tile
        t_pad = -(-t // unit) * unit
        if t_pad != t:
            prints = np.concatenate(
                [prints, np.zeros((t_pad - t,) + prints.shape[1:], prints.dtype)])
            lengths = np.concatenate([lengths, np.zeros(t_pad - t, lengths.dtype)])
        # Coarse prints are derived on device once at load time, in track
        # chunks: the unpack intermediate is ~256x the packed size, so a
        # whole-catalog unpack would blow HBM at 100k+ tracks.
        coarse_fn = jax.jit(
            functools.partial(coarse_ops.coarse_pm1, stride=self.stride,
                              kind=self.coarse_kind,
                              channels=self.coarse_channels)
        )
        prints_dev = jnp.asarray(prints)
        chunk = max(1, min(t, 134_217_728 // max(prints.shape[1] * 64, 1)))
        parts = [coarse_fn(prints_dev[i:i + chunk])
                 for i in range(0, prints.shape[0], chunk)]
        coarse = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        del parts
        # Zero out padded coarse windows (majority of all-zero packed prints
        # is -1, which would correlate; real scan masks via zeroing).
        lc = coarse.shape[1]
        mask = (jnp.arange(lc)[None, :] < (jnp.asarray(lengths) // self.stride)[:, None])
        coarse = jnp.where(mask[..., None], coarse, 0).astype(jnp.int8)
        # Drain the queued derivation NOW: under this relay's deferred
        # dispatch every queued op's output buffer is allocated up front,
        # so letting chunks + concat + mask + the flatten below all queue
        # unexecuted puts ~13 GB of intermediates next to the 5 GB packed
        # prints and OOMs a 16 GB chip at 250k tracks (measured round 4).
        # One sync here bounds the peak at prints + one coarse copy.
        coarse = jax.block_until_ready(coarse)
        self.lc_true = lc
        coarse1 = None
        if not use_pallas_coarse:
            # The channel-subset pass-1 DB only exists on the flat-layout
            # Pallas path (prefilter itself raises elsewhere); collapse the
            # knobs so save()/load() and jit cache keys stay consistent.
            self.prefilter_channels = self.coarse_channels
            self.prefilter_pack4 = False
        if use_pallas_coarse:
            from ..ops.pallas_coarse import flatten_coarse, pack_coarse_nibbles

            if self.prefilter_channels < self.coarse_channels:
                # Channel-subset pass-1 DB: channels are PCA-ordered, so the
                # C1 prefix is each window's most informative bits — the
                # HBM-bound pass-1 sweep reads C1/C of the bytes.
                coarse1 = flatten_coarse(coarse[..., : self.prefilter_channels])
            coarse = flatten_coarse(coarse)
            if self.prefilter_pack4:
                # Nibble-pack the pass-1 sweep's rows: HALF the HBM bytes
                # again (the sweep is bandwidth-bound), bit-identical
                # ranking (ops/pallas_coarse.pack_coarse_nibbles).
                coarse1 = pack_coarse_nibbles(
                    coarse1 if coarse1 is not None else coarse)
        if mesh is not None:
            shard = NamedSharding(mesh, P(DB_AXIS))
            self.lengths = jax.device_put(jnp.asarray(lengths), shard)
            self.db_c = jax.device_put(coarse, shard)
            self.db_c1 = (self.db_c if coarse1 is None
                          else jax.device_put(coarse1, shard))
            if use_pallas_fine:
                # Flat word planes, sharded over tracks: T_pad divides the
                # mesh, each shard's chunk of the 1-D plane holds whole
                # track slots, so every shard runs the same Pallas fine
                # kernel on purely local data.
                from ..ops.pallas_fine import plane_pad

                d0, d1, lpad = plane_pad(prints)
                self.lpad = lpad
                self.l_true = prints.shape[1]
                self.d0 = jax.device_put(d0, NamedSharding(mesh, P(DB_AXIS)))
                self.d1 = jax.device_put(d1, NamedSharding(mesh, P(DB_AXIS)))
                self.prints = None
            else:
                self.prints = jax.device_put(prints_dev, shard)
        else:
            self.prints = prints_dev
            self.lengths = jnp.asarray(lengths)
            self.db_c = coarse
            self.db_c1 = self.db_c if coarse1 is None else jnp.asarray(coarse1)
            if use_pallas_fine:
                # Flat split word planes (see ops/pallas_fine.py layout
                # constraints). Packed prints leave the device BEFORE the
                # planes upload — holding both at once OOMs at 200k tracks —
                # and slots pack tight (cross-slot reads are masked).
                from ..ops.pallas_fine import plane_pad

                self.prints = None
                del prints_dev
                # Drain the queued coarse derivation BEFORE uploading the
                # planes: under this relay's deferred dispatch the packed-
                # prints buffer only frees once its queued consumers run,
                # and letting the 6+ GB plane upload overlap the 5+ GB
                # prints (+ coarse intermediates) OOMs a 16 GB chip at
                # 250k tracks (measured round 4 — the whole lazy build
                # materialized at the first downstream sync otherwise).
                jax.block_until_ready(self.db_c)
                d0, d1, self.lpad = plane_pad(prints, tight=True)
                self.l_true = prints.shape[1]
                self.d0 = jnp.asarray(d0)
                self.d1 = jnp.asarray(d1)
        self.n_real = t
        if keep_host:
            # Host copies retained so save() never pulls the big planes back
            # over the (slow) device link; save() drops them afterwards.
            state = {"lengths": np.asarray(lengths), "coarse": np.asarray(coarse)}
            if coarse1 is not None:
                state["coarse1"] = np.asarray(coarse1)
            if self.use_pallas_fine:
                state["d0"], state["d1"] = d0, d1
            else:
                state["prints"] = np.asarray(prints)
            self._host_state = state

    # -- derived-state persistence (SURVEY.md §5 checkpoint/resume) --------
    #
    # The reference memory-maps its serialized catalog cache; the TPU-native
    # equivalent is the DERIVED device layout — flat word planes d0/d1, the
    # flattened int8 coarse DB, padded lengths — written as raw .npy flat
    # binaries (mmap-able) plus a JSON manifest of the layout parameters.
    # load() then goes disk -> (mmap) -> device with no derivation pass and
    # no derivation compiles, which together with the persistent XLA compile
    # cache (see warmup()) turns process-start -> first-query from minutes
    # of re-derivation + compile into I/O time.

    _CACHE_VERSION = 1

    def save(self, path: str) -> None:
        """Write the derived two-stage state as flat binaries + manifest."""
        import json
        import os

        os.makedirs(path, exist_ok=True)
        hs = self._host_state or {}
        manifest = {
            "format_version": self._CACHE_VERSION,
            "stride": int(self.stride),
            "coarse_kind": self.coarse_kind,
            "coarse_channels": int(self.coarse_channels),
            "prefilter_channels": int(self.prefilter_channels),
            "prefilter_pack4": bool(self.prefilter_pack4),
            "coarse_tile": int(self.coarse_tile),
            "lc_true": int(self.lc_true),
            "n_real": int(self.n_real),
            "use_pallas_fine": bool(self.use_pallas_fine),
            "use_pallas_coarse": bool(self.use_pallas_coarse),
            "mesh_size": int(self.mesh.devices.size) if self.mesh is not None else 0,
            "config_json": self.db.cfg.to_json(),
        }

        def dump(name, arr):
            np.save(os.path.join(path, name + ".npy"), np.asarray(arr))

        if self.use_pallas_fine:
            manifest["lpad"] = int(self.lpad)
            manifest["l_true"] = int(self.l_true)
            dump("d0", hs.get("d0", self.d0))
            dump("d1", hs.get("d1", self.d1))
        else:
            dump("prints", hs.get("prints", self.prints))
        dump("coarse", hs.get("coarse", self.db_c))
        if self.db_c1 is not self.db_c:
            dump("coarse1", hs.get("coarse1", self.db_c1))
        dump("lengths", hs.get("lengths", self.lengths))
        dump("filters", self.db.filters)
        dump("track_ids", np.array(self.db.track_ids))
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        self._host_state = None

    @classmethod
    def load(cls, path: str, *, mesh: Mesh | None = None,
             pallas_interpret: bool = False, mmap: bool = True,
             install_cache: bool = True) -> "TwoStageDB":
        """Reconstruct a TwoStageDB from save() output without re-deriving.

        The cache layout is sharding-specific: a cache written without a
        mesh loads without one, a mesh-built cache needs a mesh of the same
        size (the flat plane padding differs between the two).

        install_cache=True additionally installs any compile-cache entries
        bundled by bundle_compile_cache() into this process's persistent
        cache (no-op on runtime mismatch or if none were shipped), so a
        fresh machine's first query skips remote compilation.
        """
        import json
        import os

        if install_cache:
            from ..utils import cache as cache_util

            try:
                n = cache_util.install_bundle(path)
                if n:
                    import logging

                    logging.getLogger(__name__).info(
                        "installed %d bundled compile-cache entries", n)
            except Exception:
                pass  # the bundle is an optimization only

        from ..api import FingerprintDB

        with open(os.path.join(path, "manifest.json")) as f:
            m = json.load(f)
        if m["format_version"] != cls._CACHE_VERSION:
            raise ValueError(
                f"unsupported two-stage cache version {m['format_version']}")
        mesh_size = mesh.devices.size if mesh is not None else 0
        if mesh_size != m["mesh_size"]:
            raise ValueError(
                f"cache was built for mesh size {m['mesh_size']}, "
                f"loading with mesh size {mesh_size}; rebuild the cache for "
                "this layout")
        mm = "r" if mmap else None

        def grab(name):
            return np.load(os.path.join(path, name + ".npy"), mmap_mode=mm)

        from ..config import HpfwConfig

        cfg = HpfwConfig.from_json(m["config_json"])
        lengths = grab("lengths")
        n_real = m["n_real"]
        db = FingerprintDB(cfg, np.load(os.path.join(path, "filters.npy")),
                           [str(t) for t in np.load(os.path.join(path, "track_ids.npy"))],
                           np.zeros((n_real, 0, 2), np.uint32),
                           np.asarray(lengths[:n_real]))
        self = cls.__new__(cls)
        self.db = db
        self._host_state = None
        self.stride = m["stride"]
        self.coarse_kind = m["coarse_kind"]
        self.coarse_channels = m["coarse_channels"]
        self.prefilter_channels = m.get("prefilter_channels",
                                        m["coarse_channels"])
        self.prefilter_pack4 = bool(m.get("prefilter_pack4", False))
        self.coarse_tile = m["coarse_tile"]
        self.lc_true = m["lc_true"]
        self.n_real = n_real
        self.use_pallas_fine = m["use_pallas_fine"]
        self.use_pallas_coarse = m["use_pallas_coarse"]
        self.query_phases = getattr(cfg, "coarse_query_phases", 1)
        self.prefilter = getattr(cfg, "coarse_prefilter", 0)
        self.prefilter_phases = getattr(cfg, "coarse_prefilter_phases", 1)
        self.mesh = mesh
        self.pallas_interpret = pallas_interpret
        put = ((lambda a: jax.device_put(a, NamedSharding(mesh, P(DB_AXIS))))
               if mesh is not None else jnp.asarray)
        self.lengths = put(np.asarray(lengths))
        self.db_c = put(grab("coarse"))
        self.db_c1 = (put(grab("coarse1"))
                      if (self.prefilter_channels < self.coarse_channels
                          or self.prefilter_pack4)
                      else self.db_c)
        if self.use_pallas_fine:
            self.lpad = m["lpad"]
            self.l_true = m["l_true"]
            self.prints = None
            self.d0 = put(grab("d0"))
            self.d1 = put(grab("d1"))
        else:
            self.prints = put(grab("prints"))
        return self

    def warmup(self, query_lens, *, batch_sizes=(), pool=None,
               fine_window=None) -> None:
        """Compile the serving programs for the given query shapes now.

        With the persistent XLA compile cache enabled (on by default,
        utils/cache.py), running this once at DB-build time seeds the cache
        so a later serving process pays I/O, not minutes of compilation, for
        its first query (VERDICT r2 weak #2).
        """
        for n in query_lens:
            q = jnp.zeros((int(n), 2), jnp.uint32)
            self.dispatch(q, pool=pool, fine_window=fine_window
                          ).block_until_ready()
            for b in batch_sizes:
                qs = jnp.zeros((int(b), int(n), 2), jnp.uint32)
                self.dispatch_batch(qs, pool=pool, fine_window=fine_window
                                    ).block_until_ready()

    def bundle_compile_cache(self, path: str, query_lens, *, batch_sizes=(),
                             pool=None, fine_window=None) -> int:
        """warmup() + ship the resulting compile-cache entries WITH the DB.

        Runs warmup for the given serving shapes while recording which
        persistent-cache entries the programs read or write, then copies
        exactly those into <path>/xla_cache/<runtime_key>/ (path is the
        save() artifact directory). A deployment machine that has never
        compiled then reaches first-query in load time via
        TwoStageDB.load(..., install_cache=True) instead of paying remote
        Mosaic compiles; a jax/backend mismatch falls back to normal
        compilation (VERDICT r3 weak #6). Returns entries bundled.

        Call it in the same process ONLY for shapes not already dispatched
        (in-memory jit hits bypass the persistent cache and can't be
        recorded) — the CLI build-cache flow satisfies this by construction.
        """
        from ..utils import cache as cache_util

        keys: set = set()
        with cache_util.record_cache_keys(keys):
            self.warmup(query_lens, batch_sizes=batch_sizes, pool=pool,
                        fine_window=fine_window)
        return cache_util.bundle_entries(path, keys)

    def _check_query_len(self, n: int) -> None:
        """The two-stage scan needs at least one coarse alignment; queries
        longer than every DB track have no catalog-scale use (the dense
        api.match path implements the oracle's truncated-overlap semantics
        if that's really wanted)."""
        lc = self.lc_true
        if self.coarse_kind == "sum" and n * 64 * self.stride >= 2 ** 24:
            raise ValueError(
                "query too long for exact f32 accumulation of sum-coarse "
                f"correlations (n*64*stride = {n * 64 * self.stride} >= 2^24); "
                "use coarse_kind='sign' or a shorter query")
        if n // self.stride > lc:
            raise ValueError(
                f"query ({n} prints, {n // self.stride} coarse) is longer than "
                f"every DB track ({lc} coarse windows); two-stage matching "
                "needs query <= padded DB length — use api.match for "
                "truncated-overlap semantics")

    def _twopass_args(self, phases, prefilter, phases1, t):
        """Resolve + validate the two-pass knobs for a dispatch.

        Returns (prefilter, phases1, channels1): channels1 is the pass-1
        channel count — fixed at construction (the subset DB is derived
        then), so it has no per-dispatch override."""
        pf = prefilter if prefilter is not None else self.prefilter
        p1 = phases1 if phases1 is not None else self.prefilter_phases
        if pf:
            pf = min(int(pf), int(t))
        if pf and phases > 1:
            if self.stride % p1:
                raise ValueError("phases1 must divide the coarse stride")
            if not self.use_pallas_coarse:
                raise NotImplementedError(
                    "coarse prefilter needs the flat-layout Pallas coarse "
                    "path (use_pallas_coarse=True)")
        else:
            pf, p1 = 0, 1
        # channels1 is unused when pf == 0; pin it to coarse_channels there
        # so toggling prefilter off doesn't fork the jit cache key.
        return pf, p1, (self.prefilter_channels if pf else
                        self.coarse_channels)

    def dispatch(self, query_dev, *, pool: int | None = None,
                 fine_window: int | None = None, phases: int | None = None,
                 prefilter: int | None = None, phases1: int | None = None):
        """Queue one two-stage match on device; returns the (3, K) stacked
        [scores, track idx, offsets] device array WITHOUT a host sync.

        This is the exact program match() runs — benchmarks queue it
        directly so device-side timings measure the production jit.
        """
        cfg = self.db.cfg
        pool = pool if pool is not None else cfg.fine_candidates
        fw = fine_window if fine_window is not None else self.stride
        ph = phases if phases is not None else self.query_phases
        pf, p1, c1 = self._twopass_args(ph, prefilter, phases1,
                                        self.lengths.shape[0])
        if self.mesh is None and self.use_pallas_fine:
            return _two_stage_pallas_jit(
                query_dev, self.d0, self.d1, self.lengths, self.db_c,
                self.db_c1,
                stride=self.stride, pool=pool, fine_window=fw,
                l_true=self.l_true, lpad=self.lpad, lc_true=self.lc_true,
                coarse_tile=self.coarse_tile, coarse_kind=self.coarse_kind,
                coarse_channels=self.coarse_channels,
                interpret=self.pallas_interpret, phases=ph, phases1=p1,
                prefilter=pf, channels1=c1,
                packed1=bool(pf) and self.prefilter_pack4)
        if self.mesh is None:
            if pf:
                raise NotImplementedError(
                    "coarse prefilter on the XLA path: use the Pallas path")
            return _two_stage_jit(
                query_dev, self.prints, self.lengths, self.db_c,
                stride=self.stride, pool=pool, fine_window=fw,
                coarse_kind=self.coarse_kind,
                coarse_channels=self.coarse_channels, phases=ph)
        if self.use_pallas_fine:
            if pf:
                # Prefilter applies per shard: cap it at the shard track
                # count so the local pool never exceeds local tracks.
                pf = min(pf, self.lengths.shape[0] // self.mesh.devices.size)
            return _two_stage_sharded_pallas(
                query_dev, self.d0, self.d1, self.lengths, self.db_c,
                self.db_c1,
                mesh=self.mesh, stride=self.stride, pool=pool, fine_window=fw,
                l_true=self.l_true, lpad=self.lpad, lc_true=self.lc_true,
                coarse_tile=self.coarse_tile, coarse_kind=self.coarse_kind,
                coarse_channels=self.coarse_channels,
                interpret=self.pallas_interpret, phases=ph, phases1=p1,
                prefilter=pf, channels1=c1,
                packed1=bool(pf) and self.prefilter_pack4)
        if ph > 1:
            raise NotImplementedError(
                "query_phases on the sharded XLA path: use the Pallas path")
        return _two_stage_sharded(
            query_dev, self.prints, self.lengths, self.db_c,
            mesh=self.mesh, stride=self.stride, pool=pool, fine_window=fw,
            coarse_kind=self.coarse_kind,
            coarse_channels=self.coarse_channels)

    def _stretch_factors(self, span, step):
        """Resolve the tempo-scan grid for a dispatch (None = config)."""
        cfg = self.db.cfg
        span = span if span is not None else getattr(cfg, "stretch_span", 0.0)
        step = step if step is not None else getattr(cfg, "stretch_step", 0.01)
        return stretch_grid(span, step) if span else None

    def match(self, query_prints: np.ndarray, *, top_k: int | None = None,
              pool: int | None = None, fine_window: int | None = None,
              phases: int | None = None, prefilter: int | None = None,
              phases1: int | None = None,
              stretch_span: float | None = None,
              stretch_step: float | None = None,
              return_variant: bool = False,
              calibrate: bool = False):
        cfg = self.db.cfg
        top_k = top_k if top_k is not None else cfg.top_k
        qh = np.asarray(query_prints, dtype=np.uint32)
        variants = None
        if qh.ndim == 3:
            # Pre-scanned (V, N, 2) tempo-variant stack (spec-level scan,
            # api.fingerprint_scan_batch) — rank the given rows together;
            # the config's print-level scan is superseded for this call.
            variants = qh
            qh = qh[qh.shape[0] // 2]      # identity row (grid center)
        self._check_query_len(qh.shape[0])
        factors = self._stretch_factors(stretch_span, stretch_step)
        if variants is None and factors is not None:
            # Tempo scan (live renditions — match/stretch.py): V re-timed
            # print variants each run the full two-stage program; candidates
            # from every tempo hypothesis rank together below, so the best-
            # scoring hypothesis wins per track.
            variants = print_variants(qh, factors)[0]
        if variants is not None:
            # Dispatches queue before the first materialization — one link
            # round trip per variant is avoided, the V transfers overlap.
            outs = [self.dispatch(jnp.asarray(v), pool=pool,
                                  fine_window=fine_window, phases=phases,
                                  prefilter=prefilter, phases1=phases1)
                    for v in variants]
            host = [np.asarray(o) for o in outs]
            scores = np.concatenate([o[0] for o in host])
            idx = np.concatenate([o[1] for o in host])
            offs = np.concatenate([o[2] for o in host])
            if calibrate:
                # Per-hypothesis background subtraction: a re-timed row's
                # correlations shift systematically (interpolation blur), so
                # ranking raw scores across hypotheses lets a blurrier row's
                # imposters outrank the truth. The row's candidate-pool
                # median is an imposter-background estimate (the truth is
                # one track in a ~pool-sized sample); rank by the EXCESS
                # over it. Scores returned are the calibrated ones.
                scores = np.concatenate(
                    [o[0] - np.median(o[0]) for o in host])
            # Variant provenance: candidate j came from hypothesis j // P
            # (per-variant dispatches concatenate along the candidate axis).
            var = np.repeat(np.arange(len(variants), dtype=np.int32),
                            scores.shape[0] // len(variants))
        else:
            # One device dispatch, one host materialization: on a tunneled
            # host link every extra sync costs a full roundtrip, so the
            # query's coarse derivation runs inside the same jit and the
            # three result vectors come back stacked.
            out = self.dispatch(jnp.asarray(qh), pool=pool,
                                fine_window=fine_window,
                                phases=phases, prefilter=prefilter,
                                phases1=phases1)
            scores, idx, offs = np.asarray(out)
            var = np.zeros(scores.shape[0], dtype=np.int32)
        real = idx < self.n_real
        scores, idx, offs, var = scores[real], idx[real], offs[real], var[real]
        return _rank_dedup(scores, idx, offs, self.db.track_ids, top_k,
                           aux=var if return_variant else None)

    def dispatch_batch(self, queries_dev, *, pool: int | None = None,
                       fine_window: int | None = None,
                       phases: int | None = None,
                       prefilter: int | None = None,
                       phases1: int | None = None):
        """Queue one batched match ((B, N, 2) device array) without a host
        sync; returns the (B, 3, K) stacked device array. The exact program
        match_batch runs — benchmarks queue it directly."""
        cfg = self.db.cfg
        pool = pool if pool is not None else cfg.fine_candidates
        fw = fine_window if fine_window is not None else self.stride
        ph = phases if phases is not None else self.query_phases
        pf, p1, c1 = self._twopass_args(ph, prefilter, phases1,
                                        self.lengths.shape[0])
        if self.mesh is not None:
            if pf:
                pf = min(pf, self.lengths.shape[0] // self.mesh.devices.size)
            return _two_stage_sharded_batch(
                queries_dev, self.d0, self.d1, self.lengths, self.db_c,
                self.db_c1,
                mesh=self.mesh, stride=self.stride, pool=pool, fine_window=fw,
                l_true=self.l_true, lpad=self.lpad, lc_true=self.lc_true,
                coarse_tile=self.coarse_tile, coarse_kind=self.coarse_kind,
                coarse_channels=self.coarse_channels,
                interpret=self.pallas_interpret, phases=ph, phases1=p1,
                prefilter=pf, channels1=c1,
                packed1=bool(pf) and self.prefilter_pack4)
        return _two_stage_pallas_batch_jit(
            queries_dev, self.d0, self.d1, self.lengths, self.db_c,
            self.db_c1,
            stride=self.stride, pool=pool, fine_window=fw,
            l_true=self.l_true, lpad=self.lpad, lc_true=self.lc_true,
            coarse_tile=self.coarse_tile, coarse_kind=self.coarse_kind,
            coarse_channels=self.coarse_channels,
            interpret=self.pallas_interpret, phases=ph, phases1=p1,
            prefilter=pf, channels1=c1,
            packed1=bool(pf) and self.prefilter_pack4)

    def match_batch(self, query_batch: np.ndarray, *, top_k: int | None = None,
                    pool: int | None = None, fine_window: int | None = None,
                    phases: int | None = None, prefilter: int | None = None,
                    phases1: int | None = None,
                    stretch_span: float | None = None,
                    stretch_step: float | None = None,
                    calibrate: bool = False):
        """Match B equal-length queries in one device dispatch.

        The coarse database streams from HBM once for the whole batch, so
        per-query cost approaches pure compute — the serving-throughput path.
        Returns a list of B (track_ids, scores, offsets) tuples, each
        identical to what match() returns for that query.

        Hardware sizing bounds: large B * phases products are auto-chunked
        into multiple coarse DB sweeps (vmem-resident phase stack budget,
        _PHASED_STACK_BUDGET) — correct but slower; prefer the two-pass
        prefilter for large phase counts. B * pool <= ~130k candidates (the
        fine kernel's SMEM scalar prefetch; observed compile OOM at B=20 x
        pool 8192) — split the batch to go bigger.
        """
        if not self.use_pallas_fine:
            raise ValueError("match_batch requires the Pallas fine path "
                             "(use_pallas_fine=True)")
        cfg = self.db.cfg
        top_k = top_k if top_k is not None else cfg.top_k
        pool = pool if pool is not None else cfg.fine_candidates
        fw = fine_window if fine_window is not None else self.stride
        qh = np.asarray(query_batch, dtype=np.uint32)
        n_var = 1
        if qh.ndim == 4:
            # Pre-scanned (B, V, N, 2) tempo-variant stacks (spec-level
            # scan, api.fingerprint_scan_batch): flatten to B*V rows; each
            # query's V rows rank together below. Supersedes the config's
            # print-level scan for this call.
            n_var = qh.shape[1]
            qh = qh.reshape(-1, qh.shape[2], 2)
        self._check_query_len(qh.shape[1])
        factors = (self._stretch_factors(stretch_span, stretch_step)
                   if n_var == 1 else None)
        if factors is not None:
            # Tempo scan: the (B, V, N, 2) variant stack flattens into one
            # B*V-row batched dispatch (same compiled program, bigger B);
            # each query's V hypothesis rows rank together below. Sizing:
            # B*V*pool candidates hit the fine kernel's SMEM prefetch bound
            # (~130k) — split the batch for large B*V products.
            n_var = len(factors)
            qh = print_variants(qh, factors).reshape(-1, qh.shape[1], 2)
        out = np.asarray(self.dispatch_batch(jnp.asarray(qh), pool=pool,
                                             fine_window=fw,
                                             phases=phases,
                                             prefilter=prefilter,
                                             phases1=phases1))
        cal = None
        if n_var > 1:
            # (B*V, 3, K) -> (B, 3, V*K): variant rows concatenate along the
            # candidate axis so the per-query ranking sees every hypothesis.
            out = out.reshape(-1, n_var, 3, out.shape[-1])
            if calibrate:
                # Per-hypothesis background subtraction (see match());
                # kept separate so idx/offs stay integer. Variant-major
                # order matches the moveaxis reshape below.
                cal = out[:, :, 0].astype(np.float64)
                cal -= np.median(cal, axis=-1, keepdims=True)
                cal = cal.reshape(cal.shape[0], -1)
            out = np.moveaxis(out, 1, 2).reshape(out.shape[0], 3, -1)
        results = []
        for b in range(out.shape[0]):
            scores, idx, offs = out[b]
            if cal is not None:
                scores = cal[b]
            real = idx < self.n_real
            scores, idx, offs = scores[real], idx[real], offs[real]
            results.append(_rank_dedup(scores, idx, offs, self.db.track_ids, top_k))
        return results


def _phase_variants(query, *, stride, phases, kind, channels):
    """P phase-shifted coarse views of one query.

    The query's majority-vote windows are anchored to its own first print;
    at true offset o* with r = (-o*) mod stride != 0 every window straddles
    two DB windows and the correlation peak collapses (measured: top-1
    0.78 at r~0 vs 0.55 at r~stride/2 on the 250k real catalog). Variant p
    drops the first p*stride/P prints so one of the P variants is within
    stride/(2P) of DB window phase. Returns ((P, Nc, C) int8, (P,) r).
    """
    step = stride // phases
    n = query.shape[0]
    nc = (n - (stride - step)) // stride
    qs = [coarse_ops.coarse_pm1(
        jax.lax.slice_in_dim(query, p * step, p * step + nc * stride, axis=0),
        stride, kind=kind, channels=channels) for p in range(phases)]
    return (jnp.stack(qs),
            jnp.arange(phases, dtype=jnp.int32) * step)


def _coarse_best_phased(query, db_c, *, stride, phases, coarse_kind,
                        coarse_channels, lc_true, coarse_tile, interpret):
    """Phase-max coarse stage: (best_corr (T,), center of query print 0 (T,))."""
    qcs, rs = _phase_variants(query, stride=stride, phases=phases,
                              kind=coarse_kind, channels=coarse_channels)
    best_b, idx_b = _coarse_best_batch(qcs, db_c, lc_true=lc_true,
                                       coarse_tile=coarse_tile,
                                       interpret=interpret)   # (P, T)
    p_star = jnp.argmax(best_b, axis=0)                       # (T,)
    best_corr = jnp.max(best_b, axis=0)
    idx_sel = jnp.take_along_axis(idx_b, p_star[None], axis=0)[0]
    centers = idx_sel * stride - rs[p_star]     # query print 0 position
    return best_corr, centers


def _coarse_best_batch(qc, db_c, *, lc_true, coarse_tile, interpret,
                       packed4=False):
    """Batched per-track (best corr, best offset): fused Pallas batch kernel
    on the flat layout (one DB sweep for all B queries), XLA conv when 3-D."""
    if db_c.ndim == 2:
        from ..ops.pallas_coarse import pallas_coarse_scan_batch_stacked

        # Adaptive phase-lane count: the kernel pads lane groups so
        # B*s % 128 == 0, so a small B at the default s=16 pays for padded
        # DUPLICATE lanes (B=2 -> 8 groups, 4x wasted MACs). Growing s until
        # B*s ~ 128 keeps the MXU wide with no duplicate groups; s is a pure
        # tiling knob (results identical, tests sweep it).
        b0 = qc.shape[0]
        p2 = 1
        while p2 < b0:
            p2 *= 2
        s = max(16, min(128, 128 // p2))
        # tt=None: the stacked kernel sizes its own vmem-safe tile (its
        # budget includes the (tt, B*s) surfaces, unlike the single-query
        # scan's coarse_tile).
        return pallas_coarse_scan_batch_stacked(qc, db_c, s=s, tt=None,
                                                lc_true=lc_true,
                                                interpret=interpret,
                                                packed4=packed4)
    assert not packed4, "nibble-packed DBs exist only on the flat layout"
    corr = coarse_ops.coarse_correlation_batch(qc, db_c)     # (B, T, Ac)
    if lc_true is not None:
        corr = corr[:, :, : lc_true - qc.shape[1] + 1]
    return jnp.max(corr, axis=2), jnp.argmax(corr, axis=2).astype(jnp.int32)


def _coarse_best_batch_phased(queries, db_c, *, stride, phases, coarse_kind,
                              coarse_channels, lc_true, coarse_tile,
                              interpret, packed4=False):
    """Phase-max coarse for B queries in ONE stacked sweep: the B*P variant
    lanes ride the same DB pass. Returns ((B, T) best, (B, T) centers of
    query print 0)."""
    b = queries.shape[0]
    vs = [_phase_variants(q, stride=stride, phases=phases, kind=coarse_kind,
                          channels=coarse_channels)
          for q in queries]            # unrolled over static B
    qcs = jnp.concatenate([v[0] for v in vs], axis=0)        # (B*P, Nc, C)
    rs = vs[0][1]                                            # (P,)
    # The stacked kernel holds a (k_pad, groups*s) bf16 phase stack resident
    # in scoped vmem; big batch x phases products blow the ~16 MB arena
    # (observed compile OOMs at 9.96 MB stacks once unrolled GEMM temps are
    # added). Chunk the variant-lane groups so each call's stack stays under
    # ~5 MB — each extra chunk re-sweeps the coarse DB, so this is the
    # correctness fallback; the two-pass prefilter is the fast path for
    # large phase counts.
    g = qcs.shape[0]
    nc, c = qcs.shape[1], qcs.shape[2]
    k_pad16 = -(-((nc + 15) * c) // 128) * 128
    g_max = max(8, _PHASED_STACK_BUDGET // (k_pad16 * 16 * 2))
    if g <= g_max:
        best_l, idx_l = _coarse_best_batch(qcs, db_c, lc_true=lc_true,
                                           coarse_tile=coarse_tile,
                                           interpret=interpret,
                                           packed4=packed4)  # (B*P, T)
    else:
        parts = [_coarse_best_batch(qcs[i:i + g_max], db_c, lc_true=lc_true,
                                    coarse_tile=coarse_tile,
                                    interpret=interpret, packed4=packed4)
                 for i in range(0, g, g_max)]
        best_l = jnp.concatenate([p[0] for p in parts], axis=0)
        idx_l = jnp.concatenate([p[1] for p in parts], axis=0)
    t = best_l.shape[1]
    best_l = best_l.reshape(b, phases, t)
    idx_l = idx_l.reshape(b, phases, t)
    p_star = jnp.argmax(best_l, axis=1)                      # (B, T)
    best = jnp.max(best_l, axis=1)
    idx_sel = jnp.take_along_axis(idx_l, p_star[:, None], axis=1)[:, 0]
    centers = idx_sel * stride - rs[p_star]
    return best, centers


def _coarse_pool_twopass(queries, db_c, db_c1, *, stride, phases, phases1,
                         prefilter, pool, coarse_kind, coarse_channels,
                         channels1, lc_true, coarse_tile, interpret,
                         packed1=False):
    """Two-pass phased coarse stage: a cheap pass-1 sweep of the WHOLE
    catalog (phases1 variant lanes) pools the top `prefilter` tracks per
    query; pass 2 rescans only those gathered rows with the full `phases`
    phase grid (ops/pallas_coarse.pallas_coarse_rescan_stacked — block-
    diagonal, no cross-query MACs). The one-pass phased scan is MXU-bound
    at ~1 ms per variant lane per 250k tracks, so scanning P phases over
    prefilter<<T tracks instead of T cuts the phased coarse cost by ~P/phases1
    while keeping the phase-corrected centers (measured: RESULTS.md round 3).

    Returns (cand (B, K) global track indices, centers (B, K)).
    """
    from ..ops.pallas_coarse import pallas_coarse_rescan_stacked

    b = queries.shape[0]
    # Pass 1 sweeps the whole catalog on the (possibly channel-subset)
    # pass-1 DB — its scores only rank tracks into the prefilter pool, so
    # the cheaper C1-prefix representation suffices (pass 2 rescans at
    # full channel count).
    if phases1 > 1:
        best1, _ = _coarse_best_batch_phased(
            queries, db_c1, stride=stride, phases=phases1,
            coarse_kind=coarse_kind, coarse_channels=channels1,
            lc_true=lc_true, coarse_tile=coarse_tile, interpret=interpret,
            packed4=packed1)
    else:
        qc = jax.vmap(lambda q: coarse_ops.coarse_pm1(
            q, stride, kind=coarse_kind, channels=channels1))(queries)
        best1, _ = _coarse_best_batch(qc, db_c1, lc_true=lc_true,
                                      coarse_tile=coarse_tile,
                                      interpret=interpret, packed4=packed1)
    t = db_c.shape[0]
    m = min(prefilter, t)
    # Sorted subset: within-subset index order == global order, so pass-2
    # pooling keeps the exact tie-break (lower global index) and prefilter
    # >= T reproduces the one-pass phased result exactly (tested).
    cand_m = jax.vmap(lambda bc: _pool_candidates(bc, m))(best1)    # (B, M8)
    cand_m = jnp.sort(cand_m, axis=1)
    db_sub = db_c[cand_m.reshape(-1)]                   # (B*M8, lcw) gather
    vs = [_phase_variants(q, stride=stride, phases=phases, kind=coarse_kind,
                          channels=coarse_channels) for q in queries]
    qcs = jnp.stack([v[0] for v in vs])                 # (B, P, Nc, C)
    rs = vs[0][1]
    best2, idx2 = pallas_coarse_rescan_stacked(
        qcs, db_sub, lc_true=lc_true, interpret=interpret)   # (B, P, M8)
    p_star = jnp.argmax(best2, axis=1)                       # (B, M8)
    best = jnp.max(best2, axis=1)
    idx_sel = jnp.take_along_axis(idx2, p_star[:, None], axis=1)[:, 0]
    centers = idx_sel * stride - rs[p_star]
    cand_loc = jax.vmap(lambda bc: _pool_candidates(bc, pool))(best)  # (B, K)
    cand = jnp.take_along_axis(cand_m, cand_loc, axis=1)
    centers = jnp.take_along_axis(centers, cand_loc, axis=1)
    return cand, centers


@functools.partial(
    jax.jit, static_argnames=("stride", "pool", "fine_window", "l_true",
                              "lpad", "lc_true", "coarse_tile", "coarse_kind",
                              "coarse_channels", "interpret", "phases",
                              "phases1", "prefilter", "channels1", "packed1")
)
def _two_stage_pallas_batch_jit(queries, d0, d1, lengths, db_c, db_c1,
                                *, stride, pool, fine_window, l_true, lpad,
                                lc_true=None, coarse_tile=128,
                                coarse_kind="sign", coarse_channels=64,
                                interpret=False, phases=1, phases1=1,
                                prefilter=0, channels1=64, packed1=False):
    """Batched two-stage match: one coarse DB sweep serves all B queries."""
    from ..ops.pallas_fine import pallas_fine_rescan_batch

    b = queries.shape[0]
    if phases > 1 and prefilter:
        cand, centers = _coarse_pool_twopass(
            queries, db_c, db_c1, stride=stride, phases=phases,
            phases1=phases1,
            prefilter=prefilter, pool=pool, coarse_kind=coarse_kind,
            coarse_channels=coarse_channels, channels1=channels1,
            lc_true=lc_true,
            coarse_tile=coarse_tile, interpret=interpret, packed1=packed1)
    else:
        if phases > 1:
            best_corr, centers_all = _coarse_best_batch_phased(
                queries, db_c, stride=stride, phases=phases,
                coarse_kind=coarse_kind, coarse_channels=coarse_channels,
                lc_true=lc_true, coarse_tile=coarse_tile, interpret=interpret)
        else:
            qc = jax.vmap(lambda q: coarse_ops.coarse_pm1(
                q, stride, kind=coarse_kind, channels=coarse_channels))(queries)
            best_corr, best_a = _coarse_best_batch(qc, db_c, lc_true=lc_true,
                                                   coarse_tile=coarse_tile,
                                                   interpret=interpret)
            centers_all = best_a * stride
        cand = jax.vmap(lambda bc: _pool_candidates(bc, pool))(best_corr)
        centers = jnp.take_along_axis(centers_all, cand, axis=1)
    n = queries.shape[1]
    n_fine = 2 * fine_window + 1
    span = n + n_fine - 1
    starts = jnp.clip(centers - fine_window, 0, max(l_true - span, 0))
    s, o = pallas_fine_rescan_batch(queries, d0, d1, lengths, cand, starts,
                                    n_fine=n_fine, lpad=lpad,
                                    interpret=interpret)
    return jnp.stack([s, cand, o], axis=1)                   # (B, 3, K)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "stride", "pool", "fine_window", "l_true",
                     "lpad", "lc_true", "coarse_tile", "coarse_kind",
                     "coarse_channels", "interpret", "phases", "phases1",
                     "prefilter", "channels1", "packed1"),
)
def _two_stage_sharded_batch(queries, d0, d1, lengths, db_c, db_c1,
                             *, mesh, stride, pool, fine_window, l_true,
                             lpad, lc_true=None, coarse_tile=128,
                             coarse_kind="sign", coarse_channels=64,
                             interpret=False, phases=1, phases1=1,
                             prefilter=0, channels1=64, packed1=False):
    """Sharded batched serving: per shard, one coarse sweep serves all B
    queries and the per-shard batched fine rescan runs on local DMAs; the
    fixed-size (B, 3, K) candidate blocks merge with one all-gather along K.
    """
    from ..ops.pallas_fine import pallas_fine_rescan_batch

    qcs = jax.vmap(lambda q: coarse_ops.coarse_pm1(
        q, stride, kind=coarse_kind, channels=coarse_channels))(queries)
    n = queries.shape[1]
    n_fine = 2 * fine_window + 1
    span = n + n_fine - 1

    def shard_fn(qs, qc, d0_loc, d1_loc, ln_loc, dc_loc, dc1_loc):
        t_loc = ln_loc.shape[0]
        if phases > 1 and prefilter:
            # Two-pass phased coarse per shard: indices/gathers are all
            # shard-local, so the prefilter applies to each chip's own
            # track range before the all-gather merge.
            cand, centers = _coarse_pool_twopass(
                qs, dc_loc, dc1_loc, stride=stride, phases=phases,
                phases1=phases1,
                prefilter=prefilter, pool=pool, coarse_kind=coarse_kind,
                coarse_channels=coarse_channels, channels1=channels1,
                lc_true=lc_true,
                coarse_tile=coarse_tile, interpret=interpret,
                packed1=packed1)
        else:
            if phases > 1:
                best_corr, centers_all = _coarse_best_batch_phased(
                    qs, dc_loc, stride=stride, phases=phases,
                    coarse_kind=coarse_kind, coarse_channels=coarse_channels,
                    lc_true=lc_true, coarse_tile=coarse_tile,
                    interpret=interpret)
            else:
                best_corr, best_a = _coarse_best_batch(qc, dc_loc,
                                                       lc_true=lc_true,
                                                       coarse_tile=coarse_tile,
                                                       interpret=interpret)
                centers_all = best_a * stride
            cand = jax.vmap(lambda bc: _pool_candidates(bc, pool))(best_corr)
            centers = jnp.take_along_axis(centers_all, cand, axis=1)
        starts = jnp.clip(centers - fine_window, 0,
                          max(l_true - span, 0))
        s, o = pallas_fine_rescan_batch(qs, d0_loc, d1_loc, ln_loc, cand,
                                        starts, n_fine=n_fine, lpad=lpad,
                                        interpret=interpret)
        shard = jax.lax.axis_index(DB_AXIS).astype(jnp.int32)
        gi = shard * t_loc + cand
        return jax.lax.all_gather(jnp.stack([s, gi, o], axis=1), DB_AXIS,
                                  tiled=True, axis=2)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(DB_AXIS), P(DB_AXIS), P(DB_AXIS), P(DB_AXIS),
                  P(DB_AXIS)),
        out_specs=P(),
        check_vma=False,
    )(queries, qcs, d0, d1, lengths, db_c, db_c1)


def _coarse_best(query_c, db_c, *, lc_true, coarse_tile, interpret):
    """Per-track (best corr, best coarse offset): fused Pallas kernel when
    the coarse DB is flat, XLA conv + max/argmax when 3-D."""
    if db_c.ndim == 2:
        from ..ops.pallas_coarse import pallas_coarse_scan

        return pallas_coarse_scan(query_c, db_c, tt=coarse_tile,
                                  lc_true=lc_true, interpret=interpret)
    corr = coarse_ops.coarse_correlation(query_c, db_c)
    return jnp.max(corr, axis=1), jnp.argmax(corr, axis=1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "pool", "fine_window", "l_true", "lpad",
                     "lc_true", "coarse_tile", "coarse_kind",
                     "coarse_channels", "interpret", "phases", "phases1",
                     "prefilter", "channels1", "packed1"),
)
def _two_stage_pallas_jit(query, d0, d1, lengths, db_c, db_c1,
                          *, stride, pool, fine_window, l_true, lpad,
                          lc_true=None, coarse_tile=128, coarse_kind="sign",
                          coarse_channels=64, interpret=False, phases=1,
                          phases1=1, prefilter=0, channels1=64,
                          packed1=False):
    """Two-stage match with the Pallas kernels (TPU path)."""
    from ..ops.pallas_fine import pallas_fine_rescan

    if phases > 1 and prefilter:
        cand_b, centers_b = _coarse_pool_twopass(
            query[None], db_c, db_c1, stride=stride, phases=phases,
            phases1=phases1, prefilter=prefilter, pool=pool,
            coarse_kind=coarse_kind, coarse_channels=coarse_channels,
            channels1=channels1,
            lc_true=lc_true, coarse_tile=coarse_tile, interpret=interpret,
            packed1=packed1)
        cand, centers_k = cand_b[0], centers_b[0]
    else:
        if phases > 1:
            best_corr, centers = _coarse_best_phased(
                query, db_c, stride=stride, phases=phases,
                coarse_kind=coarse_kind, coarse_channels=coarse_channels,
                lc_true=lc_true, coarse_tile=coarse_tile, interpret=interpret)
        else:
            query_c = coarse_ops.coarse_pm1(query, stride, kind=coarse_kind,
                                            channels=coarse_channels)
            best_corr, best_a = _coarse_best(query_c, db_c, lc_true=lc_true,
                                             coarse_tile=coarse_tile,
                                             interpret=interpret)
            centers = best_a * stride
        cand = _pool_candidates(best_corr, pool)
        centers_k = centers[cand]
    n = query.shape[0]
    n_fine = 2 * fine_window + 1
    span = n + n_fine - 1
    starts = jnp.clip(centers_k - fine_window, 0,
                      max(l_true - span, 0))
    s, o = pallas_fine_rescan(query, d0, d1, lengths, cand, starts,
                              n_fine=n_fine, lpad=lpad, interpret=interpret)
    return jnp.stack([s, cand, o])


@functools.partial(jax.jit, static_argnames=("stride", "pool", "fine_window",
                                              "coarse_kind",
                                              "coarse_channels", "phases"))
def _two_stage_jit(query, prints, lengths, db_c, *, stride, pool, fine_window,
                   coarse_kind="sign", coarse_channels=64, phases=1):
    if phases > 1:
        best_corr, centers = _coarse_best_phased(
            query, db_c, stride=stride, phases=phases,
            coarse_kind=coarse_kind, coarse_channels=coarse_channels,
            lc_true=None, coarse_tile=None, interpret=False)
        t = prints.shape[0]
        cand = jax.lax.top_k(best_corr, min(pool, t))[1].astype(jnp.int32)
        scores, offsets = _fine_rescan(
            query, prints[cand], lengths[cand],
            jnp.maximum(centers[cand], 0), fine_window=fine_window)
        return jnp.stack([scores, cand, offsets])
    query_c = coarse_ops.coarse_pm1(query, stride, kind=coarse_kind,
                                    channels=coarse_channels)
    s, i, o = _two_stage_local(query, query_c, prints, lengths, db_c,
                               stride=stride, pool=pool, fine_window=fine_window)
    return jnp.stack([s, i, o])


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "stride", "pool", "fine_window", "l_true",
                     "lpad", "lc_true", "coarse_tile", "coarse_kind",
                     "coarse_channels", "interpret", "phases", "phases1",
                     "prefilter", "channels1", "packed1"),
)
def _two_stage_sharded_pallas(query, d0, d1, lengths, db_c, db_c1,
                              *, mesh, stride, pool, fine_window,
                              l_true, lpad, lc_true=None, coarse_tile=128,
                              coarse_kind="sign", coarse_channels=64,
                              interpret=False, phases=1, phases1=1,
                              prefilter=0, channels1=64, packed1=False):
    """Sharded two-stage with the Pallas kernels per shard.

    Each chip scans its coarse shard on the MXU, rescans its own candidate
    pool with local HBM DMAs, and the fixed-size candidate lists merge with
    one all-gather — the v4-8 production path (CPU-sim tested in interpret
    mode).
    """
    from ..ops.pallas_fine import pallas_fine_rescan

    query_c = coarse_ops.coarse_pm1(query, stride, kind=coarse_kind,
                                    channels=coarse_channels)
    n = query.shape[0]
    n_fine = 2 * fine_window + 1
    span = n + n_fine - 1

    def shard_fn(q, qc, d0_loc, d1_loc, ln_loc, dc_loc, dc1_loc):
        t_loc = ln_loc.shape[0]
        if phases > 1 and prefilter:
            cand_b, centers_b = _coarse_pool_twopass(
                q[None], dc_loc, dc1_loc, stride=stride, phases=phases,
                phases1=phases1, prefilter=prefilter, pool=pool,
                coarse_kind=coarse_kind, coarse_channels=coarse_channels,
                channels1=channels1,
                lc_true=lc_true, coarse_tile=coarse_tile,
                interpret=interpret, packed1=packed1)
            cand, centers_k = cand_b[0], centers_b[0]
        else:
            if phases > 1:
                best_corr, centers = _coarse_best_phased(
                    q, dc_loc, stride=stride, phases=phases,
                    coarse_kind=coarse_kind, coarse_channels=coarse_channels,
                    lc_true=lc_true, coarse_tile=coarse_tile,
                    interpret=interpret)
            else:
                best_corr, best_a = _coarse_best(qc, dc_loc, lc_true=lc_true,
                                                 coarse_tile=coarse_tile,
                                                 interpret=interpret)
                centers = best_a * stride
            cand = _pool_candidates(best_corr, pool)
            centers_k = centers[cand]
        starts = jnp.clip(centers_k - fine_window, 0,
                          max(l_true - span, 0))
        s, o = pallas_fine_rescan(q, d0_loc, d1_loc, ln_loc, cand, starts,
                                  n_fine=n_fine, lpad=lpad,
                                  interpret=interpret)
        shard = jax.lax.axis_index(DB_AXIS).astype(jnp.int32)
        gi = shard * t_loc + cand
        return jax.lax.all_gather(jnp.stack([s, gi, o]), DB_AXIS, tiled=True,
                                  axis=1)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(DB_AXIS), P(DB_AXIS), P(DB_AXIS), P(DB_AXIS),
                  P(DB_AXIS)),
        out_specs=P(),
        check_vma=False,
    )(query, query_c, d0, d1, lengths, db_c, db_c1)


@functools.partial(
    jax.jit, static_argnames=("mesh", "stride", "pool", "fine_window",
                              "coarse_kind", "coarse_channels")
)
def _two_stage_sharded(query, prints, lengths, db_c,
                       *, mesh, stride, pool, fine_window, coarse_kind="sign",
                       coarse_channels=64):
    query_c = coarse_ops.coarse_pm1(query, stride, kind=coarse_kind,
                                    channels=coarse_channels)

    def shard_fn(q, qc, p, ln, dc):
        s, i, o = _two_stage_local(q, qc, p, ln, dc, stride=stride,
                                   pool=pool, fine_window=fine_window)
        shard = jax.lax.axis_index(DB_AXIS).astype(jnp.int32)
        gi = shard * p.shape[0] + i
        return jax.lax.all_gather(jnp.stack([s, gi, o]), DB_AXIS, tiled=True,
                                  axis=1)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(DB_AXIS), P(DB_AXIS), P(DB_AXIS)),
        out_specs=P(),
        check_vma=False,
    )(query, query_c, prints, lengths, db_c)
