"""Micro-batching match server: the serving loop around the batched matcher.

BASELINE config 4's QPS story is batched serving — B queries share one
coarse-DB sweep (`TwoStageDB.dispatch_batch`). This module provides the
production loop that turns that kernel into a service: callers submit
queries from any thread and get futures; a single dispatcher thread groups
up to `max_batch` queries (waiting at most `max_wait_ms` for the batch to
fill), issues ONE device dispatch per group, and resolves the futures.

Design points (TPU-shaped):
  - One dispatcher thread owns the device: JAX dispatch is not thread-safe
    to interleave cheaply, and a single in-order queue keeps the device fed
    without lock contention on the hot path.
  - Queries must share one print length (`query_prints`): batched matching
    is a fixed-shape jit program; a serving deployment pins the query
    window (e.g. 10 s) at config time, exactly like the streaming session
    pins its window. Wrong-length submissions fail fast.
  - Up to `depth` batches are left in flight before the dispatcher blocks
    on results, so device work and host ranking overlap (double buffering).

The reference has no serving stack (single-process C++ library, SURVEY.md
§1.1); this is the TPU-native production wrapper over its match() surface.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future

import numpy as np


class MatchServer:
    """Micro-batching wrapper around TwoStageDB.dispatch_batch."""

    def __init__(self, ts, query_prints: int, *, max_batch: int = 16,
                 max_wait_ms: float = 5.0, depth: int = 2,
                 top_k: int | None = None, pool: int | None = None):
        import jax.numpy as jnp

        self._jnp = jnp
        self.ts = ts
        self.n_q = int(query_prints)
        self.max_batch = int(max_batch)
        self.max_wait = max_wait_ms / 1e3
        self.depth = int(depth)
        self.top_k = top_k
        self.pool = pool
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # ---- client surface -------------------------------------------------
    def submit(self, query_prints: np.ndarray) -> Future:
        """Queue one (N, 2)-uint32 query; resolves to (ids, scores, offs)."""
        q = np.asarray(query_prints, dtype=np.uint32)
        fut: Future = Future()
        if q.shape != (self.n_q, 2):
            fut.set_exception(ValueError(
                f"server is pinned to {self.n_q}-print queries, "
                f"got {q.shape}"))
            return fut
        if self._stop.is_set():
            fut.set_exception(RuntimeError("server closed"))
            return fut
        self._q.put((q, fut))
        return fut

    def match(self, query_prints: np.ndarray):
        """Blocking convenience wrapper."""
        return self.submit(query_prints).result()

    def _bucket(self, n: int) -> int:
        b = 1
        while b < n:
            b *= 4
        return min(b, self.max_batch)

    def warmup(self, example_query: np.ndarray) -> None:
        """Compile every batch bucket up front (serving should never pay a
        first-compile inside a latency SLO)."""
        b = 1
        while True:
            qs = self._jnp.asarray(
                np.broadcast_to(example_query, (min(b, self.max_batch),
                                                self.n_q, 2)))
            np.asarray(self.ts.dispatch_batch(qs, pool=self.pool))
            if b >= self.max_batch:
                break
            b *= 4

    def close(self) -> None:
        self._stop.set()
        self._q.put(None)                  # wake the dispatcher
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- dispatcher -----------------------------------------------------
    def _collect(self):
        """Block for one query, then soak up to max_batch within max_wait."""
        item = self._q.get()
        if item is None:
            return []
        batch = [item]
        deadline = _now() + self.max_wait
        while len(batch) < self.max_batch:
            left = deadline - _now()
            if left <= 0:
                break
            try:
                nxt = self._q.get(timeout=left)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _run(self):
        inflight: list[tuple[object, list]] = []

        def drain(block_all: bool):
            while inflight and (block_all or len(inflight) >= self.depth):
                out_dev, futs = inflight.pop(0)
                out = np.asarray(out_dev)
                for b, fut in enumerate(futs):
                    if fut.set_running_or_notify_cancel():
                        fut.set_result(self._rank(out[b]))

        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                break
            # Bucketed batch shapes: a jit program exists per (B, N)
            # signature, so variable-size batches would recompile constantly
            # under Poisson arrivals. Batches pad (replicating the last
            # query; padded rows are dropped before ranking) to the next
            # power-of-4 bucket — a handful of programs, compiled up front
            # by warmup(), with at most 4x padding waste at low fill.
            rows = [q for q, _ in batch]
            rows += [rows[-1]] * (self._bucket(len(rows)) - len(rows))
            qs = self._jnp.asarray(np.stack(rows))
            out_dev = self.ts.dispatch_batch(qs, pool=self.pool)
            inflight.append((out_dev, [f for _, f in batch]))
            # Keep `depth` batches in flight while more work is queued, but
            # resolve everything when idle — a lone request must not wait
            # for a successor batch to push it out.
            drain(block_all=self._q.empty())
        drain(block_all=True)
        # Fail anything still queued after close().
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[1].set_exception(RuntimeError("server closed"))

    def _rank(self, out_b: np.ndarray):
        from .match.scaled import _rank_dedup

        cfg = self.ts.db.cfg
        scores, idx, offs = out_b
        real = idx < self.ts.n_real
        return _rank_dedup(scores[real], idx[real], offs[real],
                           self.ts.db.track_ids,
                           self.top_k if self.top_k else cfg.top_k)


def _now() -> float:
    import time

    return time.monotonic()
