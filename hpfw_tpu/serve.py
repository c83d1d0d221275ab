"""Micro-batching match server: the serving loop around the batched matcher.

BASELINE config 4's QPS story is batched serving — B queries share one
coarse-DB sweep (`TwoStageDB.dispatch_batch`). This module provides the
production loop that turns that kernel into a service: callers submit
queries from any thread and get futures; a single dispatcher thread groups
up to `max_batch` queries (waiting at most `max_wait_ms` for the batch to
fill), issues ONE device dispatch per group, and a worker pool materializes
results and ranks them.

Design points (TPU-shaped):
  - One dispatcher thread owns DISPATCH: a single in-order queue keeps the
    device fed without lock contention on the hot path. Materialization
    (the device->host sync — ~32 ms on this machine's relay) and host
    ranking run on `rank_workers` pool threads, so the dispatcher never
    blocks on a result and consecutive batches pipeline on the device.
  - Up to `depth` batches are in flight on the device before the dispatcher
    waits (semaphore released as results land) — bounded device queue.
  - The submit queue is BOUNDED (`max_queue`): when the server is saturated
    submissions fail fast with ServerSaturated (optionally after blocking
    `submit_timeout_ms`) instead of building unbounded latency — load
    shedding is the correct backpressure for a latency-SLO service.
  - Queries must share one print length (`query_prints`): batched matching
    is a fixed-shape jit program; a serving deployment pins the query
    window (e.g. 10 s) at config time, exactly like the streaming session
    pins its window. Wrong-length submissions fail fast.

The reference has no serving stack (single-process C++ library, SURVEY.md
§1.1); this is the TPU-native production wrapper over its match() surface.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor

import numpy as np


class ServerSaturated(RuntimeError):
    """Submit queue is full: the server is shedding load."""


class MatchServer:
    """Micro-batching wrapper around TwoStageDB.dispatch_batch."""

    def __init__(self, ts, query_prints: int, *, max_batch: int = 16,
                 max_wait_ms: float = 5.0, depth: int = 2,
                 top_k: int | None = None, pool: int | None = None,
                 max_queue: int = 256, submit_timeout_ms: float = 0.0,
                 rank_workers: int = 4):
        import jax.numpy as jnp

        self._jnp = jnp
        self.ts = ts
        self.n_q = int(query_prints)
        self.max_batch = int(max_batch)
        self.max_wait = max_wait_ms / 1e3
        self.depth = int(depth)
        self.top_k = top_k
        self.pool = pool
        self.submit_timeout = submit_timeout_ms / 1e3
        self._q: queue.Queue = queue.Queue(maxsize=int(max_queue))
        self._stop = threading.Event()
        self._device_slots = threading.Semaphore(self.depth)
        self._rank_pool = ThreadPoolExecutor(
            max_workers=int(rank_workers), thread_name_prefix="hpfw-rank")
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # ---- client surface -------------------------------------------------
    def submit(self, query_prints: np.ndarray,
               timeout_ms: float | None = None) -> Future:
        """Queue one (N, 2)-uint32 query; resolves to (ids, scores, offs).

        When the bounded submit queue is full, blocks up to `timeout_ms`
        (default: the server's submit_timeout_ms) and then resolves the
        future with ServerSaturated — callers see backpressure, not
        unbounded queueing latency.
        """
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
        wait = self.submit_timeout if timeout_ms is None else timeout_ms / 1e3
        try:
            if wait > 0:
                self._q.put((q, fut), timeout=wait)
            else:
                self._q.put_nowait((q, fut))
        except queue.Full:
            fut.set_exception(ServerSaturated(
                f"submit queue full ({self._q.maxsize} pending)"))
        return fut

    def match(self, query_prints: np.ndarray):
        """Blocking convenience wrapper."""
        return self.submit(query_prints, timeout_ms=None).result()

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
        try:
            self._q.put_nowait(None)       # wake the dispatcher
        except queue.Full:
            pass                           # dispatcher is draining; stop flag set
        self._thread.join()
        self._rank_pool.shutdown(wait=True)

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
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.max_batch:
            left = deadline - time.monotonic()
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
            # Bound the device queue: a slot frees when a result lands.
            acquired = False
            while not acquired and not self._stop.is_set():
                acquired = self._device_slots.acquire(timeout=0.1)
            if not acquired:
                for _, fut in batch:
                    if fut.set_running_or_notify_cancel():
                        fut.set_exception(RuntimeError("server closed"))
                break
            qs = self._jnp.asarray(np.stack(rows))
            out_dev = self.ts.dispatch_batch(qs, pool=self.pool)
            self._rank_pool.submit(self._finish, out_dev,
                                   [f for _, f in batch])
        # Fail anything still queued after close().
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[1].set_exception(RuntimeError("server closed"))

    def _finish(self, out_dev, futs):
        """Worker-pool side: device sync + per-query host ranking."""
        try:
            out = np.asarray(out_dev)
        except Exception as e:                     # device failure: fail futures
            self._device_slots.release()
            for fut in futs:
                if fut.set_running_or_notify_cancel():
                    fut.set_exception(e)
            return
        self._device_slots.release()
        for b, fut in enumerate(futs):
            if fut.set_running_or_notify_cancel():
                try:
                    fut.set_result(self._rank(out[b]))
                except Exception as e:
                    fut.set_exception(e)

    def _rank(self, out_b: np.ndarray):
        from .match.scaled import _rank_dedup

        cfg = self.ts.db.cfg
        scores, idx, offs = out_b
        real = idx < self.ts.n_real
        return _rank_dedup(scores[real], idx[real], offs[real],
                           self.ts.db.track_ids,
                           self.top_k if self.top_k else cfg.top_k)
