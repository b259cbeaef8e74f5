"""Dynamic-batching inference server around the Predictor.

The reference has no serving layer (its predictor is called synchronously
from the CLI, one image or one list at a time).  For production TPU serving
the unit of efficiency is the full static batch: this server queues incoming
requests, coalesces them into the predictor's compiled batch size (padding
the tail), runs one device call, and resolves per-request futures.

Single background worker thread — the TPU executes one program at a time, so
more workers add nothing; concurrency comes from batching.  Host-side only:
no extra compilation beyond the predictor's cached executables.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from img2latex_tpu.training.predictor import ImageLike, Predictor
from img2latex_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclass
class _Request:
    image: ImageLike
    future: Future
    enqueued_at: float
    options: tuple  # hashable decode options key


@dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    batch_fill_sum: float = 0.0
    latency_sum_s: float = 0.0
    # Ring of recent per-request latencies (seconds) for percentile readouts.
    recent_latencies: list = field(default_factory=list)
    recent_cap: int = 2048

    @property
    def mean_batch_fill(self) -> float:
        return self.batch_fill_sum / self.batches if self.batches else 0.0

    @property
    def mean_latency_ms(self) -> float:
        return self.latency_sum_s / self.requests * 1e3 if self.requests else 0.0

    def record_latency(self, seconds: float) -> None:
        self.latency_sum_s += seconds
        self.recent_latencies.append(seconds)
        if len(self.recent_latencies) > self.recent_cap:
            del self.recent_latencies[: -self.recent_cap]

    def latency_percentiles_ms(self) -> dict:
        """p50/p95/p99 over the recent-latency window (ms)."""
        if not self.recent_latencies:
            return {"p50": 0.0, "p95": 0.0, "p99": 0.0}
        xs = sorted(self.recent_latencies)

        def pct(p: float) -> float:
            i = min(int(p * (len(xs) - 1) + 0.5), len(xs) - 1)
            return xs[i] * 1e3

        return {"p50": pct(0.50), "p95": pct(0.95), "p99": pct(0.99)}


class InferenceServer:
    """Queue + coalesce + decode.  Use as a context manager or call
    ``start()``/``stop()`` explicitly; ``submit`` returns a Future[str]."""

    def __init__(
        self,
        predictor: Predictor,
        max_batch: Optional[int] = None,
        max_wait_ms: float = 5.0,
        **decode_options: Any,
    ):
        self.predictor = predictor
        self.max_batch = max_batch or predictor.batch_size
        self.max_wait_s = max_wait_ms / 1e3
        self.decode_options = decode_options
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._submit_lock = threading.Lock()
        self._closed = False
        self._worker: Optional[threading.Thread] = None
        self.stats = ServerStats()

    # ------------------------------------------------------------------
    def start(self) -> "InferenceServer":
        if self._worker is not None:
            return self
        self._stop.clear()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True, name="img2latex-serve")
        self._worker.start()
        return self

    def stop(self, drain: bool = True) -> None:
        with self._submit_lock:
            # Taken under the submit lock: a submit racing with stop would
            # otherwise enqueue after the drain and its future never resolve.
            if self._worker is None:
                return
            self._closed = True
        if drain:
            self._queue.join()
        self._stop.set()
        self._worker.join(timeout=30)
        self._worker = None
        # Reject anything that slipped in after the drain.
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if not req.future.done():
                req.future.set_exception(RuntimeError("InferenceServer stopped"))
            self._queue.task_done()

    def __enter__(self) -> "InferenceServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # ------------------------------------------------------------------
    def submit(self, image: ImageLike, **options: Any) -> "Future[str]":
        """Enqueue one image; resolves to the decoded LaTeX string."""
        with self._submit_lock:
            if self._worker is None or self._closed:
                raise RuntimeError("InferenceServer not started")
            fut: Future = Future()
            key = tuple(sorted({**self.decode_options, **options}.items()))
            self._queue.put(_Request(image, fut, time.perf_counter(), key))
        return fut

    def predict_many(self, images: List[ImageLike], timeout: Optional[float] = None) -> List[str]:
        futures = [self.submit(img) for img in images]
        return [f.result(timeout=timeout) for f in futures]

    # ------------------------------------------------------------------
    def _collect_batch(self) -> List[_Request]:
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                req = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if req.options != first.options:
                # Different decode options: run in a later batch.
                self._queue.put(req)
                self._queue.task_done()
                break
            batch.append(req)
        return batch

    def _run(self) -> None:
        while not self._stop.is_set():
            batch = self._collect_batch()
            if not batch:
                continue
            options = dict(batch[0].options)
            try:
                results = self.predictor.predict_batch(
                    [r.image for r in batch], batch_size=self.max_batch, **options
                )
                now = time.perf_counter()
                for req, result in zip(batch, results):
                    # A queued future can be cancel()ed client-side at any
                    # moment (nothing marks it running); a cancelled future
                    # rejects set_result (InvalidStateError) and must not
                    # poison the rest of the batch.
                    if not req.future.set_running_or_notify_cancel():
                        continue
                    req.future.set_result(result)
                    self.stats.record_latency(now - req.enqueued_at)
                self.stats.requests += len(batch)
                self.stats.batches += 1
                self.stats.batch_fill_sum += len(batch) / self.max_batch
            except Exception as e:  # noqa: BLE001 - propagate to every waiter
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)
            finally:
                for _ in batch:
                    self._queue.task_done()
