"""Continuous-batching inference server.

The reference is single-request synchronous (run_graph blocks on one
image; its only pipelining is the app-level actor framework in
examples/pipeline). For production TPU serving the engine adds:

  * a dynamic batcher: requests arriving within a small window are padded
    into power-of-two batch buckets (one XLA executable per bucket, cached
    by jit) and dispatched as one program;
  * DP over the mesh "data" axis: the batch dimension is sharded across
    chips (parallel/sharding.py), so a bucket of B images runs B/дата-size
    per chip with no cross-chip traffic except at input scatter;
  * multi-host: with jax.distributed initialized (distributed.py), the same
    code runs with a global mesh — host-local queues feed the global batch
    via jax.make_array_from_process_local_data over DCN.

Latency/throughput knobs: max_batch (bucket cap) and max_wait_ms (batching
window) — the standard continuous-batching tradeoff.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import numpy as np

from ..executor.engine import CompiledGraph
from ..graph.ir import Graph
from ..utils.config import Options
from ..utils.log import logger


@dataclass
class _Request:
    x: np.ndarray
    future: Future
    enqueued_at: float


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class InferenceServer:
    """Dynamic-batching server over a compiled graph.

    Example:
        server = InferenceServer(graph, options=Options(), max_batch=32)
        server.start()
        fut = server.submit(image)          # [C, H, W] or [1, C, H, W]
        result = fut.result()
    """

    def __init__(
        self,
        graph: Graph,
        options: Optional[Options] = None,
        mesh=None,
        max_batch: int = 32,
        max_wait_ms: float = 2.0,
    ):
        from ..executor.engine import compile_graph

        self.options = options or Options.from_env()
        self.mesh = mesh
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.graph = graph

        # compile per bucket lazily; bucket 1 eagerly so first request is warm
        self._compiled: dict = {}
        self._base_shape = [int(d) for d in graph.tensors[graph.input_tensors[0]].shape]
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self.stats = {"batches": 0, "requests": 0, "padded": 0}
        self._latencies: List[float] = []  # seconds, submit -> result set
        self._lat_cap = 100_000

    def _get_compiled(self, batch: int) -> CompiledGraph:
        cg = self._compiled.get(batch)
        if cg is None:
            from ..executor.engine import compile_graph
            from .sharding import shard_compiled
            import dataclasses

            opts = dataclasses.replace(self.options, batch_size=batch)
            cg = compile_graph(self.graph, opts)
            if self.mesh is not None and batch % self.mesh.shape.get("data", 1) == 0:
                cg = shard_compiled(cg, self.mesh)
            self._compiled[batch] = cg
        return cg

    # -- public API --------------------------------------------------------

    def start(self):
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._running = False
        if self._thread:
            self._thread.join(timeout=5)

    def submit(self, x: np.ndarray) -> Future:
        x = np.asarray(x)
        if x.ndim == len(self._base_shape) - 1:
            x = x[None]
        if x.shape[0] != 1:
            raise ValueError("submit one request at a time; batching is internal")
        fut: Future = Future()
        self._queue.put(_Request(x=x, future=fut, enqueued_at=time.perf_counter()))
        return fut

    def __call__(self, x: np.ndarray):
        return self.submit(x).result()

    # -- batching loop -----------------------------------------------------

    def _collect(self) -> List[_Request]:
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        deadline = first.enqueued_at + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while self._running:
            batch = self._collect()
            if not batch:
                continue
            n = len(batch)
            b = _bucket(n, self.max_batch)
            x = np.concatenate([r.x for r in batch], axis=0)
            if b > n:  # pad to the bucket size
                pad = np.zeros((b - n,) + x.shape[1:], x.dtype)
                x = np.concatenate([x, pad], axis=0)
                self.stats["padded"] += b - n
            try:
                cg = self._get_compiled(b)
                outs = cg.run(x)
            except Exception as e:  # pragma: no cover
                logger.error("serving batch failed: %s", e)
                for r in batch:
                    r.future.set_exception(e)
                continue
            self.stats["batches"] += 1
            self.stats["requests"] += n
            done = time.perf_counter()
            for i, r in enumerate(batch):
                r.future.set_result([o[i : i + 1] for o in outs])
                if len(self._latencies) < self._lat_cap:
                    self._latencies.append(done - r.enqueued_at)

    def latency_stats(self) -> dict:
        """End-to-end request latency percentiles in ms (p50 is the
        BASELINE.json serving metric)."""
        if not self._latencies:
            return {}
        a = np.asarray(self._latencies) * 1e3
        return {
            "count": int(a.size),
            "mean_ms": float(a.mean()),
            "p50_ms": float(np.percentile(a, 50)),
            "p90_ms": float(np.percentile(a, 90)),
            "p99_ms": float(np.percentile(a, 99)),
        }
