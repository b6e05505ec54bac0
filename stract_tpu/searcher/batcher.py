"""Query micro-batcher for shard servers.

The device pass-1 throughput is ~10x higher when concurrent queries share one
compiled batch program (bench.py), so the shard server funnels concurrent
`search` RPCs through this batcher: requests queue, a worker drains up to
`max_batch` every `window_ms`, runs InvertedIndex.search_initial_batch once,
and resolves the callers' futures. Single outstanding queries pass through with
only the window's latency added.

(The reference has no equivalent — tantivy scales with CPU threads; on TPU,
batch parallelism is the thread pool.)"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future


class QueryBatcher:
    def __init__(self, index, max_batch: int = 64, window_ms: float = 4.0,
                 top_k: int = 1024):
        self.index = index
        self.max_batch = max_batch
        self.window = window_ms / 1000.0
        self.top_k = top_k
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def search_initial(self, ctx):
        """Blocking: enqueue + wait for the batched result → (ptrs, scores)."""
        fut: Future = Future()
        self._q.put((ctx, fut))
        return fut.result(timeout=90)

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.2)
            except queue.Empty:
                continue
            batch = [first]
            deadline = None
            import time

            deadline = time.monotonic() + self.window
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            ctxs = [c for c, _ in batch]
            try:
                results = self.index.search_initial_batch(ctxs, top_k=self.top_k)
                for (_, fut), res in zip(batch, results):
                    fut.set_result(res)
            except Exception as e:  # noqa: BLE001 — propagate to all callers
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=2)
