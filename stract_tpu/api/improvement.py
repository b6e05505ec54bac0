"""Click improvement logging (role of reference improvement.rs:20-92 +
api/improvement.rs: click events behind a LeakyQueue, drained to storage —
ScyllaDB there, an append-only jsonl/kv here for LTR training data)."""

from __future__ import annotations

import json
import os
import queue
import threading
import time


class LeakyQueue:
    """Bounded queue that drops oldest events under pressure."""

    def __init__(self, maxsize: int = 10_000):
        self.q: queue.Queue = queue.Queue(maxsize=maxsize)

    def push(self, item) -> None:
        try:
            self.q.put_nowait(item)
        except queue.Full:
            try:
                self.q.get_nowait()
            except queue.Empty:
                pass
            try:
                self.q.put_nowait(item)
            except queue.Full:
                pass

    def drain(self) -> list:
        out = []
        while True:
            try:
                out.append(self.q.get_nowait())
            except queue.Empty:
                return out


class ImprovementLog:
    def __init__(self, path: str | None = None, flush_interval: float = 5.0):
        self.path = path
        self.queue = LeakyQueue()
        self._stop = threading.Event()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._thread = threading.Thread(target=self._flush_loop, args=(flush_interval,), daemon=True)
            self._thread.start()

    def log(self, qid: str, click: str) -> None:
        self.queue.push({"qid": qid, "click": click, "ts": time.time()})

    def store(self, query: str, urls: list) -> str:
        """Store a served query + result URLs, returning its qid (role of
        reference api/improvement.rs:64-80 StoreQuery → ScyllaDB)."""
        import uuid

        qid = uuid.uuid4().hex
        self.queue.push({"qid": qid, "query": query, "urls": urls, "ts": time.time()})
        return qid

    def _flush_loop(self, interval: float) -> None:
        while not self._stop.is_set():
            self._stop.wait(interval)
            self.flush()

    def flush(self) -> None:
        events = self.queue.drain()
        if events and self.path:
            with open(self.path, "a") as fh:
                for e in events:
                    fh.write(json.dumps(e) + "\n")

    def close(self) -> None:
        self._stop.set()
        self.flush()
