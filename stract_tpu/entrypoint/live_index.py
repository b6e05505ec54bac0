"""Live-index shard server (role of reference entrypoint/live_index/
search_server.rs:173 LiveIndexService: IndexWebpages RPC :369, replication with
consistency_fraction quorum :243-305, background TTL/compact/autocommit loop)."""

from __future__ import annotations

import threading

from ..distributed.cluster import Cluster, Service
from ..distributed.replication import ReplicatedClient
from ..distributed.sonic import serve_in_thread, RpcError
from ..live_index import LiveIndex
from ..searcher.local import LocalSearcher
from ..searcher.query import SearchQuery
from .indexer import IndexingWorker
from .search_server import candidate_to_wire, resolve_wire_pointers

DEFAULT_CONSISTENCY_FRACTION = 0.5


class LiveIndexService:
    def __init__(self, live: LiveIndex, shard_id: int = 0, worker: IndexingWorker | None = None):
        self.live = live
        self.shard_id = shard_id
        self.worker = worker or IndexingWorker()
        self.searcher = LocalSearcher(live.index, shard_id=shard_id, lazy_signals=False)
        self._lock = threading.Lock()

    # -- RPC methods ------------------------------------------------------------
    def index_webpages(self, body: dict) -> dict:
        """body: {pages: [{url, html}]} — prepare + WAL + insert."""
        n = 0
        with self._lock:
            for page in body["pages"]:
                doc = self.worker.prepare(page["html"], page["url"])
                if doc is not None:
                    self.live.insert(doc)
                    n += 1
        return {"indexed": n}

    def commit(self, body=None) -> bool:
        with self._lock:
            self.live.commit()
        return True

    def tick(self, body=None) -> bool:
        with self._lock:
            self.live.tick()
        return True

    def search(self, body: dict) -> dict:
        sq = SearchQuery.from_json(body)
        candidates, count = self.searcher.search_initial(sq)
        return {"candidates": [candidate_to_wire(c) for c in candidates], "count": count.to_json()}

    def retrieve(self, body: dict) -> list:
        sq = SearchQuery.from_json(body["query"])
        ptrs, segs = resolve_wire_pointers(self.live.index, body["pointers"])
        live_ptrs = [p for p in ptrs if p is not None]
        docs = iter(self.searcher.retrieve(sq, live_ptrs, segments=segs))
        return [(next(docs) if p is not None else {}) for p in ptrs]

    def size(self, body=None) -> dict:
        return {"num_docs": self.live.index.num_docs}


class LiveIndexClient:
    """Client-side quorum writes: pages go to ALL replicas; the write succeeds
    when ≥ consistency_fraction of replicas acked (reference :243-305)."""

    def __init__(self, replicas: ReplicatedClient, consistency_fraction: float = DEFAULT_CONSISTENCY_FRACTION):
        self.replicas = replicas
        self.fraction = consistency_fraction

    def index_webpages(self, pages: list[dict]) -> int:
        n = len(self.replicas.clients)
        results = []
        errors = 0
        for c in self.replicas.clients:
            try:
                results.append(c.send("index_webpages", {"pages": pages}))
            except RpcError:
                errors += 1
        acked = len(results)
        if acked < max(1, int(self.fraction * n + 0.999999)):
            raise RpcError(f"quorum failed: {acked}/{n} replicas acked")
        return max(r["indexed"] for r in results)


def run(path: str, shard_id: int, host: str = "127.0.0.1", port: int = 0,
        gossip_addr=("127.0.0.1", 0), gossip_seeds=()):
    live = LiveIndex(path)
    service = LiveIndexService(live, shard_id=shard_id)
    server = serve_in_thread(service, host, port)
    cluster = Cluster.join(
        Service("live-index", host=server.addr, shard=shard_id),
        gossip_addr=gossip_addr, seeds=gossip_seeds,
    )
    return server, cluster
