"""DistributedSearcher — coordinator-side fan-out over search shards (role of
reference searcher/distributed.rs:287: search_initial to AllShards with
RandomReplicaSelector, retrieve to the owning shards)."""

from __future__ import annotations

from ..collector import ApproxCount
from ..distributed.replication import (
    AllShardsSelector,
    RandomReplicaSelector,
    ReusableShardedClient,
    ShardedClient,
    SpecificShardSelector,
)
from ..entrypoint.search_server import candidate_from_wire
from .query import SearchQuery


class DistributedSearcher:
    def __init__(self, client):
        """client: ShardedClient | ReusableShardedClient over 'search-server'."""
        self.client = client

    def search_initial(self, sq: SearchQuery):
        results = self.client.send(
            "search", sq.to_json(), shard_selector=AllShardsSelector(),
            replica_selector=RandomReplicaSelector(),
        )
        candidates = []
        count = ApproxCount(0, True)
        for sid, replies in results.items():
            r = replies[0]
            for c in r["candidates"]:
                cand = candidate_from_wire(c)
                cand.shard = sid
                candidates.append(cand)
            count = count + ApproxCount(r["count"]["value"], r["count"]["exact"])
        return candidates, count

    def retrieve(self, sq: SearchQuery, candidates: list) -> None:
        """Fetch stored docs for candidates from their owning shards, in place."""
        by_shard: dict = {}
        for c in candidates:
            by_shard.setdefault(c.shard, []).append(c)
        for sid, cands in by_shard.items():
            body = {"query": sq.to_json(), "pointers": [c.pointer.to_json() for c in cands]}
            replies = self.client.send(
                "retrieve", body, shard_selector=SpecificShardSelector(sid),
                replica_selector=RandomReplicaSelector(),
            )
            docs = replies[sid][0]
            for c, d in zip(cands, docs):
                c.retrieved = d

    def size(self) -> int:
        results = self.client.send("size", {}, shard_selector=AllShardsSelector(),
                                   replica_selector=RandomReplicaSelector())
        return sum(r[0]["num_docs"] for r in results.values())

    def get_webpage(self, url: str):
        results = self.client.send("get_webpage", {"url": url})
        for replies in results.values():
            if replies[0] is not None:
                return replies[0]
        return None


class LocalShardedSearcher(DistributedSearcher):
    """In-process variant for single-box serving/tests: LocalSearchers behind
    the DistributedSearcher interface without sockets."""

    def __init__(self, searchers: list):
        self.searchers = {s.shard_id: s for s in searchers}

    def search_initial(self, sq: SearchQuery):
        candidates = []
        count = ApproxCount(0, True)
        for sid, s in self.searchers.items():
            cands, cnt = s.search_initial(sq)
            candidates.extend(cands)
            count = count + cnt
        return candidates, count

    def retrieve(self, sq: SearchQuery, candidates: list) -> None:
        by_shard: dict = {}
        for c in candidates:
            by_shard.setdefault(c.shard, []).append(c)
        for sid, cands in by_shard.items():
            docs = self.searchers[sid].retrieve(sq, [c.pointer for c in cands])
            for c, d in zip(cands, docs):
                c.retrieved = d

    def size(self) -> int:
        return sum(s.index.num_docs for s in self.searchers.values())

    def get_webpage(self, url: str):
        from ..entrypoint.search_server import SearchService

        for s in self.searchers.values():
            svc = SearchService.__new__(SearchService)
            svc.searcher = s
            svc.shard_id = s.shard_id
            hit = svc.get_webpage({"url": url})
            if hit:
                return hit
        return None
