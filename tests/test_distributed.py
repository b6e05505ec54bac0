"""Distributed fabric tests: sonic RPC round-trips, gossip membership, and a
real in-process 2-shard search cluster over localhost (mirrors the reference's
multi-node-on-one-box test pattern, entrypoint/live_index/tests.rs:42-120)."""

import time

import numpy as np
import pytest

from stract_tpu.distributed.sonic import serve_in_thread, RemoteClient, pack, unpack, ApplicationError
from stract_tpu.distributed.cluster import Cluster, Service
from stract_tpu.distributed.replication import (
    ReplicatedClient,
    ShardedClient,
    AllShardsSelector,
    RandomReplicaSelector,
    ReusableShardedClient,
)

from conftest import make_doc


class EchoService:
    def echo(self, body):
        return body

    def add(self, body):
        return body["a"] + body["b"]

    def boom(self, body):
        raise ValueError("kaboom")

    def arr(self, body):
        return {"doubled": np.asarray(body["x"]) * 2}


def test_pack_roundtrip_numpy():
    x = {"a": np.arange(5, dtype=np.int32), "b": [1, "two", 3.0], "c": {"d": None}}
    y = unpack(pack(x))
    np.testing.assert_array_equal(y["a"], x["a"])
    assert y["b"] == [1, "two", 3.0]


def test_sonic_roundtrip():
    srv = serve_in_thread(EchoService())
    try:
        client = RemoteClient(srv.addr)
        assert client.send("echo", {"hello": "world"}) == {"hello": "world"}
        assert client.send("add", {"a": 2, "b": 3}) == 5
        out = client.send("arr", {"x": np.ones(4, dtype=np.float32)})
        np.testing.assert_array_equal(out["doubled"], np.full(4, 2.0, dtype=np.float32))
        with pytest.raises(ApplicationError, match="kaboom"):
            client.send("boom", {})
        # reuses pooled connections
        for _ in range(10):
            client.send("echo", 1)
    finally:
        srv.stop()


def test_gossip_membership():
    a = Cluster.join(Service("api"), interval=0.1, failure_timeout=2.0)
    b = Cluster.join(Service("search-server", host=("127.0.0.1", 1234), shard=0),
                     seeds=[a.gossip_addr], interval=0.1, failure_timeout=2.0)
    c = Cluster.join(Service("search-server", host=("127.0.0.1", 1235), shard=1),
                     seeds=[a.gossip_addr], interval=0.1, failure_timeout=2.0)
    try:
        found = a.await_member(lambda m: m.service.kind == "search-server" and m.service.shard == 1, timeout=10)
        assert found is not None
        time.sleep(0.5)
        kinds = sorted(s.kind for s in a.services())
        assert kinds.count("search-server") == 2
        # failure detection: shut down c, it must disappear from a's view
        c.shutdown()
        deadline = time.monotonic() + 8
        while time.monotonic() < deadline:
            if len(a.services("search-server")) == 1:
                break
            time.sleep(0.2)
        assert len(a.services("search-server")) == 1
    finally:
        a.shutdown()
        b.shutdown()


@pytest.fixture(scope="module")
def two_shard_cluster(tmp_path_factory):
    """Two real search shards + RPC servers on localhost."""
    from stract_tpu.index import InvertedIndex
    from stract_tpu.entrypoint.search_server import SearchService

    docs_shard0 = [
        make_doc("https://rust-lang.org/", "The Rust Programming Language",
                 "rust is a systems programming language", host_centrality=0.9),
        make_doc("https://blog.io/cooking", "Cooking pasta", "how to cook pasta"),
    ]
    docs_shard1 = [
        make_doc("https://python.org/", "Python Language", "python is a programming language",
                 host_centrality=0.8),
        make_doc("https://news.site/rust", "Rust news", "rust programming adoption grows"),
    ]
    servers = []
    shards = {}
    for sid, docs in enumerate([docs_shard0, docs_shard1]):
        idx = InvertedIndex(str(tmp_path_factory.mktemp(f"shard{sid}")))
        for d in docs:
            idx.insert(d)
        idx.commit()
        srv = serve_in_thread(SearchService(idx, shard_id=sid))
        servers.append(srv)
        shards[sid] = ReplicatedClient([srv.addr])
    yield ShardedClient(shards)
    for s in servers:
        s.stop()


def test_distributed_search(two_shard_cluster):
    from stract_tpu.searcher.distributed import DistributedSearcher
    from stract_tpu.searcher.query import SearchQuery

    ds = DistributedSearcher(two_shard_cluster)
    candidates, count = ds.search_initial(SearchQuery(query="programming"))
    assert count.value >= 2
    shards_seen = {c.shard for c in candidates}
    assert shards_seen == {0, 1}

    ds.retrieve(SearchQuery(query="programming"), candidates)
    assert all(c.retrieved for c in candidates)
    assert ds.size() == 4


def test_api_searcher_end_to_end(two_shard_cluster):
    from stract_tpu.searcher.api import ApiSearcher, WebsitesResult, BangResult
    from stract_tpu.searcher.distributed import DistributedSearcher
    from stract_tpu.searcher.query import SearchQuery

    api = ApiSearcher(DistributedSearcher(two_shard_cluster))
    res = api.search(SearchQuery(query="rust programming", return_ranking_signals=True))
    assert isinstance(res, WebsitesResult)
    assert len(res.webpages) >= 1
    assert "rust" in res.webpages[0]["title"].lower()
    assert "rankingSignals" in res.webpages[0]

    # bang redirect
    res = api.search(SearchQuery(query="!g rust"))
    assert isinstance(res, BangResult)
    assert "google" in res.redirect_to and "rust" in res.redirect_to


def test_replica_failover():
    srv = serve_in_thread(EchoService())
    dead_addr = ("127.0.0.1", 1)  # nothing listens there
    rc = ReplicatedClient([dead_addr, srv.addr])
    try:
        # RandomReplicaSelector retries the live replica when the dead one is hit
        for _ in range(5):
            assert rc.send("echo", "hi") == ["hi"]
    finally:
        srv.stop()


def test_live_index_merged_into_search(two_shard_cluster, tmp_path):
    """Fresh docs from the live tier appear alongside backbone results
    (reference ShardId::{Backbone,Live} merge)."""
    from stract_tpu.distributed.replication import ReplicatedClient, ShardedClient
    from stract_tpu.distributed.sonic import serve_in_thread
    from stract_tpu.entrypoint.live_index import LiveIndexService
    from stract_tpu.live_index import LiveIndex
    from stract_tpu.searcher.distributed import DistributedSearcher, LIVE_SHARD_OFFSET
    from stract_tpu.searcher.query import SearchQuery

    live = LiveIndex(str(tmp_path / "live"))
    svc = LiveIndexService(live, shard_id=0)
    svc.index_webpages({"pages": [{
        "url": "https://breaking.news/now",
        "html": "<html><title>Breaking programming news</title><body><p>"
                "a brand new programming language was announced today</p></body></html>",
    }]})
    svc.commit(None)
    srv = serve_in_thread(svc)
    try:
        live_client = ShardedClient({0: ReplicatedClient([srv.addr])})
        ds = DistributedSearcher(two_shard_cluster, live_client=live_client)
        sq = SearchQuery(query="programming")
        candidates, count = ds.search_initial(sq)
        shards = {c.shard for c in candidates}
        assert LIVE_SHARD_OFFSET in shards           # live result present
        assert any(s < LIVE_SHARD_OFFSET for s in shards)  # backbone too
        ds.retrieve(sq, candidates)
        urls = [c.retrieved["url"] for c in candidates]
        assert "https://breaking.news/now" in urls
    finally:
        srv.stop()
