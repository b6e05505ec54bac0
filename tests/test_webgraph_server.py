"""WebGraphService RPC + RemoteWebgraph fan-out over two graph shards."""

import pytest

from stract_tpu.distributed.replication import ReplicatedClient, ShardedClient
from stract_tpu.distributed.sonic import serve_in_thread
from stract_tpu.entrypoint.webgraph_server import WebGraphService
from stract_tpu.webgraph import Edge, Webgraph, WebgraphBuilder
from stract_tpu.webgraph.remote import RemoteWebgraph


@pytest.fixture(scope="module")
def remote(tmp_path_factory):
    servers = []
    shards = {}
    shard_edges = [
        [("a.com", "b.com"), ("c.com", "b.com"), ("b.com", "d.com")],
        [("x.com", "b.com"), ("x.com", "y.com")],
    ]
    for sid, edges in enumerate(shard_edges):
        b = WebgraphBuilder()
        for f, t in edges:
            b.insert(Edge(f, t, label=f"{f} links {t}"))
        g = b.build(str(tmp_path_factory.mktemp(f"wg{sid}")))
        srv = serve_in_thread(WebGraphService(g, sid))
        servers.append(srv)
        shards[sid] = ReplicatedClient([srv.addr])
    yield RemoteWebgraph(ShardedClient(shards))
    for s in servers:
        s.stop()


def test_backlinks_across_shards(remote):
    bl = remote.backlinks("b.com")
    froms = {e["from"] for e in bl}
    assert froms == {"a.com", "c.com", "x.com"}


def test_forwardlinks_and_knows(remote):
    fl = remote.forwardlinks("x.com")
    assert {e["to"] for e in fl} == {"b.com", "y.com"}
    assert remote.knows("a.com")
    assert not remote.knows("nope.example")


def test_backlink_labels(remote):
    labels = remote.backlink_labels("b.com")
    assert "a.com links b.com" in labels


def test_id2node(remote):
    from stract_tpu.utils.hashing import prehash

    assert remote.id2node(prehash("d.com")) == "d.com"


@pytest.fixture(scope="module")
def page_remote(tmp_path_factory):
    """Page-level graphs (several linking pages per host) across two shards —
    the shape HostGroupSketchQuery exists for."""
    servers = []
    shards = {}
    shard_edges = [
        [("a.com/p1", "t.com/x"), ("a.com/p2", "t.com/x"), ("b.com/p1", "t.com/x"),
         ("t.com/x", "t.com/x")],  # self link must be skipped
        [("a.com/p3", "t.com/x"), ("c.com/p1", "t.com/x"), ("t.com/x", "d.com/z")],
    ]
    for sid, edges in enumerate(shard_edges):
        b = WebgraphBuilder()
        for f, t in edges:
            b.insert(Edge(f, t))
        g = b.build(str(tmp_path_factory.mktemp(f"pg{sid}")))
        srv = serve_in_thread(WebGraphService(g, sid))
        servers.append(srv)
        shards[sid] = ReplicatedClient([srv.addr])
    yield RemoteWebgraph(ShardedClient(shards))
    for s in servers:
        s.stop()


def test_group_sketch_across_shards(page_remote):
    """HostGroupSketchQuery role: backlinks of t.com/x grouped by linking
    host, distinct linking pages sketched per group and HLL-merged across
    shards (reference group_by.rs:40 + group_sketch.rs merge_fruits)."""
    groups = page_remote.group_sketch("t.com/x")
    assert set(groups) == {"a.com", "b.com", "c.com"}  # self link skipped
    # precision 12 → sketch error ≪ 1 at these cardinalities
    assert len(groups["a.com"]) == 3  # p1, p2 (shard 0) + p3 (shard 1)
    assert len(groups["b.com"]) == 1
    assert len(groups["c.com"]) == 1


def test_group_exact_across_shards(page_remote):
    groups = page_remote.group_exact("t.com/x")
    assert set(groups["a.com"]) == {"a.com/p1", "a.com/p2", "a.com/p3"}
    assert set(groups["b.com"]) == {"b.com/p1"}


def test_group_sketch_forward_direction(page_remote):
    groups = page_remote.group_sketch("t.com/x", direction="from")
    assert set(groups) == {"d.com"}
    assert len(groups["d.com"]) == 1
