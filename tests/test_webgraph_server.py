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
