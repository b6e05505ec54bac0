"""AMPC framework tests: DHT upserts, double-buffered rounds, distributed
harmonic centrality + shortest paths on an in-process cluster, and the
coordinator's failure-driven rescheduling (role of reference
entrypoint/ampc/shortest_path in-process tests + coordinator.rs:174-206)."""

import numpy as np
import pytest

from stract_tpu.ampc.dht import DhtShard, DhtClient, start_dht, upsert
from stract_tpu.ampc.dht_conn import DhtConn, DhtTable
from stract_tpu.ampc.harmonic import (
    HarmonicWorker,
    partition_edges,
    run_distributed_harmonic,
)
from stract_tpu.ampc.worker import start_worker
from stract_tpu.webgraph import Edge, WebgraphBuilder
from stract_tpu.webgraph.centrality import harmonic_centrality


@pytest.fixture
def dht():
    servers, client = start_dht(num_shards=2)
    yield client
    for s in servers:
        s.stop()


def test_dht_basic_ops(dht):
    dht.batch_set("t", [(b"a", 1), (b"b", [1, 2])])
    assert dht.get("t", b"a") == 1
    assert dht.get("t", b"b") == [1, 2]
    assert dht.get("t", b"missing") is None
    assert dht.num_keys("t") == 2
    assert dict(dht.scan("t")) == {b"a": 1, b"b": [1, 2]}


def test_dht_upserts(dht):
    dht.batch_upsert("u", upsert.U64_ADD, [(b"x", 5)])
    dht.batch_upsert("u", upsert.U64_ADD, [(b"x", 3)])
    assert dht.get("u", b"x") == 8
    dht.batch_upsert("u", upsert.U64_MIN, [(b"m", 5)])
    dht.batch_upsert("u", upsert.U64_MIN, [(b"m", 3)])
    dht.batch_upsert("u", upsert.U64_MIN, [(b"m", 9)])
    assert dht.get("u", b"m") == 3
    a = np.array([1, 5, 2], dtype=np.uint8).tobytes()
    b = np.array([3, 1, 2], dtype=np.uint8).tobytes()
    dht.batch_upsert("u", upsert.HLL_MAX, [(b"h", a)])
    dht.batch_upsert("u", upsert.HLL_MAX, [(b"h", b)])
    assert np.frombuffer(dht.get("u", b"h"), dtype=np.uint8).tolist() == [3, 5, 2]


def test_dht_conn_rounds(dht):
    conn = DhtConn(dht, ["regs"])
    conn.prev("regs").set(b"k", 1)
    conn.next("regs").set(b"k", 2)
    assert conn.prev("regs").get(b"k") == 1
    conn.next_round()
    assert conn.prev("regs").get(b"k") == 2
    # old prev dropped
    assert dht.num_keys("regs@0") == 0


def _build_graph(tmp_path):
    b = WebgraphBuilder()
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "a"), ("b", "d")]
    for f, t in edges:
        b.insert(Edge(f, t))
    return b.build(str(tmp_path / "g"))


def test_distributed_harmonic_matches_single(tmp_path, dht):
    graph = _build_graph(tmp_path)
    parts = partition_edges(graph, 2)
    workers = [
        start_worker(HarmonicWorker(s, 2, ef, et, graph.num_nodes, precision=6))
        for s, (ef, et) in enumerate(parts)
    ]
    try:
        dist = run_distributed_harmonic(graph, [w.addr for w in workers], dht, 2, precision=6)
        single = harmonic_centrality(graph, precision=6)
        # single-device estimates in f32 on device, AMPC in f64 on host → tiny drift
        for name in single:
            assert abs(dist[name] - single[name]) < 1e-4, name
    finally:
        for w in workers:
            w.stop()


def test_distributed_shortest_path(tmp_path, dht):
    from stract_tpu.ampc.shortest_path import ShortestPathWorker, run_distributed_shortest_path

    graph = _build_graph(tmp_path)
    parts = partition_edges(graph, 2)
    workers = [
        start_worker(ShortestPathWorker(s, 2, ef, et, graph.num_nodes))
        for s, (ef, et) in enumerate(parts)
    ]
    try:
        d = run_distributed_shortest_path(graph, "a", [w.addr for w in workers], dht, 2)
        assert d["a"] == 0 and d["b"] == 1 and d["c"] == 1 and d["d"] == 2
    finally:
        for w in workers:
            w.stop()


def test_coordinator_reschedules_on_worker_death(tmp_path, dht):
    """Kill one worker mid-setup; its jobs must run on the surviving compatible
    worker (both own shard 0 here)."""
    graph = _build_graph(tmp_path)
    parts = partition_edges(graph, 1)
    ef, et = parts[0]
    w1 = start_worker(HarmonicWorker(0, 1, ef, et, graph.num_nodes))
    w2 = start_worker(HarmonicWorker(0, 1, ef, et, graph.num_nodes))
    # w1 dies before the run
    addr1 = w1.addr
    w1.stop()
    try:
        dist = run_distributed_harmonic(graph, [addr1, w2.addr], dht, 1)
        single = harmonic_centrality(graph, precision=6)
        for name in single:
            assert abs(dist[name] - single[name]) < 1e-4
    finally:
        w2.stop()
