"""Webgraph + centrality tests (role of reference webgraph/tests.rs, 735 LoC):
small handcrafted graphs, exact-BFS oracles, device-vs-host register equality."""

import numpy as np
import pytest

from stract_tpu.webgraph import Edge, Webgraph, WebgraphBuilder
from stract_tpu.webgraph.centrality import (
    harmonic_centrality,
    harmonic_centrality_sharded,
    exact_harmonic_centrality,
    centrality_ranks,
)
from stract_tpu.webgraph.shortest_path import distances, approx_harmonic_centrality
from stract_tpu.ops import hll_ops
from stract_tpu.utils.hyperloglog import HyperLogLog


def build_graph(tmp_path, edges, host_graph=False):
    import os

    b = WebgraphBuilder(host_graph=host_graph)
    for f, t in edges:
        b.insert(Edge(f, t, label=f"link {f}->{t}"))
    return b.build(os.path.join(str(tmp_path), "g"))


def test_store_queries(tmp_path):
    g = build_graph(tmp_path, [("a.com", "b.com"), ("a.com", "c.com"), ("b.com", "c.com")])
    assert g.num_nodes == 3
    assert g.num_edges == 3
    ra, rb, rc = g.rank_of("a.com"), g.rank_of("b.com"), g.rank_of("c.com")
    assert {t for t, _ in g.forwardlinks("a.com")} == {rb, rc}
    assert {s for s, _ in g.backlinks("c.com")} == {ra, rb}
    assert g.out_degree(ra) == 2
    assert g.in_degree(rc) == 2
    assert g.name_of(ra) == "a.com"
    lb = g.links_between("a.com", "b.com")
    assert len(lb) == 1 and lb[0].label == "link a.com->b.com"
    # id2node round trip
    from stract_tpu.utils.hashing import prehash
    assert g.id2node(prehash("b.com")) == "b.com"


def test_host_graph_normalization(tmp_path):
    g = build_graph(tmp_path, [("https://www.a.com/page1", "https://b.com/x")], host_graph=True)
    assert g.rank_of("a.com") is not None
    assert g.rank_of("b.com") is not None


def test_hll_init_matches_host_class():
    regs = hll_ops.init_registers(100, precision=6)
    for i in [0, 7, 42, 99]:
        h = HyperLogLog(6)
        h.add_u64(i)
        np.testing.assert_array_equal(regs[i], h.registers, err_msg=f"node {i}")


def test_hyperball_registers_match_host_simulation(tmp_path):
    """Device gather+scatter-max rounds must produce exactly the registers a
    host HLL merge produces — no estimator tolerance needed."""
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "a")]
    g = build_graph(tmp_path, edges)
    n = g.num_nodes
    out_off = np.asarray(g.out_offsets, dtype=np.int64)
    ef = np.repeat(np.arange(n, dtype=np.int32), np.diff(out_off))
    et = np.asarray(g.out_targets, dtype=np.int32)

    import jax.numpy as jnp

    dev = jnp.asarray(hll_ops.init_registers(n, 6))
    host = hll_ops.init_registers(n, 6).copy()
    for _ in range(3):
        dev = hll_ops.merge_iteration(dev, jnp.asarray(ef), jnp.asarray(et))
        new_host = host.copy()
        for f, t in zip(ef, et):
            np.maximum(new_host[t], host[f], out=new_host[t])
        host = new_host
    np.testing.assert_array_equal(np.asarray(dev), host)


def test_harmonic_centrality_ordering(tmp_path):
    # star: everyone links to hub; hub should dominate
    edges = [(f"n{i}.com", "hub.com") for i in range(8)]
    edges += [("n0.com", "n1.com")]
    g = build_graph(tmp_path, edges)
    c = harmonic_centrality(g, precision=8)
    assert max(c, key=c.get) == "hub.com"
    exact = exact_harmonic_centrality(g)
    assert max(exact, key=exact.get) == "hub.com"
    # HLL estimate within tolerance of exact for every node (p=8 → ~6.5% stderr)
    for name in exact:
        assert abs(c[name] - exact[name]) <= max(0.25 * exact[name], 0.08), name


def test_harmonic_sharded_matches_single_device(tmp_path):
    import jax
    from jax.sharding import Mesh

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a"), ("a", "c"), ("b", "d")]
    g = build_graph(tmp_path, edges)
    single = harmonic_centrality(g, precision=6)
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("x",))
    sharded = harmonic_centrality_sharded(g, mesh, precision=6)
    for name in single:
        assert abs(single[name] - sharded[name]) < 1e-5, name


def test_centrality_ranks():
    ranks = centrality_ranks({"a": 0.9, "b": 0.5, "c": 0.5, "d": 0.1})
    assert ranks["a"] == 0
    assert ranks["b"] == ranks["c"] == 1
    assert ranks["d"] == 3


def test_shortest_path(tmp_path):
    g = build_graph(tmp_path, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    d = distances(g, "a")
    assert d["a"] == 0 and d["b"] == 1 and d["c"] == 1 and d["d"] == 2


def test_approx_harmonic_correlates_exact(tmp_path):
    rng = np.random.default_rng(3)
    nodes = [f"h{i}" for i in range(30)]
    edges = [(nodes[rng.integers(30)], nodes[rng.integers(30)]) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    g = build_graph(tmp_path, edges)
    exact = exact_harmonic_centrality(g)
    approx = approx_harmonic_centrality(g, num_samples=g.num_nodes)  # all sources = exact
    for name in exact:
        assert abs(exact[name] - approx[name]) < 1e-9


def test_inbound_similarity(tmp_path):
    # x and y share in-linkers; z does not
    edges = [("l1", "x"), ("l2", "x"), ("l1", "y"), ("l2", "y"), ("l3", "z")]
    g = build_graph(tmp_path, edges)
    from stract_tpu.ranking.inbound_similarity import InboundSimilarity, host_node_id
    from stract_tpu.optics import HostRankings

    sim = InboundSimilarity(g)
    hr = HostRankings(liked=["x"])
    scores = sim.score(hr, [host_node_id("y"), host_node_id("z")])
    assert scores[0] > 0.9
    assert scores[1] == 0.0

    similar = sim.similar_hosts(["x"], top_k=5)
    assert similar and similar[0][0] == "y"


def test_kv_store(tmp_path):
    from stract_tpu.kv import Db

    db = Db.open(str(tmp_path / "kv"))
    db.insert(b"alpha", {"v": 1})
    db.insert(b"beta", [1, 2, 3])
    db.commit()
    db.insert(b"gamma", "third")
    db.commit()
    assert db.get(b"alpha") == {"v": 1}
    assert db.get(b"beta") == [1, 2, 3]
    assert db.get(b"gamma") == "third"
    assert db.get(b"missing") is None
    assert b"alpha" in db and b"nope" not in db
    assert len(db) == 3

    # reopen from disk
    db2 = Db.open(str(tmp_path / "kv"))
    assert db2.get(b"alpha") == {"v": 1}
    db2.merge_segments()
    assert len(db2.segments) == 1
    assert db2.get(b"beta") == [1, 2, 3]
    assert dict(db2.items())[b"gamma"] == "third"


def test_merge_graphs(tmp_path):
    from stract_tpu.webgraph.store import merge_graphs

    g1 = build_graph(tmp_path / "g1", [("a", "b"), ("b", "c")])
    g2 = build_graph(tmp_path / "g2", [("c", "d"), ("a", "b")])
    merged = merge_graphs([g1.path, g2.path], str(tmp_path / "m"))
    assert merged.num_nodes == 4
    assert merged.num_edges == 3  # a→b deduped
    assert {t for t, _ in merged.forwardlinks("a")} == {merged.rank_of("b")}
    lb = merged.links_between("a", "b")
    assert lb and lb[0].label == "link a->b"

