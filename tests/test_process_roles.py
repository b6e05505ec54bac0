"""Process-role parity with reference main.rs:49-123: the roles added in
round 3 — entity-search-server as a distributed sonic service, the ampc
{dht|worker|coordinator} deployment, indexer {entity|canonical}, site-stats,
and centrality harmonic-nearest-seed."""

import os

import pytest

from stract_tpu.distributed.cluster import Cluster, Service
from stract_tpu.distributed.replication import ReusableShardedClient
from stract_tpu.main import main
from stract_tpu.warc import WarcWriter
from stract_tpu.zim import ZimWriter


def _write_zim(tmp_path):
    w = ZimWriter()
    w.add_article("Rust", "Rust (programming language)",
                  "<html><body><p>" + "Rust is a systems programming language focused on safety. " * 2 +
                  "</p><table class='infobox'><tr><th>Designed by</th><td>Graydon Hoare</td></tr>"
                  "</table></body></html>")
    p = str(tmp_path / "t.zim")
    w.write(p)
    return p


def _cfg(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_entity_search_server_remote_sidebar(tmp_path):
    """entity-search-server role: sonic service + gossip, consumed by the
    coordinator through RemoteSidebarManager/RemoteEntityImageStore exactly as
    entrypoint/api.py wires it (reference entrypoint/entity_search_server.rs)."""
    from stract_tpu.entrypoint.entity import build_entity_index
    from stract_tpu.entrypoint import entity_search_server as ess
    from stract_tpu.image_store import ImageStore

    build_entity_index(_write_zim(tmp_path), str(tmp_path / "ei"))
    store = ImageStore(str(tmp_path / "img"))
    store.insert("rust.webp", b"\x52\x49\x46\x46fakewebp")

    seed = Cluster.join(Service("api"), interval=0.1, failure_timeout=5.0)
    server, cluster = ess.run(str(tmp_path / "ei"), str(tmp_path / "img"),
                              gossip_seeds=[seed.gossip_addr])
    try:
        assert seed.await_member(lambda m: m.service.kind == "entity-search", timeout=10)
        client = ReusableShardedClient(seed, "entity-search", refresh=0.5)
        sidebar = ess.RemoteSidebarManager(client).sidebar("rust programming")
        assert sidebar and sidebar["type"] == "entity"
        assert sidebar["value"]["info"].get("Designed by") == "Graydon Hoare"
        assert ess.RemoteSidebarManager(client).sidebar("zzz qqq nothing") is None
        img = ess.RemoteEntityImageStore(client).get("rust.webp")
        assert img == b"\x52\x49\x46\x46fakewebp"
        assert ess.RemoteEntityImageStore(client).get("missing.webp") is None
    finally:
        cluster.shutdown()
        seed.shutdown()
        server.stop()


def test_ampc_roles_gossip_deployment(tmp_path):
    """The full ampc process deployment over gossip: one dht shard + two
    harmonic workers + a coordinator that discovers both and matches the
    single-process HyperBall result (reference ampc coordinator/worker/dht
    roles, main.rs + entrypoint/ampc/)."""
    from stract_tpu.entrypoint import ampc as ep
    from stract_tpu.webgraph import WebgraphBuilder, Edge
    from stract_tpu.webgraph.centrality import harmonic_centrality

    b = WebgraphBuilder()
    for f, t in [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "a"), ("b", "d")]:
        b.insert(Edge(f, t))
    graph = b.build(str(tmp_path / "g"))

    seed = Cluster.join(Service("admin"), interval=0.1, failure_timeout=5.0)
    seeds = [seed.gossip_addr]
    dht_srv, dht_cluster, _ = ep.run_dht(gossip_seeds=seeds)
    w1, c1 = ep.run_harmonic_worker(str(tmp_path / "g"), 0, 2, gossip_seeds=seeds)
    w2, c2 = ep.run_harmonic_worker(str(tmp_path / "g"), 1, 2, gossip_seeds=seeds)
    try:
        cent = ep.run_harmonic_coordinator(
            str(tmp_path / "g"), str(tmp_path / "cent"), 2,
            gossip_seeds=seeds, wait_s=20.0)
        single = harmonic_centrality(graph, precision=6)
        for name in single:
            assert abs(cent[name] - single[name]) < 1e-4, name
        assert os.path.isdir(str(tmp_path / "cent"))
    finally:
        for c in (dht_cluster, c1, c2):
            c.shutdown()
        seed.shutdown()
        for s in (dht_srv, w1, w2):
            s.stop()


def test_ampc_shortest_path_roles(tmp_path):
    from stract_tpu.entrypoint import ampc as ep
    from stract_tpu.webgraph import WebgraphBuilder, Edge

    b = WebgraphBuilder()
    for f, t in [("a", "b"), ("b", "c"), ("c", "d")]:
        b.insert(Edge(f, t))
    b.build(str(tmp_path / "g"))

    seed = Cluster.join(Service("admin"), interval=0.1, failure_timeout=5.0)
    seeds = [seed.gossip_addr]
    dht_srv, dht_cluster, _ = ep.run_dht(gossip_seeds=seeds)
    w1, c1 = ep.run_shortest_path_worker(str(tmp_path / "g"), 0, 1, gossip_seeds=seeds)
    try:
        d = ep.run_shortest_path_coordinator(
            str(tmp_path / "g"), "a", str(tmp_path / "sp"), 1,
            gossip_seeds=seeds, wait_s=20.0)
        assert d["a"] == 0 and d["b"] == 1 and d["c"] == 2 and d["d"] == 3
    finally:
        dht_cluster.shutdown()
        c1.shutdown()
        seed.shutdown()
        dht_srv.stop()
        w1.stop()


def test_cli_indexer_entity_and_canonical(tmp_path, capsys):
    zim = _write_zim(tmp_path)
    cfg = _cfg(tmp_path, "ie.toml",
               f'zim_path = "{zim}"\noutput_path = "{tmp_path}/ei"\n')
    main(["indexer", "entity", cfg])
    assert "indexed 1 entities" in capsys.readouterr().out

    warc = str(tmp_path / "c.warc.gz")
    with WarcWriter.open(warc) as w:
        w.write_record("https://a.com/dup", '<html><head><title>A</title>'
                       '<link rel="canonical" href="https://a.com/"></head>'
                       '<body>content</body></html>')
    cfg = _cfg(tmp_path, "ic.toml",
               f'warc_paths = ["{warc}"]\noutput_path = "{tmp_path}/canon"\n')
    main(["indexer", "canonical", cfg])
    assert "canonical index" in capsys.readouterr().out

    from stract_tpu.canon_index import CanonicalIndex

    ci = CanonicalIndex(str(tmp_path / "canon"))
    assert ci.canonical_of("https://a.com/dup") == "https://a.com/"


def test_cli_site_stats_and_nearest_seed(tmp_path, capsys):
    from conftest import make_doc
    from stract_tpu.index import InvertedIndex
    from stract_tpu.kv import Db
    from stract_tpu.webgraph import WebgraphBuilder, Edge

    idx = InvertedIndex(str(tmp_path / "index"))
    idx.insert(make_doc("https://a.com/1", "alpha page", "alpha body text"))
    idx.insert(make_doc("https://a.com/2", "alpha two", "more alpha text"))
    idx.insert(make_doc("https://b.com/1", "beta page", "beta body text"))
    idx.commit()

    cfg = _cfg(tmp_path, "ss.toml",
               f'index_path = "{tmp_path}/index"\noutput_path = "{tmp_path}/stats"\n')
    main(["site-stats", cfg])
    assert "site stats" in capsys.readouterr().out
    db = Db.open(str(tmp_path / "stats"))
    assert db.get(b"a.com")["pages"] == 2
    assert db.get(b"b.com")["pages"] == 1

    # nearest-seed: page b.com/1 has no original centrality but a backlink
    # from a.com/1 which does → inherits discounted value
    b = WebgraphBuilder()
    b.insert(Edge("https://a.com/1", "https://b.com/1"))
    b.build(str(tmp_path / "pg"))
    orig = Db.open(str(tmp_path / "orig"))
    orig.insert(b"https://a.com/1", {"centrality": 0.8, "rank": 0})
    orig.commit()
    cfg = _cfg(tmp_path, "ns.toml",
               f'webgraph_path = "{tmp_path}/pg"\n'
               f'original_centrality_path = "{tmp_path}/orig"\n'
               f'output_path = "{tmp_path}/ns_out"\ndiscount_factor = 0.5\n')
    main(["centrality", "harmonic-nearest-seed", cfg])
    assert "centrality for" in capsys.readouterr().out
    out = Db.open(str(tmp_path / "ns_out"))
    assert out.get(b"https://a.com/1")["centrality"] == pytest.approx(0.8)
    assert out.get(b"https://b.com/1")["centrality"] == pytest.approx(0.4)
