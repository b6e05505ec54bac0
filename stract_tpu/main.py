"""CLI — one binary, many roles (role of reference main.rs:41-123 clap
subcommands). `python -m stract_tpu.main <role> [args]`."""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(prog="stract_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("api", help="search coordinator + HTTP API")
    s.add_argument("config")

    s = sub.add_parser("search-server", help="one index shard server")
    s.add_argument("config")

    s = sub.add_parser("webgraph-server", help="one webgraph shard server")
    s.add_argument("config")

    s = sub.add_parser("entity-search-server", help="entity sidebar shard server")
    s.add_argument("config")

    s = sub.add_parser("live-index", help="freshness tier")
    s.add_argument("action", choices=["serve", "crawler"])
    s.add_argument("config")

    s = sub.add_parser("indexer", help="build search/entity/canonical indexes")
    s.add_argument("action", choices=["search", "merge", "entity", "canonical"])
    s.add_argument("config")

    s = sub.add_parser("webgraph", help="build webgraph from WARCs")
    s.add_argument("action", choices=["create", "merge"])
    s.add_argument("config")

    s = sub.add_parser("centrality", help="harmonic centrality jobs")
    s.add_argument("mode", choices=["harmonic", "approx-harmonic", "harmonic-nearest-seed"])
    s.add_argument("config")

    s = sub.add_parser("site-stats", help="aggregate per-site statistics")
    s.add_argument("config")

    s = sub.add_parser("ampc", help="distributed graph-compute roles")
    s.add_argument("role", choices=[
        "dht", "harmonic-worker", "harmonic-coordinator",
        "approx-harmonic-coordinator", "shortest-path-worker",
        "shortest-path-coordinator"])
    s.add_argument("config")

    s = sub.add_parser("crawler", help="distributed crawler roles")
    s.add_argument("role", choices=["worker", "coordinator", "router", "plan"])
    s.add_argument("config")

    s = sub.add_parser("web-spell", help="train spell-correction models")
    s.add_argument("config")

    s = sub.add_parser("safety-classifier")
    s.add_argument("action", choices=["train", "predict"])
    s.add_argument("args", nargs="*")

    s = sub.add_parser("admin")
    s.add_argument("action", choices=["status", "index-stats", "top-keyphrases"])
    s.add_argument("path", nargs="?", help="index path, or gossip seed host:port for status")

    s = sub.add_parser("ltr", help="learning-to-rank training/eval")
    s.add_argument("action", choices=["train-lambdamart", "train-linear", "eval"])
    s.add_argument("judgments")
    s.add_argument("index_path")
    s.add_argument("model_path")

    s = sub.add_parser("train-encoders", help="fine-tune dual/cross encoders from an index")
    s.add_argument("kind", choices=["dual", "cross", "both"])
    s.add_argument("index_path")
    s.add_argument("out_dir")
    s.add_argument("--steps", type=int, default=120)
    s.add_argument("--batch", type=int, default=16)
    s.add_argument("--triples", type=int, default=512)

    s = sub.add_parser("configure", help="build a tiny dev deployment in data/")
    s.add_argument("--data-dir", default="data")

    args = p.parse_args(argv)
    from .config import load_config

    if args.cmd == "api":
        from .entrypoint.api import run

        run(load_config("api", args.config))

    elif args.cmd == "search-server":
        from .entrypoint.search_server import run
        from .config import GossipConfig, _from_dict

        cfg = load_config("search-server", args.config)
        g = _from_dict(GossipConfig, cfg.gossip or {})
        server, cluster = run(cfg.index_path, cfg.shard, cfg.host, cfg.port,
                              g.addr_tuple(), g.seed_tuples(),
                              linear_model_path=cfg.linear_model_path,
                              mesh=cfg.mesh_search)
        print(f"search-server shard={cfg.shard} rpc={server.addr} gossip={cluster.gossip_addr}")
        _wait_forever()

    elif args.cmd == "webgraph-server":
        from .entrypoint.webgraph_server import run
        from .config import GossipConfig, _from_dict

        cfg = load_config("webgraph-server", args.config)
        g = _from_dict(GossipConfig, cfg.gossip or {})
        server, cluster = run(cfg.graph_path, cfg.shard, cfg.host, cfg.port,
                              g.addr_tuple(), g.seed_tuples())
        print(f"webgraph-server shard={cfg.shard} rpc={server.addr}")
        _wait_forever()

    elif args.cmd == "entity-search-server":
        from .entrypoint.entity_search_server import run
        from .config import GossipConfig, _from_dict

        cfg = load_config("entity-search-server", args.config)
        g = _from_dict(GossipConfig, cfg.gossip or {})
        server, cluster = run(cfg.index_path, cfg.image_store_path, cfg.host,
                              cfg.port, g.addr_tuple(), g.seed_tuples())
        print(f"entity-search-server rpc={server.addr}")
        _wait_forever()

    elif args.cmd == "live-index":
        cfg = load_config("live-index", args.config)
        if args.action == "serve":
            from .entrypoint.live_index import run
            from .config import GossipConfig, _from_dict

            g = _from_dict(GossipConfig, cfg.gossip or {})
            server, cluster = run(cfg.path, cfg.shard, cfg.host, cfg.port,
                                  g.addr_tuple(), g.seed_tuples())
            print(f"live-index shard={cfg.shard} rpc={server.addr}")
            _wait_forever()
        else:
            print("live crawler requires a site list; see stract_tpu/live_index/crawler.py")

    elif args.cmd == "indexer" and args.action == "entity":
        from .entrypoint.entity import build_entity_index

        cfg = load_config("indexer", args.config)
        idx = build_entity_index(cfg.zim_path, cfg.output_path,
                                 limit=cfg.entity_limit or None)
        print(f"indexed {len(idx)} entities → {cfg.output_path}")

    elif args.cmd == "indexer" and args.action == "canonical":
        from .canon_index import build_from_warcs as build_canonical

        cfg = load_config("indexer", args.config)
        build_canonical(cfg.warc_paths, cfg.output_path)
        print(f"canonical index → {cfg.output_path}")

    elif args.cmd == "indexer":
        from .entrypoint.indexer import run, IndexingWorker
        from .kv import Db

        cfg = load_config("indexer", args.config)
        worker = IndexingWorker(
            host_centrality=Db.open(cfg.host_centrality_path) if cfg.host_centrality_path else None,
            page_centrality=Db.open(cfg.page_centrality_path) if cfg.page_centrality_path else None,
        )
        idx = run(cfg.warc_paths, cfg.output_path, worker,
                  embedding_dim=cfg.embedding_dim, merge=(args.action == "merge" or cfg.merge))
        print(f"indexed {idx.num_docs} docs → {cfg.output_path}")

    elif args.cmd == "webgraph":
        cfg = load_config("webgraph", args.config)
        if args.action == "merge":
            from .webgraph.store import merge_graphs

            g = merge_graphs(cfg.warc_paths, cfg.output_path)  # paths = source graphs
        else:
            from .entrypoint.webgraph_build import build_from_warcs

            g = build_from_warcs(cfg.warc_paths, cfg.output_path, cfg.level)
        print(f"webgraph: {g.num_nodes} nodes, {g.num_edges} edges → {cfg.output_path}")

    elif args.cmd == "centrality":
        from .entrypoint.centrality import (
            run_harmonic, run_approx_harmonic, run_harmonic_nearest_seed)

        cfg = load_config("centrality", args.config)
        if args.mode == "harmonic":
            c = run_harmonic(cfg.webgraph_path, cfg.output_path, cfg.precision)
        elif args.mode == "harmonic-nearest-seed":
            c = run_harmonic_nearest_seed(cfg.webgraph_path,
                                          cfg.original_centrality_path,
                                          cfg.output_path, cfg.discount_factor)
        else:
            c = run_approx_harmonic(cfg.webgraph_path, cfg.output_path, cfg.num_samples)
        print(f"centrality for {len(c)} nodes → {cfg.output_path}")

    elif args.cmd == "site-stats":
        from .index import InvertedIndex
        from .kv import Db
        from . import site_stats

        cfg = load_config("site-stats", args.config)
        hc = Db.open(cfg.host_centrality_path) if cfg.host_centrality_path else None
        site_stats.run(InvertedIndex(cfg.index_path), cfg.output_path, hc)
        print(f"site stats → {cfg.output_path}")

    elif args.cmd == "ampc":
        _run_ampc_role(args.role, load_config("ampc", args.config))

    elif args.cmd == "crawler":
        cfg = load_config("crawler", args.config)
        _run_crawler_role(args.role, cfg)

    elif args.cmd == "web-spell":
        from .index import InvertedIndex
        from .spell.trainer import train_from_index

        cfg = load_config("web-spell", args.config)
        train_from_index(InvertedIndex(cfg.index_path), cfg.output_path)
        print(f"spell models → {cfg.output_path}")

    elif args.cmd == "safety-classifier":
        _safety(args.action, args.args)

    elif args.cmd == "admin":
        _admin(args.action, args.path)

    elif args.cmd == "ltr":
        from .entrypoint import ltr as ltr_ep

        if args.action == "train-lambdamart":
            ltr_ep.train_lambdamart(args.judgments, args.index_path, args.model_path)
            print(f"lambdamart model → {args.model_path}")
        elif args.action == "train-linear":
            ltr_ep.train_linear(args.judgments, args.index_path, args.model_path)
            print(f"linear model → {args.model_path}")
        else:
            print(json.dumps(ltr_ep.evaluate(args.judgments, args.index_path, args.model_path)))

    elif args.cmd == "train-encoders":
        import os

        from .entrypoint import train_encoders as te

        if args.kind in ("dual", "both"):
            te.train_dual_encoder(args.index_path, os.path.join(args.out_dir, "dual_encoder"),
                                  steps=args.steps, batch=args.batch, n_triples=args.triples)
        if args.kind in ("cross", "both"):
            te.train_cross_encoder(args.index_path, os.path.join(args.out_dir, "cross_encoder"),
                                   steps=args.steps, batch=args.batch, n_triples=args.triples)

    elif args.cmd == "configure":
        from .entrypoint.configure import run as configure_run

        configure_run(args.data_dir)


def _run_ampc_role(role: str, cfg):
    """(role of reference main.rs ampc subcommands — each process role wraps
    the corresponding entrypoint/ampc function)"""
    from .config import GossipConfig, _from_dict
    from .entrypoint import ampc as ep

    g = _from_dict(GossipConfig, cfg.gossip or {})
    ga, gs = g.addr_tuple(), g.seed_tuples()
    if role == "dht":
        peers = []
        for a in cfg.peers:
            if isinstance(a, str):
                h, p = a.rsplit(":", 1)
                peers.append((h, int(p)))
            else:
                peers.append(tuple(a))
        server, _cluster, _obj = ep.run_dht(
            cfg.host, cfg.port, cfg.node_id, peers or None, ga, gs)
        print(f"ampc dht shard={cfg.node_id} rpc={server.addr}")
        _wait_forever()
    elif role == "harmonic-worker":
        server, _cluster = ep.run_harmonic_worker(
            cfg.webgraph_path, cfg.shard, cfg.num_shards, cfg.precision,
            cfg.host, cfg.port, ga, gs)
        print(f"ampc harmonic-worker shard={cfg.shard} rpc={server.addr}")
        _wait_forever()
    elif role == "shortest-path-worker":
        server, _cluster = ep.run_shortest_path_worker(
            cfg.webgraph_path, cfg.shard, cfg.num_shards, cfg.host, cfg.port, ga, gs)
        print(f"ampc shortest-path-worker shard={cfg.shard} rpc={server.addr}")
        _wait_forever()
    elif role == "harmonic-coordinator":
        c = ep.run_harmonic_coordinator(
            cfg.webgraph_path, cfg.output_path, cfg.num_shards, cfg.precision,
            ga, gs, cfg.wait_s)
        print(f"harmonic centrality for {len(c)} nodes → {cfg.output_path}")
    elif role == "approx-harmonic-coordinator":
        c = ep.run_approx_harmonic_coordinator(
            cfg.webgraph_path, cfg.output_path, cfg.num_shards,
            cfg.num_samples, cfg.seed, ga, gs, cfg.wait_s)
        print(f"approx harmonic centrality for {len(c)} nodes → {cfg.output_path}")
    elif role == "shortest-path-coordinator":
        d = ep.run_shortest_path_coordinator(
            cfg.webgraph_path, cfg.source, cfg.output_path, cfg.num_shards,
            ga, gs, cfg.wait_s)
        print(f"shortest paths from {cfg.source}: {len(d)} reachable → {cfg.output_path}")


def _run_crawler_role(role: str, cfg):
    from .distributed.sonic import serve_in_thread, RemoteClient

    if role == "coordinator":
        from .crawler import CrawlCoordinator

        coord = CrawlCoordinator(cfg.queue_path, cfg.discovered_path)
        srv = serve_in_thread(coord, port=0)
        print(f"crawl coordinator rpc={srv.addr}")
        _wait_forever()
    elif role == "router":
        from .crawler import Router

        addrs = [(a.rsplit(":", 1)[0], int(a.rsplit(":", 1)[1])) for a in cfg.coordinator_addrs]
        srv = serve_in_thread(Router(addrs), port=0)
        print(f"crawl router rpc={srv.addr}")
        _wait_forever()
    elif role == "worker":
        import os
        from .crawler.worker import WorkerThread
        from .warc import WarcWriter

        h, p = cfg.router_addr.rsplit(":", 1)
        os.makedirs(cfg.warc_output_dir, exist_ok=True)

        def warc_factory(domain):
            return WarcWriter.open(f"{cfg.warc_output_dir}/{domain}-{int(time.time())}.warc.gz")

        n = WorkerThread(RemoteClient((h, int(p))), warc_factory=warc_factory).run()
        print(f"crawled {n} jobs")
    elif role == "plan":
        print("use stract_tpu.crawler.planner.make_crawl_plan with centrality + url stores")


def _safety(action: str, rest: list):
    from .webpage.safety import SafetyClassifier

    if action == "train":
        import json

        data_path, model_path = rest
        texts, labels = [], []
        with open(data_path) as fh:
            for line in fh:
                d = json.loads(line)
                texts.append(d["text"])
                labels.append(d["label"])
        SafetyClassifier.train(texts, labels).save(model_path)
        print(f"model → {model_path}")
    else:
        model_path, text = rest[0], " ".join(rest[1:])
        print(SafetyClassifier.load(model_path).classify(text))


def _admin(action: str, path):
    if action == "index-stats" and path:
        from .index import InvertedIndex

        idx = InvertedIndex(path)
        print(f"docs={idx.num_docs} segments={len(idx.segments)}")
        for s in idx.segments:
            print(f"  {s.path}: docs={s.num_docs} terms={s.meta['num_terms']} postings={s.meta['num_postings']}")
    elif action == "top-keyphrases" and path:
        # (role of reference admin top-keyphrases, entrypoint/admin/)
        from .index import InvertedIndex
        from .searcher.local import LocalSearcher
        from .generic_query import TopKeyPhrasesQuery, run_generic_query

        phrases = run_generic_query(
            TopKeyPhrasesQuery(50), [LocalSearcher(InvertedIndex(path), 0)]
        )
        for phrase, count in sorted(phrases.items(), key=lambda kv: -kv[1]):
            print(f"{count:6d}  {phrase}")
    elif action == "status" and path:
        # join gossip via the seed and list live members (role of
        # reference entrypoint/admin/mod.rs cluster status)
        from .distributed.cluster import Cluster, Service

        h, p = path.rsplit(":", 1)
        c = Cluster.join(Service("admin"), seeds=[(h, int(p))])
        time.sleep(3)
        for m in c.members():
            svc = m.service
            print(f"{m.id} kind={svc.kind} shard={svc.shard} host={svc.host} alive={m.is_alive()}")
        c.shutdown()
    else:
        print("usage: admin status <gossip-seed host:port> | admin index-stats <path>")


def _wait_forever():
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
