#!/usr/bin/env python
"""Dev orchestration (role of reference scripts/run_dev.py: spawns
api + search-server + webgraph-server against the `configure` dev data).

Runs everything in ONE process (in-process servers over localhost RPC) —
`python scripts/run_dev.py [--data-dir data] [--port 3000]`."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# honor JAX_PLATFORMS even when a sitecustomize force-set the platform list
# before this script ran (the dev loop is usually CPU: compile locally, no
# tunnel round trips)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# persistent XLA compile cache: without it EVERY dev-server process recompiles
# its program shapes — through the TPU tunnel that is minutes of dead time
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("STRACT_TPU_XLA_CACHE", os.path.expanduser("~/.cache/stract_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # noqa: BLE001 — older jax
    pass


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="data")
    p.add_argument("--port", type=int, default=3000)
    args = p.parse_args()

    if not os.path.exists(os.path.join(args.data_dir, "index")):
        print("no dev data — running configure first")
        from stract_tpu.entrypoint.configure import run as configure

        configure(args.data_dir)

    from stract_tpu.api.server import build_app, run_api
    from stract_tpu.autosuggest import Autosuggest
    from stract_tpu.entity_index import EntityIndex
    from stract_tpu.entity_index.index import SidebarManager
    from stract_tpu.index import InvertedIndex
    from stract_tpu.ranking.inbound_similarity import InboundSimilarity
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.spell.trainer import load_checker
    from stract_tpu.webgraph import Webgraph
    from stract_tpu.widgets import WidgetManager

    index = InvertedIndex(os.path.join(args.data_dir, "index"))
    searcher = LocalShardedSearcher([LocalSearcher(index, shard_id=0)])
    graph = Webgraph(os.path.join(args.data_dir, "webgraph_host"))
    similar = InboundSimilarity(graph)
    api = ApiSearcher(
        searcher,
        spell_checker=load_checker(os.path.join(args.data_dir, "web_spell")),
        widget_manager=WidgetManager(),
        sidebar_manager=SidebarManager(EntityIndex(os.path.join(args.data_dir, "entity_index"))),
    )
    api.pipeline.recall.inbound = similar
    suggest = Autosuggest.load(os.path.join(args.data_dir, "autosuggest.bin"))
    page_graph_path = os.path.join(args.data_dir, "webgraph_page")
    page_graph = Webgraph(page_graph_path) if os.path.exists(page_graph_path) else None
    image_path = os.path.join(args.data_dir, "entity_images")
    image_store = None
    if os.path.exists(image_path):
        from stract_tpu.image_store import ImageStore

        image_store = ImageStore(image_path)
    app = build_app(api, autosuggest=suggest, similar_hosts=similar,
                    page_graph=page_graph, image_store=image_store)
    print(f"dev server on http://localhost:{args.port} (UI at /)")
    run_api(app, "127.0.0.1", args.port)


if __name__ == "__main__":
    main()
