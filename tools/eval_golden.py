#!/usr/bin/env python
"""Golden-set ranking-quality eval (role of reference ltr/eval/recall.py:17-33:
golden-set recall + NDCG over annotated queries, run offline — not CI).

Builds the `configure` dev deployment (if absent), serves it through the full
coordinator path (ApiSearcher incl. pipeline + retrieve), and scores the
rankings against a hand-annotated golden set over the dev corpus. Writes a
BENCH-style JSON artifact (EVAL.json at the repo root by default).

    python tools/eval_golden.py [--data-dir data] [--out EVAL.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# the axon sitecustomize force-selects the tunneled TPU at interpreter start;
# honor an explicit JAX_PLATFORMS (tests/tools run fine on CPU)
import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# query → {url: graded relevance}; annotated against entrypoint/configure._PAGES
GOLDEN = {
    "rust programming language": {
        "https://rust-lang.org/": 3.0,
        "https://crates.io/": 1.0,
        "https://docs.rs/": 1.0,
    },
    "rust package registry": {
        "https://crates.io/": 3.0,
        "https://rust-lang.org/": 1.0,
    },
    "crate documentation": {
        "https://docs.rs/": 3.0,
        "https://crates.io/": 1.0,
    },
    "python language": {
        "https://python.org/": 3.0,
        "https://docs.python.org/": 2.0,
    },
    "python documentation": {
        "https://docs.python.org/": 3.0,
        "https://python.org/": 1.0,
    },
    "systems programming": {
        "https://rust-lang.org/": 3.0,
    },
    "pasta carbonara": {
        "https://cooking.example.org/pasta": 3.0,
    },
    "artificial intelligence news": {
        "https://news.example.com/ai": 3.0,
    },
    # site: matches the domain incl. subdomains (reference UrlForSiteOperator)
    "site:python.org documentation": {
        "https://docs.python.org/": 3.0,
        "https://python.org/": 1.0,
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EVAL.json"))
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.data_dir, "index")):
        from stract_tpu.entrypoint.configure import run as configure

        configure(args.data_dir)

    from stract_tpu.entity_index import EntityIndex
    from stract_tpu.entity_index.index import SidebarManager
    from stract_tpu.index import InvertedIndex
    from stract_tpu.ltr.eval import evaluate_ranking
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.searcher.query import SearchQuery

    index = InvertedIndex(os.path.join(args.data_dir, "index"))
    api = ApiSearcher(
        LocalShardedSearcher([LocalSearcher(index, shard_id=0)]),
        sidebar_manager=SidebarManager(EntityIndex(os.path.join(args.data_dir, "entity_index"))),
    )

    def search_fn(query: str) -> list:
        res = api.search(SearchQuery(query=query, num_results=10))
        return [w["url"] for w in getattr(res, "webpages", [])]

    # retrievable sets: the engine (like the reference — query/plan/mod.rs ANDs
    # every term) can only return docs containing ALL query terms, so a judged-
    # relevant doc missing a term is unreachable by construction. This is the
    # explanation of the recall@10=0.70 reading on this corpus: e.g. crates.io
    # / docs.rs are judged relevant for "rust programming language" but don't
    # contain "language". recall_retrievable@k restricts the denominator to
    # relevant ∩ retrievable to measure ranking quality, not boolean-match
    # semantics.
    from stract_tpu.entrypoint.configure import _PAGES

    page_words = {url: set((title + " " + body).lower().replace(".", " ").split())
                  for url, title, body, _ in _PAGES}
    retrievable = {}
    for query in GOLDEN:
        terms = [t for t in query.lower().split() if ":" not in t]
        retrievable[query] = {u for u, ws in page_words.items()
                              if all(t in ws for t in terms)}

    metrics = evaluate_ranking(search_fn, GOLDEN, retrievable=retrievable)
    artifact = {
        "metric": "golden_set_ranking_quality",
        "queries": len(GOLDEN),
        "corpus": "configure dev corpus",
        "recall_note": "recall@k counts judged-relevant docs that lack a query "
                       "term and are thus unreachable under AND semantics "
                       "(parity with reference query/plan/mod.rs:298); "
                       "recall_retrievable@k restricts to reachable docs",
        **{k: round(v, 4) for k, v in metrics.items()},
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
