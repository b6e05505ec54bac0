#!/usr/bin/env python
"""Full-pipeline ranking eval on a topical synthetic corpus with judgments
independent of the ranking function (role of reference ltr/eval/recall.py's
golden-set protocol, scaled past hand annotation).

Protocol:
  - corpus: N docs over T topic vocabularies + zipf static scores, indexed
    WITH dual-encoder embeddings (doc-side vectors for the recall stage);
  - queries: >= 50 two-term topic queries;
  - judgments (by construction, not by any ranker): docs containing all query
    terms graded 3 (in title) / 2 (in body); same-topic docs with one term
    graded 1;
  - measured twice through the REAL ApiSearcher: pipeline OFF (shard scores
    only) and pipeline ON (trained dual encoder in recall + trained cross
    encoder in precision — entrypoint/train_encoders.py weak supervision),
    reporting NDCG/recall for both and the delta.

    python tools/eval_pipeline.py [--work-dir /tmp/eval_pipeline] [--docs 2400]
        [--queries 60] [--out EVAL_PIPELINE.json]

The artifact feeds EVAL.json's `pipeline` section (tools/eval_golden.py
--with-pipeline runs this inline).
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

import numpy as np


def build_topical_corpus(path: str, docs: int, topics: int, dual_encoder=None, seed: int = 0):
    """Index `docs` synthetic pages over `topics` topic vocabularies. Each doc
    draws most tokens from its topic + a few shared fillers, PLUS a few noise
    tokens from a "confuser" topic ((t+1) % topics) — so a query for topic t's
    terms also matches off-topic docs lexically (term collisions, the realistic
    failure mode a semantic reranker exists to fix). Titles are own-topic only
    (doc-side embeddings stay on-topic). Centralities are pareto so static
    score varies. → (index, doc_meta list)."""
    from stract_tpu.index import InvertedIndex

    rng = np.random.default_rng(seed)
    vocabs = [[f"t{t}w{i}" for i in range(10)] for t in range(topics)]
    shared = ["shared0", "shared1", "shared2"]
    dim = dual_encoder.embedding_dim if dual_encoder is not None else 0
    index = InvertedIndex(path, embedding_dim=dim)
    meta = []
    if index.num_docs >= docs:  # cached from an earlier run
        with open(os.path.join(path, "doc_meta.json")) as fh:
            return index, json.load(fh)
    batch = []

    def flush():
        if not batch:
            return
        if dual_encoder is not None:
            t_emb = dual_encoder.embed([d["title"] for d in batch])
            for d, e in zip(batch, t_emb):
                d["title_embedding"] = e
                d["keyword_embedding"] = e
        for d in batch:
            index.insert(d)
        batch.clear()

    for i in range(docs):
        t = int(rng.integers(0, topics))
        own = list(rng.choice(vocabs[t], size=11))
        noise = list(rng.choice(vocabs[(t + 1) % topics], size=4, replace=False))
        title = " ".join(own[:3])
        toks = own[3:] + noise + list(rng.choice(shared, size=2))
        rng.shuffle(toks)
        body = title + " " + " ".join(toks)
        doc = {
            "url": f"https://site{i % 97}.com/d{i}",
            "site": f"site{i % 97}.com",
            "domain": f"site{i % 97}.com",
            "domain_name": f"site{i % 97}",
            "title": title,
            "clean_text": body,
            "all_text": body,
            "host_centrality": float(min(rng.pareto(2.0) / 8.0, 1.0)),
            "page_centrality": 0.0,
            "host_centrality_rank": 1,
            "page_centrality_rank": 1,
            "fetch_time_ms": 30,
            "is_homepage": False,
        }
        meta.append({"url": doc["url"], "topic": t, "title": title, "body": body})
        batch.append(doc)
        if len(batch) >= 64:
            flush()
    flush()
    index.commit()
    with open(os.path.join(path, "doc_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return index, meta


def make_judged_queries(meta: list, n_queries: int, topics: int, seed: int = 0):
    """→ ({query: {url: grade}}, {query: retrievable url set}). Grades come
    from corpus construction: same-topic docs graded by term depth; OFF-topic
    docs that contain both terms (confuser noise) are judged 0 — they are the
    lexical decoys a semantic stage should demote. Retrievable = contains both
    terms (AND semantics — grade-1 docs are unreachable by construction)."""
    rng = np.random.default_rng(seed + 1)
    golden, retrievable = {}, {}
    while len(golden) < n_queries:
        t = int(rng.integers(0, topics))
        vocab = [f"t{t}w{i}" for i in range(10)]
        a, b = rng.choice(vocab, size=2, replace=False)
        q = f"{a} {b}"
        if q in golden:
            continue
        judged, reach, decoys = {}, set(), 0
        for d in meta:
            words_b = set(d["body"].split())
            has_both = a in words_b and b in words_b
            if has_both:
                reach.add(d["url"])
            if d["topic"] != t:
                if has_both:
                    judged[d["url"]] = 0.0
                    decoys += 1
                continue
            words_t = set(d["title"].split())
            if a in words_t and b in words_t:
                judged[d["url"]] = 3.0
            elif has_both:
                judged[d["url"]] = 2.0
            elif a in words_b or b in words_b:
                judged[d["url"]] = 1.0
        if sum(1 for g in judged.values() if g >= 2) >= 2 and decoys >= 1:
            golden[q] = judged
            retrievable[q] = reach
    return golden, retrievable


def run_eval(work_dir: str, docs: int = 2400, topics: int = 40, n_queries: int = 60,
             train_steps: int = 150, seed: int = 0, log=print) -> dict:
    from stract_tpu.entrypoint.train_encoders import train_cross_encoder, train_dual_encoder
    from stract_tpu.ltr.eval import evaluate_ranking
    from stract_tpu.models.dual_encoder import DualEncoder
    from stract_tpu.ranking.models.cross_encoder import CrossEncoderModel
    from stract_tpu.ranking.pipeline import PrecisionStage, RankingPipeline, RecallStage
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.searcher.query import SearchQuery

    os.makedirs(work_dir, exist_ok=True)
    boot_path = os.path.join(work_dir, "boot_index")
    idx_path = os.path.join(work_dir, "index")
    dual_path = os.path.join(work_dir, "dual_encoder")
    cross_path = os.path.join(work_dir, "cross_encoder")

    # 1. bootstrap index (no embeddings) to synthesize training triples from
    if not os.path.exists(os.path.join(dual_path, "config.json")):
        log(f"[eval] building bootstrap corpus ({docs} docs)")
        build_topical_corpus(boot_path, docs, topics, dual_encoder=None, seed=seed)
        log("[eval] training dual encoder")
        train_dual_encoder(boot_path, dual_path, steps=train_steps, batch=16,
                           max_len=32, n_triples=4 * train_steps, lr=1e-3, log=log)
        log("[eval] training cross encoder")
        train_cross_encoder(boot_path, cross_path, steps=train_steps, batch=16,
                            max_len=48, n_triples=4 * train_steps, lr=3e-3, log=log)
    dual = DualEncoder.load(dual_path)
    cross = CrossEncoderModel.load(cross_path)

    # 2. serving index WITH doc-side embeddings
    log("[eval] building serving corpus with embeddings")
    index, meta = build_topical_corpus(idx_path, docs, topics, dual_encoder=dual, seed=seed)
    golden, retrievable = make_judged_queries(meta, n_queries + n_queries // 2,
                                              topics, seed=seed)
    qlist = list(golden)
    train_qs = {q: golden[q] for q in qlist[n_queries:]}  # held-out LM training
    golden = {q: golden[q] for q in qlist[:n_queries]}
    log(f"[eval] {len(golden)} judged eval queries "
        f"({np.mean([len(v) for v in golden.values()]):.1f} judged docs/query, "
        f"{np.mean([sum(1 for g in v.values() if g == 0) for v in golden.values()]):.1f} "
        f"lexical decoys/query), {len(train_qs)} LM-training queries")

    def api_for(pipeline):
        return ApiSearcher(LocalShardedSearcher([LocalSearcher(index, 0)]),
                           pipeline=pipeline)

    def search_fn_for(pipeline, coefficients=None):
        api = api_for(pipeline)

        def fn(q):
            res = api.search_websites(SearchQuery(
                query=q, num_results=10,
                signal_coefficients=dict(coefficients or {})))
            return [w["url"] for w in res.webpages]

        return fn

    # 3. LambdaMART trained on the engine's own signal vectors for HELD-OUT
    #    queries (reference ltr/ protocol: judgments joined with signals)
    log("[eval] training LambdaMART on held-out queries")
    from stract_tpu.ltr.training_data import build_training_matrix, collect_examples
    from stract_tpu.ranking.models.lambdamart import LambdaMART

    X, y, _ = build_training_matrix(collect_examples(api_for(RankingPipeline()), train_qs))
    lm = LambdaMART.train(X, y, num_trees=40, max_depth=3)

    configs = {
        "off": (RankingPipeline(), None),
        # reference-default coefficients (embedding sims 0.01, cross 0.17 —
        # parity with reference non_core/text.rs): semantic nudges near-ties
        "on_default_coeffs": (RankingPipeline(
            RecallStage(dual_encoder=dual),
            PrecisionStage(cross_encoder=cross)), None),
        # tuned deployment: full 5-stage (dual recall + LambdaMART + cross
        # precision) with the semantic signals weighted to matter
        "on_tuned": (RankingPipeline(
            RecallStage(dual_encoder=dual, lambdamart=lm),
            PrecisionStage(cross_encoder=cross)),
            {"title_embedding_similarity": 2.0, "keyword_embedding_similarity": 1.0,
             "cross_encoder_snippet": 1.0, "cross_encoder_title": 1.0,
             "lambda_mart": 1.0}),
    }
    results = {}
    for name, (pipeline, coeffs) in configs.items():
        log(f"[eval] config {name}")
        results[name] = evaluate_ranking(search_fn_for(pipeline, coeffs), golden,
                                         retrievable=retrievable)
    return {
        "metric": "full_pipeline_ranking_quality",
        "corpus": f"topical synthetic ({docs} docs, {topics} topics, "
                  "confuser-topic noise → lexical decoys)",
        "queries": len(golden),
        "judgments": "corpus construction (term containment + topic), ranker-independent;"
                     " off-topic docs containing both terms judged 0",
        "recall_note": "recall@k includes grade-1 docs unreachable under AND semantics "
                       "(reference query/plan/mod.rs parity); recall_retrievable@k "
                       "restricts to docs containing every term",
        **{name: {k: round(v, 4) for k, v in r.items()} for name, r in results.items()},
        "ndcg10_delta_default": round(results["on_default_coeffs"]["ndcg@10"]
                                      - results["off"]["ndcg@10"], 4),
        "ndcg10_delta_tuned": round(results["on_tuned"]["ndcg@10"]
                                    - results["off"]["ndcg@10"], 4),
        "models": "dual+cross encoders trained via entrypoint/train_encoders.py weak "
                  "supervision; LambdaMART trained on held-out queries' signal vectors",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/eval_pipeline")
    ap.add_argument("--docs", type=int, default=2400)
    ap.add_argument("--topics", type=int, default=40)
    ap.add_argument("--queries", type=int, default=60)
    ap.add_argument("--train-steps", type=int, default=150)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EVAL_PIPELINE.json"))
    args = ap.parse_args()
    art = run_eval(args.work_dir, args.docs, args.topics, args.queries, args.train_steps)
    with open(args.out, "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps(art))


if __name__ == "__main__":
    main()
