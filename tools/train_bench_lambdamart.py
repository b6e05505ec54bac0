#!/usr/bin/env python
"""Train LambdaMART at bench scale (VERDICT round-4 item 6): the reference's
recall stage runs LambdaMART whenever a model is configured
(/root/reference/crates/core/src/ranking/pipeline/stages/recall.rs:304); the
headline bench tag must therefore carry a trained forest, not just dual+cross.

Protocol (the reference ltr/ recipe at bench scale): run training queries
through the REAL serving path with ranking signals enabled, join each returned
result with a ranker-independent graded judgment, and fit the gradient-boosted
forest on (signal vector, gain) pairs (ranking/models/lambdamart.py train —
the reference trains lambdarank in LightGBM offline, ltr/lambdamart.py).

Judgments are by corpus construction (the bench corpus is synthetic, there are
no click logs): for a 2-term AND query, grade 3 = both terms in the title,
grade 2 = one term in the title, grade 1 = terms only in the body — the same
term-containment grading the 2.4k-doc judged eval uses (tools/eval_pipeline.py
make_judged_queries), evaluated on each query's OWN returned docs.

Collection runs dual-encoder recall but NO cross encoder and NO forest: the
forest's serving-time inputs are the recall-stage signal matrices (slop +
embedding sims filled, cross columns still zero) — collecting through a
cross-enabled pipeline would train splits on columns that are always zero at
the point the forest actually runs.

Writes BENCH_CACHE/lambdamart-<docs>.json (the file bench.py _load_pipeline
serves) and prints one JSON summary line with held-out rank correlation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np


def grade(query: str, title: str) -> float:
    terms = query.split()
    hits = sum(1 for t in terms if t in title.split())
    if hits >= len(terms):
        return 3.0
    if hits >= 1:
        return 2.0
    return 1.0  # AND semantics: returned docs contain every term somewhere


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--queries", type=int, default=96)
    ap.add_argument("--heldout", type=int, default=24)
    ap.add_argument("--per-query", type=int, default=50)
    ap.add_argument("--trees", type=int, default=40)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--seed", type=int, default=4242)  # bench serves 3/7, eval_10m 11
    args = ap.parse_args()

    os.environ.setdefault("BENCH_DOCS", str(args.docs))
    os.environ.setdefault("BENCH_BUDGET_S", "86400")
    os.environ.setdefault("BENCH_PIPELINE", "auto")

    import bench  # noqa: E402  (repo-root: stack builder + cache paths)
    from stract_tpu.bench_corpus import sample_queries
    from stract_tpu.ranking.models.lambdamart import LambdaMART
    from stract_tpu.searcher.query import SearchQuery

    log = lambda m: print(m, file=sys.stderr, flush=True)
    t0 = time.time()
    index, local, api, _app = bench.build_stack(args.docs)
    # collection pipeline: recall scorers only (see module docstring)
    api.pipeline.precision.cross_encoder = None
    api.pipeline.recall.lambdamart = None
    log(f"[lm] stack up ({time.time()-t0:.0f}s), recall scorers="
        f"{'dual' if api.pipeline.recall.dual_encoder else 'none'}")

    rng = np.random.default_rng(args.seed)
    queries = sample_queries(rng, args.queries + args.heldout)
    X, y, qid = [], [], []
    for i, q in enumerate(queries):
        res = api.search_websites(SearchQuery(
            query=q, num_results=args.per_query, return_ranking_signals=True))
        for w in res.webpages:
            sig = w.get("rankingSignals") or {}
            from stract_tpu.ranking import signals as S

            feats = np.zeros(S.NUM_SIGNALS, dtype=np.float32)
            for name, v in sig.items():
                feats[S.signal(name).id] = v
            X.append(feats)
            g = grade(q, w.get("title", ""))
            y.append(2.0 ** g - 1.0)  # exponential gains, lambdarank convention
            qid.append(i)
        if i % 20 == 0:
            log(f"[lm] {i}/{len(queries)} queries collected ({len(X)} examples)")
    X = np.stack(X)
    y = np.asarray(y)
    qid = np.asarray(qid)
    train = qid < args.queries
    log(f"[lm] {train.sum()} train / {(~train).sum()} held-out examples")

    lm = LambdaMART.train(X[train], y[train], num_trees=args.trees,
                          max_depth=args.depth)
    cache = bench.CACHE
    out_path = os.path.join(cache, f"lambdamart-{args.docs}.json")
    with open(out_path, "w") as fh:
        fh.write(lm.to_json())

    # held-out sanity: forest predictions must rank higher-graded docs first
    from scipy.stats import spearmanr  # in the baked image via scipy

    preds = np.asarray(lm.predict(X[~train]))
    rho = float(spearmanr(preds, y[~train]).statistic) if (~train).sum() > 2 else float("nan")
    out = {
        "examples": int(train.sum()), "heldout": int((~train).sum()),
        "trees": args.trees, "depth": args.depth,
        "heldout_spearman_pred_vs_gain": round(rho, 4),
        "path": out_path, "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    if not np.isfinite(rho) or rho < 0.1:
        log("[lm] WARNING: held-out correlation weak — inspect before serving")
        sys.exit(2)


if __name__ == "__main__":
    main()
