#!/usr/bin/env python
"""Quality evidence at bench scale (VERDICT round-3 item 6): NDCG@10 of the
served engine vs the exact f64 oracle at D=10M, pipeline ON and OFF, on
EVAL_QUERIES (default 200) queries, with bootstrap confidence intervals.

Reuses bench.py's oracle (full-corpus f64 BM25 + static + slop window +
pipeline-parity stages, bench.py _oracle_final_rank) so both arms share ONE
oracle score pass per query. Writes EVAL_10M.json at the repo root.

Env: BENCH_CACHE, EVAL_DOCS (default 10M), EVAL_QUERIES (default 200),
EVAL_BOOT (default 10000), BENCH_PIPELINE=auto|off (models must be cached
for the ON arm — tools/build_bench_embeddings.py + tools/bench_pipeline_on.py).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

os.environ.setdefault("BENCH_DOCS", os.environ.get("EVAL_DOCS", "10000000"))
os.environ.setdefault("BENCH_BUDGET_S", "86400")  # no watchdog races here

import bench  # noqa: E402  (repo-root bench.py — the oracle lives there)

N_QUERIES = int(os.environ.get("EVAL_QUERIES", 200))
N_BOOT = int(os.environ.get("EVAL_BOOT", 10_000))


def _ndcg(top100: np.ndarray, got: list, n_valid: int) -> float:
    rel = {int(d): 1.0 / np.log2(r + 2) for r, d in enumerate(top100)}
    dcg = sum(rel.get(d, 0.0) / np.log2(i + 2) for i, d in enumerate(got))
    ideal = sum(1.0 / np.log2(r + 2) / np.log2(r + 2)
                for r in range(min(10, n_valid)))
    return dcg / ideal


def _boot_ci(vals: np.ndarray, n_boot: int, rng) -> tuple:
    idx = rng.integers(0, len(vals), size=(n_boot, len(vals)))
    means = vals[idx].mean(axis=1)
    return float(np.percentile(means, 2.5)), float(np.percentile(means, 97.5))


def main():
    from stract_tpu.bench_corpus import sample_queries
    from stract_tpu.searcher.query import SearchQuery

    t0 = time.time()
    docs = int(os.environ["BENCH_DOCS"])
    index, local, api, _app = bench.build_stack(docs)
    pipeline = api.pipeline
    pipe_on = pipeline is not None and (
        pipeline.recall.has_scorers or pipeline.precision.cross_encoder is not None)
    print(f"[eval10m] stack up, pipeline={'on' if pipe_on else 'off'} "
          f"({time.time()-t0:.0f}s)", file=sys.stderr)

    queries = sample_queries(np.random.default_rng(11), N_QUERIES)
    vals_off, vals_on, rec100 = [], [], []
    for i, q in enumerate(queries):
        sq = SearchQuery(query=q)
        pq = local.parse_query(sq)
        ctx = pq.context()
        oracle = bench.oracle_scores(index, ctx)
        n_valid = int(np.isfinite(oracle).sum())
        if n_valid == 0:
            continue
        # OFF arm: base f64 ranking vs base engine blocks
        top100_off = bench._oracle_final_rank(index, ctx, oracle.copy(), None)
        got_off = bench._engine_top10(local, api.searcher, None, sq, ctx)
        vals_off.append(_ndcg(top100_off, got_off, n_valid))
        # engine recall of the oracle top-100 within its 300 candidates
        block, _ = local.search_blocks_many([sq], 300)[0]
        cand = set(int(d) for d in block.doc)
        o100 = set(int(d) for d in top100_off[: min(100, n_valid)])
        rec100.append(len(cand & o100) / max(len(o100), 1))
        if pipe_on:
            top100_on = bench._oracle_final_rank(index, ctx, oracle.copy(), pipeline)
            got_on = bench._engine_top10(local, api.searcher, pipeline, sq, ctx)
            vals_on.append(_ndcg(top100_on, got_on, n_valid))
        if (i + 1) % 20 == 0:
            print(f"[eval10m] {i+1}/{len(queries)} "
                  f"off={np.mean(vals_off):.4f}"
                  + (f" on={np.mean(vals_on):.4f}" if vals_on else ""),
                  file=sys.stderr)

    rng = np.random.default_rng(0)
    off = np.array(vals_off)
    out = {
        "docs": docs,
        "n_queries": len(off),
        "pipeline_models": bench._models_tag(docs) or "none",
        "ndcg10_off": {"mean": float(off.mean()),
                       "ci95": _boot_ci(off, N_BOOT, rng)},
        "recall_oracle100_at_300": float(np.mean(rec100)),
        "oracle": "exact f64 full-corpus BM25+static+slop-window "
                  "(bench.py oracle_scores), pipeline-parity stages on the ON arm",
        "wall_s": round(time.time() - t0, 1),
    }
    if vals_on:
        on = np.array(vals_on)
        out["ndcg10_on"] = {"mean": float(on.mean()),
                            "ci95": _boot_ci(on, N_BOOT, rng)}
    path = os.environ.get("EVAL_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "EVAL_10M.json")
    with open(os.path.abspath(path), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
