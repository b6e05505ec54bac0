"""Ranking-quality evaluation (role of reference ltr/eval/recall.py:17-33
golden-set recall and ltr/lambdamart.py NDCG@{1,2,3,5}).

The quality protocol of BASELINE.md: NDCG@k and recall@k over annotated
(query → [(url, relevance)]) golden sets."""

from __future__ import annotations

import math


def dcg_at_k(relevances: list[float], k: int) -> float:
    return sum(rel / math.log2(i + 2) for i, rel in enumerate(relevances[:k]))


def ndcg_at_k(ranked_relevances: list[float], k: int) -> float:
    """ranked_relevances: relevance of each returned result in rank order."""
    ideal = sorted(ranked_relevances, reverse=True)
    idcg = dcg_at_k(ideal, k)
    if idcg == 0:
        return 0.0
    return dcg_at_k(ranked_relevances, k) / idcg


def recall_at_k(returned_urls: list[str], relevant_urls: set[str], k: int) -> float:
    if not relevant_urls:
        return 0.0
    hits = sum(1 for u in returned_urls[:k] if u in relevant_urls)
    return hits / len(relevant_urls)


def evaluate_ranking(search_fn, golden: dict, ks=(1, 2, 3, 5, 10)) -> dict:
    """search_fn(query) → [urls in rank order]; golden: query → {url: relevance}.
    Returns mean NDCG@k + recall@k over the golden set."""
    ndcgs = {k: [] for k in ks}
    recalls = {k: [] for k in ks}
    for query, judgments in golden.items():
        urls = search_fn(query)
        rels = [judgments.get(u, 0.0) for u in urls]
        relevant = {u for u, r in judgments.items() if r > 0}
        for k in ks:
            ndcgs[k].append(ndcg_at_k(rels, k))
            recalls[k].append(recall_at_k(urls, relevant, k))
    n = max(len(golden), 1)
    return {
        **{f"ndcg@{k}": sum(v) / n for k, v in ndcgs.items()},
        **{f"recall@{k}": sum(v) / n for k, v in recalls.items()},
    }
