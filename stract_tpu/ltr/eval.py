"""Ranking-quality evaluation (role of reference ltr/eval/recall.py:17-33
golden-set recall and ltr/lambdamart.py NDCG@{1,2,3,5}).

The quality protocol of BASELINE.md: NDCG@k and recall@k over annotated
(query → [(url, relevance)]) golden sets."""

from __future__ import annotations

import math


def dcg_at_k(relevances: list[float], k: int) -> float:
    return sum(rel / math.log2(i + 2) for i, rel in enumerate(relevances[:k]))


def ndcg_at_k(ranked_relevances: list[float], k: int,
              all_relevances: list[float] | None = None) -> float:
    """ranked_relevances: relevance of each returned result in rank order.
    all_relevances: relevance of EVERY judged doc — the ideal-ranking pool
    (standard NDCG). Defaults to the returned list (self-normalized NDCG,
    which only measures ordering of what was retrieved)."""
    ideal = sorted(all_relevances if all_relevances is not None
                   else ranked_relevances, reverse=True)
    idcg = dcg_at_k(ideal, k)
    if idcg == 0:
        return 0.0
    return dcg_at_k(ranked_relevances, k) / idcg


def recall_at_k(returned_urls: list[str], relevant_urls: set[str], k: int) -> float:
    if not relevant_urls:
        return 0.0
    hits = sum(1 for u in returned_urls[:k] if u in relevant_urls)
    return hits / len(relevant_urls)


def evaluate_ranking(search_fn, golden: dict, ks=(1, 2, 3, 5, 10),
                     retrievable: dict | None = None) -> dict:
    """search_fn(query) → [urls in rank order]; golden: query → {url: relevance}.
    Returns mean NDCG@k (IDCG over ALL judged docs — standard) + recall@k over
    the golden set.

    retrievable (optional): query → set of urls the engine can retrieve at all
    (e.g. docs containing every required term — the reference ANDs all terms,
    plan/mod.rs reduce(and), so judged-relevant docs missing a term are
    unreachable by construction). When given, adds recall_retrievable@k with
    the denominator restricted to relevant ∩ retrievable — ranking quality
    separated from the boolean-match ceiling."""
    ndcgs = {k: [] for k in ks}
    recalls = {k: [] for k in ks}
    rrecalls = {k: [] for k in ks} if retrievable is not None else None
    for query, judgments in golden.items():
        urls = search_fn(query)
        rels = [judgments.get(u, 0.0) for u in urls]
        all_rels = list(judgments.values())
        relevant = {u for u, r in judgments.items() if r > 0}
        for k in ks:
            ndcgs[k].append(ndcg_at_k(rels, k, all_relevances=all_rels))
            recalls[k].append(recall_at_k(urls, relevant, k))
        if rrecalls is not None:
            reachable = relevant & retrievable.get(query, relevant)
            for k in ks:
                rrecalls[k].append(recall_at_k(urls, reachable, k) if reachable else 1.0)
    n = max(len(golden), 1)
    return {
        **{f"ndcg@{k}": sum(v) / n for k, v in ndcgs.items()},
        **{f"recall@{k}": sum(v) / n for k, v in recalls.items()},
        **({f"recall_retrievable@{k}": sum(v) / n for k, v in rrecalls.items()}
           if rrecalls is not None else {}),
    }
