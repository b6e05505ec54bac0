"""LTR training data assembly (role of reference ltr/ SQLite pipelines +
tools/annotate-results: (query, url, relevance) judgments joined with the
engine's signal vectors → feature matrices for LambdaMART / linear training)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ranking import signals as S
from ..searcher.query import SearchQuery


@dataclass
class TrainingExample:
    query: str
    url: str
    relevance: float
    features: np.ndarray  # [NUM_SIGNALS]


def collect_examples(api_searcher, judgments: dict) -> list[TrainingExample]:
    """judgments: query → {url: relevance}. Runs each query with ranking
    signals enabled and joins returned signal vectors with judgments."""
    out = []
    for query, judged in judgments.items():
        res = api_searcher.search_websites(
            SearchQuery(query=query, num_results=50, return_ranking_signals=True)
        )
        for w in res.webpages:
            rel = judged.get(w.get("url", ""), None)
            if rel is None:
                continue
            feats = np.zeros(S.NUM_SIGNALS, dtype=np.float32)
            for name, v in (w.get("rankingSignals") or {}).items():
                feats[S.signal(name).id] = v
            out.append(TrainingExample(query, w["url"], float(rel), feats))
    return out


def build_training_matrix(examples: list[TrainingExample]):
    """→ (X [n, NUM_SIGNALS], y [n], query_groups list[int]) for lambdarank-style
    training (group sizes per query, reference lightgbm lambdarank setup)."""
    X = np.stack([e.features for e in examples]) if examples else np.zeros((0, S.NUM_SIGNALS))
    y = np.array([e.relevance for e in examples], dtype=np.float64)
    groups = []
    prev_q, count = None, 0
    for e in examples:
        if e.query != prev_q:
            if count:
                groups.append(count)
            prev_q, count = e.query, 0
        count += 1
    if count:
        groups.append(count)
    return X, y, groups
