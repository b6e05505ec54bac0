"""LTR training entrypoints (role of reference ltr/lambdamart.py +
ltr/linear_model.py: train ranking models from judgments, export to the
engine's model format).

Judgments: jsonl lines {"query": q, "url": u, "relevance": 0-4} (the output of
tools/annotate_results.py or leechy auto-annotation)."""

from __future__ import annotations

import json

from ..index import InvertedIndex
from ..ltr.training_data import build_training_matrix, collect_examples
from ..ranking.models import LambdaMART, LinearRegression
from ..searcher.api import ApiSearcher
from ..searcher.distributed import LocalShardedSearcher
from ..searcher.local import LocalSearcher


def load_judgments(path: str) -> dict:
    out: dict = {}
    with open(path) as fh:
        for line in fh:
            d = json.loads(line)
            out.setdefault(d["query"], {})[d["url"]] = float(d["relevance"])
    return out


def train_lambdamart(judgments_path: str, index_path: str, model_out: str,
                     num_trees: int = 100, max_depth: int = 4,
                     min_samples: int = 2) -> LambdaMART:
    judgments = load_judgments(judgments_path)
    api = ApiSearcher(LocalShardedSearcher([LocalSearcher(InvertedIndex(index_path), 0)]))
    examples = collect_examples(api, judgments)
    if not examples:
        raise ValueError("no training examples matched the index")
    X, y, groups = build_training_matrix(examples)
    model = LambdaMART.train(X, y, num_trees=num_trees, max_depth=max_depth,
                             min_samples=min_samples)
    with open(model_out, "w") as fh:
        fh.write(model.to_json())
    return model


def train_linear(judgments_path: str, index_path: str, model_out: str) -> LinearRegression:
    judgments = load_judgments(judgments_path)
    api = ApiSearcher(LocalShardedSearcher([LocalSearcher(InvertedIndex(index_path), 0)]))
    examples = collect_examples(api, judgments)
    if not examples:
        raise ValueError("no training examples matched the index")
    X, y, _ = build_training_matrix(examples)
    model = LinearRegression.train(X, y)
    with open(model_out, "w") as fh:
        fh.write(model.to_json())
    return model


def evaluate(judgments_path: str, index_path: str, lambdamart_path: str | None = None) -> dict:
    """NDCG/recall eval of the full pipeline (role of ltr/eval/recall.py)."""
    from ..ltr.eval import evaluate_ranking
    from ..ranking.pipeline import RankingPipeline, RecallStage
    from ..searcher.query import SearchQuery

    judgments = load_judgments(judgments_path)
    recall = RecallStage()
    if lambdamart_path:
        with open(lambdamart_path) as fh:
            recall.lambdamart = LambdaMART.from_json(fh.read())
    api = ApiSearcher(
        LocalShardedSearcher([LocalSearcher(InvertedIndex(index_path), 0)]),
        pipeline=RankingPipeline(recall=recall),
    )

    def search_fn(q):
        res = api.search_websites(SearchQuery(query=q, num_results=20))
        return [w["url"] for w in res.webpages]

    return evaluate_ranking(search_fn, judgments)
