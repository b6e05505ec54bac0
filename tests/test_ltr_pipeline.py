"""LTR training flow: judgments → signal features → LambdaMART → better NDCG
(role of reference ltr/lambdamart.py offline training loop)."""

import json

import numpy as np
import pytest

from conftest import make_doc


@pytest.fixture(scope="module")
def corpus_index(tmp_path_factory):
    from stract_tpu.index import InvertedIndex

    idx = InvertedIndex(str(tmp_path_factory.mktemp("ltr_idx")))
    # "gold" doc has the term in title; distractors only in body spam
    idx.insert(make_doc("https://gold.com/widget", "Widget shop with best widget",
                        "buy a widget here widget deals"))
    idx.insert(make_doc("https://spam1.com/x", "random page",
                        "widget widget widget widget widget widget widget spam",
                        host_centrality=0.5))
    idx.insert(make_doc("https://spam2.com/y", "another page", "widget stuff here",
                        host_centrality=0.4))
    idx.commit()
    return idx


def test_train_and_eval_lambdamart(tmp_path, corpus_index):
    from stract_tpu.entrypoint import ltr as ltr_ep

    judgments_path = str(tmp_path / "judgments.jsonl")
    with open(judgments_path, "w") as fh:
        fh.write(json.dumps({"query": "widget", "url": "https://gold.com/widget", "relevance": 4}) + "\n")
        fh.write(json.dumps({"query": "widget", "url": "https://spam1.com/x", "relevance": 0}) + "\n")
        fh.write(json.dumps({"query": "widget", "url": "https://spam2.com/y", "relevance": 0}) + "\n")

    model_path = str(tmp_path / "lm.json")
    model = ltr_ep.train_lambdamart(judgments_path, corpus_index.path, model_path,
                                    num_trees=30, max_depth=3, min_samples=1)
    # the trained model must prefer the judged-relevant doc's features
    metrics = ltr_ep.evaluate(judgments_path, corpus_index.path, model_path)
    assert metrics["ndcg@1"] == pytest.approx(1.0), metrics
    assert metrics["recall@3"] == pytest.approx(1.0)

    # linear model path too
    lin_path = str(tmp_path / "lin.json")
    ltr_ep.train_linear(judgments_path, corpus_index.path, lin_path)
    with open(lin_path) as fh:
        assert "weights" in json.loads(fh.read())
