"""Bot deep-paging approx-offsets bypass (reference searcher/api/mod.rs:503,
561-566): offset+num past the 300-result pipeline window skips recall and
precision entirely and serves approximate offsets."""

import numpy as np

from conftest import make_doc

from stract_tpu.index import InvertedIndex
from stract_tpu.ranking.pipeline import RankingPipeline, NUM_PIPELINE_RANKING_RESULTS
from stract_tpu.ranking.pipeline.recall import RecallStage
from stract_tpu.ranking.pipeline.precision import PrecisionStage
from stract_tpu.searcher.api import ApiSearcher
from stract_tpu.searcher.distributed import LocalShardedSearcher
from stract_tpu.searcher.local import LocalSearcher
from stract_tpu.searcher.query import SearchQuery


class CountingRecall(RecallStage):
    calls = 0

    def apply_many_blocks(self, items):
        CountingRecall.calls += len(items)
        return super().apply_many_blocks(items)


class CountingPrecision(PrecisionStage):
    calls = 0

    def apply_many(self, items):
        CountingPrecision.calls += sum(1 for it in items if it[1])
        return super().apply_many(items)


def build_api(tmp_path, n_docs=450):
    idx = InvertedIndex(str(tmp_path))
    for i in range(n_docs):
        idx.insert(make_doc(url=f"https://site{i}.com/widget", title=f"widget catalog {i}",
                            body=f"widget inventory entry {i}",
                            host_centrality=1.0 - i * 1e-3))
    idx.commit()
    return ApiSearcher(
        LocalShardedSearcher([LocalSearcher(idx, 0)]),
        pipeline=RankingPipeline(recall=CountingRecall(),
                                 precision=CountingPrecision()))


def test_deep_page_bypasses_pipeline(tmp_path):
    api = build_api(tmp_path)
    CountingRecall.calls = CountingPrecision.calls = 0
    deep = SearchQuery(query="widget", page=18, num_results=20)  # offset 360 > 300
    assert deep.offset() + deep.num_results > NUM_PIPELINE_RANKING_RESULTS
    res = api.search(deep)
    assert res.to_json()["type"] == "websites"
    assert len(res.webpages) == 20
    assert res.has_more_results
    assert CountingRecall.calls == 0  # recall stage skipped
    assert CountingPrecision.calls == 0  # precision skipped

    # shallow pages still take the full pipeline
    shallow = api.search(SearchQuery(query="widget", page=0, num_results=20))
    assert CountingRecall.calls == 1 and CountingPrecision.calls == 1
    # deep page results are disjoint from (and ranked below) page 0
    deep_urls = {w["url"] for w in res.webpages}
    top_urls = {w["url"] for w in shallow.webpages}
    assert not (deep_urls & top_urls)
    assert min(w["score"] for w in shallow.webpages) >= max(w["score"] for w in res.webpages)


def test_deep_page_offsets_walk_the_ranking(tmp_path):
    api = build_api(tmp_path)
    pages = [api.search(SearchQuery(query="widget", page=p, num_results=20))
             for p in (16, 17)]
    u16 = [w["url"] for w in pages[0].webpages]
    u17 = [w["url"] for w in pages[1].webpages]
    assert len(u16) == len(u17) == 20 and not (set(u16) & set(u17))
    # scores keep descending across consecutive deep pages (single shard →
    # approximate offsets are exact here)
    assert pages[0].webpages[-1]["score"] >= pages[1].webpages[0]["score"]


def test_deep_page_ranking_signals(tmp_path):
    api = build_api(tmp_path)
    res = api.search(SearchQuery(query="widget catalog", page=17, num_results=20,
                                 return_ranking_signals=True))
    assert res.webpages and all(w.get("rankingSignals") for w in res.webpages)
