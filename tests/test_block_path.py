"""Array-carried shard results (CandidateBlock): parity with the per-object
path it replaced — merge/dedup semantics vs BucketCollector, recall-stage
equivalence, wire round-trip, and end-to-end result identity."""

import numpy as np
import pytest

from stract_tpu.collector import BucketCollector
from stract_tpu.ranking.pipeline import RankedCandidate
from stract_tpu.ranking.pipeline.block import CandidateBlock, merge_blocks
from stract_tpu.index.inverted import DocPointer


def mk_cand(doc, score, url_h=(0, 0), ts_h=(0, 0), sim=0, shard=0, host=0):
    return RankedCandidate(
        shard=shard, pointer=DocPointer(0, doc), score=score, signals=None,
        dedup={
            "url_without_query_hash1": url_h[0], "url_without_query_hash2": url_h[1],
            "title_hash1": ts_h[0], "site_hash1": ts_h[1], "sim_hash": sim,
        },
        host_id=host,
    )


def rows(cands):
    return [(c.pointer.doc, round(float(c.score), 5)) for c in cands]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_merge_blocks_matches_bucket_collector(seed):
    """Randomized parity: same ordering, same exact-dup drops, same simhash
    de-ranks as the object-path BucketCollector."""
    rng = np.random.default_rng(seed)
    cands = []
    for i in range(120):
        url_h = (int(rng.integers(0, 8)), int(rng.integers(0, 8)))
        ts_h = (int(rng.integers(0, 8)), int(rng.integers(0, 8)))
        # a few near-dup simhashes (hamming<=3 of a base) + zeros + uniques
        base = 0xDEADBEEFCAFEBABE
        kind = rng.integers(0, 3)
        sim = 0 if kind == 0 else (base ^ int(rng.integers(0, 8)) if kind == 1
                                   else int(rng.integers(1, 2**63)))
        cands.append(mk_cand(i, float(rng.random()), url_h, ts_h, sim))
    col = BucketCollector(50)
    col.extend(list(cands))
    expect = rows(col.into_sorted_vec())

    got_block = merge_blocks([CandidateBlock.from_candidates(cands)], 50)
    got = rows(got_block.to_candidates())
    assert got == expect


def test_merge_blocks_url_dup_does_not_claim_title_key():
    """A row dropped as a url-dup must not shadow a later row's title+site
    key (BucketCollector inserts into seen_title_site only after the url
    check passes)."""
    a = mk_cand(1, 3.0, url_h=(7, 7), ts_h=(1, 1))
    b = mk_cand(2, 2.0, url_h=(7, 7), ts_h=(2, 2))   # url-dup of a → dropped
    c = mk_cand(3, 1.0, url_h=(9, 9), ts_h=(2, 2))   # must survive
    col = BucketCollector(10)
    col.extend([a, b, c])
    expect = rows(col.into_sorted_vec())
    got = rows(merge_blocks([CandidateBlock.from_candidates([a, b, c])], 10).to_candidates())
    assert got == expect == [(1, 3.0), (3, 1.0)]


def test_search_blocks_matches_search_initial(tmp_path):
    """LocalSearcher.search_blocks_many rows == the object path's candidates
    (same docs, scores, dedup columns, host ids)."""
    import sys
    sys.path.insert(0, "tests")
    from conftest import make_doc

    from stract_tpu.index import InvertedIndex
    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.searcher.query import SearchQuery

    index = InvertedIndex(str(tmp_path))
    for i in range(40):
        topic = "rust programming" if i % 2 else "python snakes"
        index.insert(make_doc(
            url=f"https://site{i}.com/p", title=f"{topic} {i}",
            body=f"all about {topic} number {i}", host_centrality=0.1 + i * 0.01))
    index.commit()
    s = LocalSearcher(index, shard_id=3)
    sqs = [SearchQuery(query="rust programming"), SearchQuery(query="python")]
    blocks = s.search_blocks_many(sqs)
    objs = s.search_initial_many(sqs)
    for (block, bcnt), (cands, ocnt) in zip(blocks, objs):
        assert bcnt.value == ocnt.value and bcnt.exact == ocnt.exact
        conv = block.to_candidates()
        assert rows(conv) == rows(cands)
        for c1, c2 in zip(conv, cands):
            assert c1.dedup == c2.dedup and c1.host_id == c2.host_id
            assert c1.shard == c2.shard == 3


def test_block_wire_roundtrip():
    from stract_tpu.entrypoint.search_server import block_from_wire, block_to_wire

    cands = [mk_cand(i, float(i) / 7, url_h=(i, i + 1), ts_h=(i, 2), sim=i * 17,
                     shard=5, host=i * 3) for i in range(9)]
    b = CandidateBlock.from_candidates(cands)
    b.signals = np.arange(9 * 4, dtype=np.float32).reshape(9, 4)
    b.seg_names = {5: ["seg-a"]}
    w = block_to_wire(b, 5)
    back = block_from_wire(w, 5)
    assert rows(back.to_candidates()) == rows(cands)
    assert np.array_equal(back.signals, b.signals)
    assert back.to_candidates()[0]._seg_name == "seg-a"
    assert back.to_candidates()[0].host_id == 0 and back.to_candidates()[3].host_id == 9
