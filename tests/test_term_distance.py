"""Recall-stage term-distance signals from stored positions (reference
ranking/pipeline/scorers/term_distance.rs + stages/recall.rs:311-312)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from stract_tpu.ranking.term_distance import (
    SLOP_MAX, _min_slop_listform, _pair_min_gap, min_slop_block, score_slop)


def test_reference_vector():
    """term_distance.rs test_min_slop: [[13,18,22],[8,15,30],[9,16]] → 2."""
    assert _min_slop_listform([[13, 18, 22], [8, 15, 30], [9, 16]]) == 2


def test_pair_min_gap_matches_listform_randomized():
    rng = np.random.default_rng(3)
    for _ in range(50):
        n_rows = int(rng.integers(1, 6))
        pos, rows = [[], []], [[], []]
        per_row = [[[], []] for _ in range(n_rows)]
        for t in range(2):
            for r in range(n_rows):
                k = int(rng.integers(0, 5))
                ps = sorted(rng.choice(60, size=k, replace=False).tolist())
                per_row[r][t] = ps
                pos[t].extend(ps)
                rows[t].extend([r] * k)
        got = _pair_min_gap(
            np.asarray(pos[0], np.int64), np.asarray(rows[0], np.int32),
            np.asarray(pos[1], np.int64), np.asarray(rows[1], np.int32), n_rows)
        for r in range(n_rows):
            expect = _min_slop_listform([per_row[r][0], per_row[r][1]])
            assert got[r] == expect, (r, per_row[r], got[r], expect)


def test_min_slop_block_against_listform(tmp_path):
    from conftest import make_doc

    from stract_tpu.index import InvertedIndex
    from stract_tpu.schema import text_field
    from stract_tpu.utils.hashing import term_hash

    idx = InvertedIndex(str(tmp_path))
    bodies = [
        "rust is a systems programming language",     # rust..programming gap 4
        "programming in rust rust programming now",   # adjacent pair present
        "rust language",                              # no 'programming'
        "some rust and then much later programming",  # gap 5
    ]
    for i, b in enumerate(bodies):
        idx.insert(make_doc(url=f"https://s{i}.com/", title=f"doc {i}", body=b))
    idx.commit()
    seg = idx.segments[0]
    # map url → doc id via retrieve
    fid = text_field("clean_body").id
    docs = np.arange(seg.num_docs, dtype=np.int64)
    got = min_slop_block(seg, fid, ["rust", "programming"], docs, term_hash)
    for d in range(seg.num_docs):
        stored = seg.stored_doc(d)
        toks = stored["clean_text"].split()
        per_term = [[i for i, t in enumerate(toks) if t == w]
                    for w in ("rust", "programming")]
        assert got[d] == _min_slop_listform(per_term), (stored["clean_text"], got[d])


def test_slop_influences_recall_ordering(tmp_path):
    """Two docs with identical term sets: the one with ADJACENT query terms
    must outrank the scattered one once the recall slop signal lands, and the
    rankingSignals response must expose the position-derived scores."""
    from conftest import make_doc

    from stract_tpu.index import InvertedIndex
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.searcher.query import SearchQuery

    idx = InvertedIndex(str(tmp_path))
    filler = " ".join(["lorem"] * 40)
    idx.insert(make_doc(url="https://adjacent.com/", title="alpha omega report",
                        body=f"alpha omega {filler}"))
    idx.insert(make_doc(url="https://scattered.com/", title="alpha report omega",
                        body=f"alpha {filler} omega"))
    idx.commit()
    api = ApiSearcher(LocalShardedSearcher([LocalSearcher(idx, 0)]))
    res = api.search(SearchQuery(query="alpha omega", return_ranking_signals=True))
    got = [w["url"] for w in res.webpages]
    assert got[0] == "https://adjacent.com/"
    sigs = res.webpages[0]["rankingSignals"]
    # adjacent tokens → ordered gap 1 → score 1/(1+1) (reference
    # min_slop_two_positions counts b−a, so adjacency is slop 1 not 0)
    assert sigs["min_title_slop"] == pytest.approx(0.5)
    assert sigs["min_clean_body_slop"] == pytest.approx(0.5)
    s2 = res.webpages[1]["rankingSignals"]
    assert s2["min_title_slop"] == pytest.approx(1 / 3)   # gap 2 → 1/(2+1)
    assert s2["min_clean_body_slop"] == pytest.approx(1 / 42)


def test_single_term_query_slop_is_max(tmp_path):
    from conftest import make_doc

    from stract_tpu.index import InvertedIndex
    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.searcher.query import SearchQuery

    idx = InvertedIndex(str(tmp_path))
    idx.insert(make_doc(url="https://a.com/", title="solo", body="solo term"))
    idx.commit()
    s = LocalSearcher(idx, 0)
    block, _ = s.search_blocks_many([SearchQuery(query="solo")])[0]
    assert np.all(block.cols["title_slop"] == SLOP_MAX)
    assert float(score_slop(block.cols["title_slop"])[0]) < 1e-9
