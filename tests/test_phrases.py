"""Exact phrase-query verification via token positions."""

import pytest

from stract_tpu.index import InvertedIndex
from stract_tpu.searcher.local import LocalSearcher
from stract_tpu.searcher.query import SearchQuery
from stract_tpu.query import Query

from conftest import make_doc


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    idx = InvertedIndex(str(tmp_path_factory.mktemp("ph")))
    idx.insert(make_doc("https://a.com/1", "memory safety in rust",
                        "rust guarantees memory safety without garbage collection"))
    idx.insert(make_doc("https://b.com/2", "safety of memory chips",
                        "memory hardware and the safety of chips"))
    idx.commit()
    return idx


def test_query_parses_phrases():
    q = Query.parse('rust "memory safety"')
    assert q.phrases == [["memory", "safety"]]


def test_phrase_positions(index):
    seg = index.segments[0]
    from stract_tpu.schema import text_field
    from stract_tpu.utils.hashing import term_hash
    from stract_tpu.index.inverted import DocPointer

    # positions recorded for title tokens
    fid = text_field("title").id
    for doc in range(2):
        pos = seg.positions_for(term_hash(fid, "memory"), doc)
        assert len(pos) == 1


def test_phrase_filtering(index):
    searcher = LocalSearcher(index)
    # both docs contain the words; only doc a has them adjacent
    cands, _ = searcher.search_initial(SearchQuery(query='"memory safety"'))
    urls = [index.retrieve([c.pointer])[0]["url"] for c in cands]
    assert urls == ["https://a.com/1"]

    # non-phrase query matches both
    cands, _ = searcher.search_initial(SearchQuery(query="memory safety"))
    assert len(cands) == 2


def test_phrase_survives_merge(tmp_path):
    idx = InvertedIndex(str(tmp_path / "m"))
    idx.insert(make_doc("https://a.com/1", "quick brown fox", "the quick brown fox jumps"))
    idx.commit()
    idx.insert(make_doc("https://b.com/2", "brown quick reversal", "fox brown quick words"))
    idx.commit()
    idx.merge_all()
    searcher = LocalSearcher(idx)
    cands, _ = searcher.search_initial(SearchQuery(query='"quick brown fox"'))
    assert len(cands) == 1
    assert idx.retrieve([cands[0].pointer])[0]["url"] == "https://a.com/1"
