"""site: operator semantics (reference query/plan/node.rs:129 + mod.rs:144-158:
a multi-token site: term compiles to a PhraseQuery over url_for_site_operator —
tokens must appear ADJACENT IN ORDER, not OR'd; OR-of-tokens let the 'org'
token alone satisfy site:python.org for every .org page)."""

import sys

import pytest

sys.path.insert(0, "tests")

from stract_tpu.query import Query


@pytest.fixture(scope="module")
def api(tmp_path_factory):
    from conftest import make_doc

    from stract_tpu.index import InvertedIndex
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher

    idx = InvertedIndex(str(tmp_path_factory.mktemp("site_idx")))
    idx.insert(make_doc(url="https://python.org/docs", title="python docs",
                        body="the docs for python"))
    idx.insert(make_doc(url="https://docs.python.org/3", title="library docs",
                        body="python library docs"))
    idx.insert(make_doc(url="https://rust-lang.org/", title="rust docs",
                        body="docs for rust"))
    # contains both tokens 'python' and 'org' in the url, but NOT adjacent →
    # must not match site:python.org
    idx.insert(make_doc(url="https://example.org/python", title="python tips docs",
                        body="docs about python"))
    idx.commit()
    return ApiSearcher(LocalShardedSearcher([LocalSearcher(idx, 0)]))


def urls(api, q):
    from stract_tpu.searcher.query import SearchQuery

    return {w["url"] for w in api.search(SearchQuery(query=q)).webpages}


def test_site_filter_requires_adjacent_tokens(api):
    got = urls(api, "site:python.org docs")
    assert got == {"https://python.org/docs", "https://docs.python.org/3"}


def test_site_filter_subdomain(api):
    assert urls(api, "site:docs.python.org docs") == {"https://docs.python.org/3"}


def test_site_exclusion_uses_identity_fields(api):
    got = urls(api, "-site:python.org docs")
    # python.org (site+domain) and docs.python.org (domain) excluded; the
    # .org pages that merely share url tokens stay
    assert got == {"https://rust-lang.org/", "https://example.org/python"}


def test_site_planning_multi_token():
    q = Query.parse("site:python.org docs")
    site_groups = [g for g in q.groups if not g.scoring]
    assert len(site_groups) == 2 and all(g.required for g in site_groups)
    assert q.field_phrases == [("url_for_site_operator", ["python", "org"])]


def test_site_planning_excluded():
    q = Query.parse("-site:python.org docs")
    ex = [g for g in q.groups if g.excluded]
    assert len(ex) == 1
    assert ex[0].fields == ["site_no_tokenizer", "domain_no_tokenizer"]
    assert q.field_phrases == []


def test_presence_fallback_for_untracked_segments(api, monkeypatch):
    """Segments built before url_for_site_operator tracked positions must fall
    back to token presence, not filter everything."""
    import numpy as np

    s = next(iter(api.searcher.searchers.values()))
    seg = s.index.segments[0]
    # simulate an old segment: hide all positions
    monkeypatch.setattr(
        type(seg), "positions_for",
        lambda self, th, doc: np.zeros(0, dtype=np.int64))
    got = urls(api, "site:python.org docs")
    # adjacency can't be checked → AND-of-tokens fallback keeps the non-
    # adjacent example.org/python page too, but never returns nothing
    assert {"https://python.org/docs", "https://docs.python.org/3"} <= got
