"""Optics compiled into DEVICE candidate generation (role of reference
query/optic.rs lowering optic rules into the tantivy boolean plan, so filters
affect candidate membership — not just the returned top-K)."""

import numpy as np
import pytest

from stract_tpu.index import InvertedIndex
from stract_tpu.optics import Optic
from stract_tpu.searcher.local import LocalSearcher
from stract_tpu.searcher.query import SearchQuery

from conftest import make_doc


@pytest.fixture(scope="module")
def big_index(tmp_path_factory):
    """200 high-centrality 'noise' docs + 3 low-centrality docs on target.site.
    Unfiltered top-K (capped well below 200) never contains the target docs."""
    idx = InvertedIndex(str(tmp_path_factory.mktemp("optic_idx")))
    for i in range(200):
        idx.insert(make_doc(
            f"https://noise{i}.com/page", f"widget catalog {i}",
            "widget shopping catalog with many great widget deals",
            host_centrality=0.9, host_centrality_rank=i + 1,
        ))
    for i in range(3):
        idx.insert(make_doc(
            f"https://target.site/p{i}", f"widget guide {i}",
            "a widget guide from the target site",
            host_centrality=0.001, host_centrality_rank=5000 + i,
        ))
    idx.commit()
    idx.merge_all()
    return idx


DNM_OPTIC = """
DiscardNonMatching;
Rule {
    Matches {
        Site("|target.site|")
    }
};
"""


def test_discard_non_matching_beyond_topk(big_index):
    """THE correctness case from VERDICT: matching docs outside the unfiltered
    top-K must still be returned (host post-filtering returns zero here)."""
    s = LocalSearcher(big_index)
    # sanity: unfiltered top-50 has no target.site docs
    cands, _ = s.search_initial(SearchQuery(query="widget"), max_candidates=50)
    urls = {big_index.retrieve([c.pointer])[0]["url"] for c in cands}
    assert not any("target.site" in u for u in urls)

    cands, _ = s.search_initial(SearchQuery(query="widget", optic=DNM_OPTIC), max_candidates=50)
    urls = [big_index.retrieve([c.pointer])[0]["url"] for c in cands]
    assert len(urls) == 3
    assert all("target.site" in u for u in urls)


def test_discard_rule_removes_from_candidates(big_index):
    optic = """
Rule {
    Matches {
        Site("|target.site|")
    },
    Action(Discard)
};
"""
    s = LocalSearcher(big_index)
    cands, _ = s.search_initial(SearchQuery(query="guide"), max_candidates=50)
    assert len(cands) == 3  # sanity: only target.site docs contain 'guide'
    cands, _ = s.search_initial(SearchQuery(query="guide", optic=optic), max_candidates=50)
    assert cands == []  # discarded at candidate generation, not post-filtered


def test_blocked_hosts_compiled(big_index):
    from stract_tpu.optics import HostRankings

    s = LocalSearcher(big_index)
    sq = SearchQuery(query="widget guide")
    sq.host_rankings = None
    optic_src = 'Like(Site("x.com"));'
    o = Optic.parse(optic_src)
    o.host_rankings.blocked = ["target.site"]
    groups, residual = o.compile_groups()
    # excluded group carries site+domain (+www) variants
    excl = [g for g in groups if g.excluded]
    assert len(excl) == 1
    pairs = excl[0].expand(big_index.segments[0])
    assert ("site_no_tokenizer", "target.site") in pairs
    assert ("site_no_tokenizer", "www.target.site") in pairs


def test_wildcard_site_pattern_expands_via_value_dict(big_index):
    optic = """
Rule {
    Matches {
        Site("|noise1*")
    },
    Action(Discard)
};
"""
    s = LocalSearcher(big_index)
    cands, _ = s.search_initial(SearchQuery(query="widget", optic=optic), max_candidates=250)
    urls = [big_index.retrieve([c.pointer])[0]["url"] for c in cands]
    assert urls
    # noise1.com, noise10..19x, noise1xx all gone from CANDIDATES
    assert not any("/noise1" in u or u.startswith("https://noise1") for u in urls)
    assert any(u.startswith("https://noise2") for u in urls)


def test_value_dict_survives_merge(tmp_path):
    idx = InvertedIndex(str(tmp_path / "vd"))
    idx.insert(make_doc("https://a.com/1", "alpha", "alpha body"))
    idx.commit()
    idx.insert(make_doc("https://b.com/1", "beta", "beta body"))
    idx.commit()
    idx.merge_all()
    assert set(idx.segments[0].value_dict("site")) >= {"a.com", "b.com"}


def test_content_pattern_stays_host_side():
    o = Optic.parse("""
DiscardNonMatching;
Rule {
    Matches {
        Content("needle")
    }
};
""")
    groups, residual = o.compile_groups()
    assert not any(g.required for g in groups)  # DNM not compiled
    assert residual.discard_non_matching and residual.rules


def test_residual_boosts_kept():
    o = Optic.parse("""
Rule {
    Matches {
        Site("|a.com|")
    },
    Action(Boost(5))
};
""")
    groups, residual = o.compile_groups()
    assert len(residual.rules) == 1 and residual.rules[0].action.kind == "boost"
    assert not any(g.excluded for g in groups)
