"""Segment on-disk format property tests + writer fault injection beyond the
crash-mid-commit cases in test_index_search.py (role of the reference's
failpoints tests in the tantivy fork and tantivy's own format proptests).

Covers:
  - arbitrary-content round trip: build → reopen from disk → identical search
    results and stored fields;
  - multi-segment merged-df path: scores over N segments equal the
    single-segment scores when field-length statistics are held equal
    (isolates the cross-segment doc-frequency merge, ranking/computer.py);
  - orphan segment dirs (crash between segment build and manifest write) are
    invisible on reopen and don't break later commits.
"""

import os
import shutil

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from stract_tpu.index import InvertedIndex
from stract_tpu.ranking.computer import QueryContext

from conftest import make_doc

prop_settings = settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

# words that survive tokenization unchanged (lowercase ascii), plus some
# unicode to exercise the stored-field row store
WORD = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "omega", "zeta", "kappa", "theta",
     "søren", "grün", "数据", "bücher"])
DOC_BODY = st.lists(WORD, min_size=3, max_size=12).map(" ".join)


@st.composite
def corpus(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    docs = []
    for i in range(n):
        body = draw(DOC_BODY)
        title = draw(DOC_BODY)
        docs.append(make_doc(
            url=f"https://site{i}.com/p{i}",
            title=title, body=body,
            host_centrality=draw(st.floats(0, 1, allow_nan=False)),
        ))
    return docs


def _search_urls(idx, term, k=10):
    ctx = QueryContext(raw=term, simple_terms=[term], current_ts=1e9)
    ptrs, scores = idx.search_initial(ctx, top_k=k)
    return [d["url"] for d in idx.retrieve(ptrs)], [round(s, 4) for s in scores]


@prop_settings
@given(corpus())
def test_segment_format_roundtrip(tmp_path_factory, docs):
    """Reopening the index from disk reproduces search results and stored
    fields exactly (pointers, scores, row-store strings)."""
    path = str(tmp_path_factory.mktemp("rt"))
    idx = InvertedIndex(path)
    for d in docs:
        idx.insert(dict(d))
    idx.commit()

    reopened = InvertedIndex(path)
    assert reopened.num_docs == len(docs)
    terms = {w for d in docs for w in d["clean_text"].split()}
    for term in sorted(terms)[:4]:
        urls_a, scores_a = _search_urls(idx, term)
        urls_b, scores_b = _search_urls(reopened, term)
        assert urls_a == urls_b
        assert scores_a == scores_b
    # stored fields survive byte-exact (unicode incl. CJK); doc ids within a
    # segment are builder-ordered, not insertion-ordered → compare as sets
    from stract_tpu.index.inverted import DocPointer

    stored = reopened.retrieve([DocPointer(0, i) for i in range(len(docs))])
    assert {(s["url"], s["title"]) for s in stored} == {
        (d["url"], d["title"]) for d in docs}
    shutil.rmtree(path, ignore_errors=True)


@prop_settings
@given(st.lists(DOC_BODY.map(lambda b: " ".join(b.split()[:6] * 2)[:60]),
                min_size=2, max_size=8),
       st.integers(min_value=2, max_value=3))
def test_multisegment_df_matches_single_segment(tmp_path_factory, bodies, n_segs):
    """Same docs split over N commits (N segments) must score like one
    segment: the df lookup merges doc frequencies across segments
    (index/inverted.py _df_lookup; the reference gets this from tantivy's
    Searcher::doc_freq). Field lengths are held EQUAL across docs so
    per-segment length statistics cannot mask a df bug."""
    # equalize token counts: every body exactly 8 tokens
    bodies = [(" ".join((b.split() * 4)[:8])) for b in bodies]
    docs = [make_doc(url=f"https://s{i}.com/p", title="t", body=b)
            for i, b in enumerate(bodies)]

    single = InvertedIndex(str(tmp_path_factory.mktemp("one")))
    for d in docs:
        single.insert(dict(d))
    single.commit()

    multi = InvertedIndex(str(tmp_path_factory.mktemp("many")))
    for j, d in enumerate(docs):
        multi.insert(dict(d))
        if (j + 1) % max(len(docs) // n_segs, 1) == 0:
            multi.commit()
    multi.commit()

    terms = sorted({w for b in bodies for w in b.split()})[:3]
    for term in terms:
        urls_1, scores_1 = _search_urls(single, term)
        urls_n, scores_n = _search_urls(multi, term)
        assert sorted(urls_1) == sorted(urls_n)
        s1 = dict(zip(urls_1, scores_1))
        sn = dict(zip(urls_n, scores_n))
        for u in s1:
            assert s1[u] == pytest.approx(sn[u], abs=2e-3), (term, u, s1, sn)
    for p in (single.path, multi.path):
        shutil.rmtree(p, ignore_errors=True)


def test_orphan_segment_dir_invisible_and_harmless(tmp_path, monkeypatch):
    """Crash AFTER segment build but BEFORE the manifest write: the orphan
    segment dir must be ignored on reopen, and later commits must succeed
    (fresh uuid names can't collide with the orphan)."""
    idx = InvertedIndex(str(tmp_path))
    idx.insert(make_doc(url="https://a.com/", body="committed words"))
    idx.commit()

    idx.insert(make_doc(url="https://b.com/", body="doomed words"))
    real_save = InvertedIndex._save_meta

    def exploding_save(self):
        raise OSError("injected crash: power loss before manifest")

    monkeypatch.setattr(InvertedIndex, "_save_meta", exploding_save)
    with pytest.raises(OSError, match="injected crash"):
        idx.commit()
    monkeypatch.setattr(InvertedIndex, "_save_meta", real_save)

    # the orphan segment dir exists on disk but is not in the manifest
    seg_dirs = os.listdir(os.path.join(str(tmp_path), "segments"))
    reopened = InvertedIndex(str(tmp_path))
    assert reopened.num_docs == 1
    assert len(seg_dirs) > len(reopened.segments)

    # later writes to the REOPENED handle are unaffected by the orphan
    reopened.insert(make_doc(url="https://c.com/", body="later words"))
    reopened.commit()
    again = InvertedIndex(str(tmp_path))
    assert again.num_docs == 2
    urls, _ = _search_urls(again, "words")
    assert set(urls) == {"https://a.com/", "https://c.com/"}


def test_truncated_postings_detected_on_open(tmp_path):
    """A torn segment file (truncated postings after a successful manifest
    write — disk corruption class) must surface as a loud error at read time,
    not silently wrong results."""
    idx = InvertedIndex(str(tmp_path))
    for i in range(50):
        idx.insert(make_doc(url=f"https://a.com/{i}", body="alpha beta gamma " * 3))
    idx.commit()
    seg_dir = os.path.join(str(tmp_path), "segments", idx.meta["segments"][0])
    pfile = os.path.join(seg_dir, "postings_docs.bin")
    size = os.path.getsize(pfile)
    with open(pfile, "r+b") as fh:
        fh.truncate(size // 2)

    reopened = InvertedIndex(str(tmp_path))
    with pytest.raises(Exception):
        ctx = QueryContext(raw="alpha", simple_terms=["alpha"], current_ts=1e9)
        ptrs, _ = reopened.search_initial(ctx, top_k=10)
        # if search somehow succeeds on torn postings, retrieval must not
        # return fabricated docs
        assert len(ptrs) == 0
        raise RuntimeError("empty results are an acceptable loud failure")
