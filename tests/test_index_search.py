"""End-to-end single-shard search tests: segment build → device scoring → retrieve,
validated against a brute-force host oracle that recomputes every core signal and
the MUST/MUST_NOT boolean semantics."""

import os

import numpy as np
import pytest

from stract_tpu.index import InvertedIndex
from stract_tpu.index.segment import Segment
from stract_tpu.ranking import bm25_math as BM
from stract_tpu.ranking import signals as S
from stract_tpu.ranking.computer import QueryContext, NGRAM_FIELDS
from stract_tpu.schema import text_field
from stract_tpu.tokenizer import get_tokenizer
from stract_tpu.utils.hashing import term_hash

from conftest import make_doc


def brute_force_scores(segment: Segment, ctx: QueryContext, total_docs: int, region_scores=None):
    """Host oracle: per-doc core-signal linear combination + boolean semantics,
    mirroring the device fused pass (posting budget ignored — small corpora)."""
    n = segment.num_docs
    text = np.zeros(n)
    is_candidate = np.zeros(n, dtype=bool)
    req_count = np.zeros(n, dtype=np.int64)
    excluded = np.zeros(n, dtype=bool)
    n_terms = max(len(ctx.simple_terms), 1)
    n_req = 0

    def score_slot(fname, tok, scoring):
        f = text_field(fname)
        docs, tfs = segment.postings(term_hash(f.id, tok))
        if len(docs) == 0:
            return docs
        if not scoring:
            return docs
        df = len(docs)
        idf = np.log1p((max(total_docs - df, 0) + 0.5) / (df + 0.5))
        avg = segment.avg_field_len(f.id)
        flen = np.maximum(segment.field_lens[f.id][docs].astype(np.float64), 1.0)
        tf = tfs.astype(np.float64)
        tff = BM.bm25_tf_factor(tf, flen, avg)
        for sig in S.SIGNALS:
            if sig.kind == "bm25" and sig.field == fname:
                text[docs] += ctx.coeff(sig) * idf * tff
            if sig.kind == "idf_sum" and sig.field == fname:
                text[docs] += ctx.coeff(sig) * idf
            if sig.kind == "coverage" and sig.field == fname:
                text[docs] += ctx.coeff(sig) / n_terms
        if fname in S.BM25F_FIELD_COEFFS:
            cf = S.BM25F_FIELD_COEFFS[fname]
            text[docs] += ctx.coeff(S.BM25_F) * idf * BM.bm25f_tf_factor(tf, cf, flen, avg)
        return docs

    for g in ctx.groups:
        group_docs = set()
        for fname in g.fields:
            f = text_field(fname)
            for tok in dict.fromkeys(get_tokenizer(f.tokenizer).tokenize(g.text)):
                docs = score_slot(fname, tok, g.scoring and not g.excluded)
                group_docs.update(int(d) for d in docs)
        gd = np.array(sorted(group_docs), dtype=np.int64)
        if len(gd):
            is_candidate[gd] = True
        if g.excluded:
            if len(gd):
                excluded[gd] = True
        elif g.required:
            n_req += 1
            if len(gd):
                req_count[gd] += 1

    # n-gram boosters
    joined = " ".join(ctx.simple_terms)
    if len(ctx.simple_terms) >= 2:
        for fname in NGRAM_FIELDS:
            f = text_field(fname)
            for tok in dict.fromkeys(get_tokenizer(f.tokenizer).tokenize(joined)):
                docs = score_slot(fname, tok, True)
                if len(docs):
                    is_candidate[docs] = True

    col = lambda name: np.asarray(segment.column(name), dtype=np.float64)
    static = np.zeros(n)
    static += ctx.coeff(S.HOST_CENTRALITY) * col("host_centrality")
    static += ctx.coeff(S.PAGE_CENTRALITY) * col("page_centrality")
    static += ctx.coeff(S.HOST_CENTRALITY_RANK) * BM.score_rank(col("host_centrality_rank"), np)
    static += ctx.coeff(S.PAGE_CENTRALITY_RANK) * BM.score_rank(col("page_centrality_rank"), np)
    static += ctx.coeff(S.IS_HOMEPAGE) * col("is_homepage")
    static += ctx.coeff(S.FETCH_TIME_MS) * BM.score_fetch_time(col("fetch_time_ms"), np)
    static += ctx.coeff(S.TRACKER_SCORE) * BM.score_reciprocal(col("tracker_score"))
    static += ctx.coeff(S.URL_DIGITS) * BM.score_reciprocal(col("num_path_and_query_digits"))
    static += ctx.coeff(S.URL_SLASHES) * BM.score_reciprocal(col("num_path_and_query_slashes"))
    static += ctx.coeff(S.LINK_DENSITY) * BM.score_link_density(col("link_density"), np)
    static += ctx.coeff(S.HAS_ADS) * BM.score_has_ads(col("likely_has_ads"), np)
    if region_scores is not None:
        lut = np.array(region_scores, dtype=np.float64).copy()
        if ctx.selected_region > 0:
            lut[ctx.selected_region % len(lut)] += 50.0
        static += ctx.coeff(S.REGION) * lut[col("region").astype(int).clip(0, len(lut) - 1)]
    static += ctx.coeff(S.UPDATE_TIMESTAMP) * BM.score_update_timestamp(col("last_updated"), ctx.current_ts, np)

    scores = text + static
    valid = is_candidate & (req_count == n_req) & ~excluded
    return np.where(valid, scores, -np.inf)


CORPUS = [
    make_doc("https://example.com/", "Example Domain Website", "this domain is for use in examples", host_centrality=0.5, host_centrality_rank=3),
    make_doc("https://rust-lang.org/", "The Rust Programming Language", "rust is a systems programming language fast and memory safe", host_centrality=0.9, host_centrality_rank=1),
    make_doc("https://python.org/about", "About Python", "python is a programming language that lets you work quickly", host_centrality=0.8, host_centrality_rank=2),
    make_doc("https://news.site.com/rust-adoption", "Rust adoption grows", "more companies adopt rust for systems programming this year", host_centrality=0.2, host_centrality_rank=10),
    make_doc("https://blog.io/cooking", "Cooking pasta", "how to cook pasta carbonara with eggs and cheese", host_centrality=0.1, host_centrality_rank=50),
]


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    idx = InvertedIndex(str(tmp_path_factory.mktemp("idx")))
    for d in CORPUS:
        idx.insert(d)
    idx.commit()
    return idx


def assert_matches_oracle(index, ctx, top_k=10):
    ptrs, scores = index.search_initial(ctx, top_k=top_k)
    seg = index.segments[0]
    oracle = brute_force_scores(seg, ctx, index.num_docs, index.region_scores())
    expected = [int(d) for d in np.argsort(-oracle) if np.isfinite(oracle[d])][:top_k]
    got = [p.doc for p in ptrs]
    assert got == expected, (got, expected, oracle)
    for p, s in zip(ptrs, scores):
        assert abs(s - oracle[p.doc]) < 2e-3, (p.doc, s, oracle[p.doc])
    return ptrs, scores


def test_build_and_stats(index):
    assert index.num_docs == 5
    seg = index.segments[0]
    assert seg.meta["num_terms"] > 20
    pcs = np.asarray(seg.column("pre_computed_score"))
    assert all(pcs[i] >= pcs[i + 1] for i in range(len(pcs) - 1))


def test_search_matches_oracle(index):
    ctx = QueryContext(raw="rust programming", simple_terms=["rust", "programming"], current_ts=1e9)
    ptrs, _ = assert_matches_oracle(index, ctx)
    # AND semantics: only docs containing both terms
    urls = [r["url"] for r in index.retrieve(ptrs)]
    assert "https://python.org/about" not in urls
    assert "https://rust-lang.org/" in urls


def test_single_term(index):
    ctx = QueryContext(raw="programming", simple_terms=["programming"], current_ts=1e9)
    ptrs, _ = assert_matches_oracle(index, ctx)
    assert len(ptrs) == 3  # rust-lang, python, news.site


def test_retrieve(index):
    ctx = QueryContext(raw="rust programming", simple_terms=["rust", "programming"], current_ts=1e9)
    ptrs, _ = index.search_initial(ctx, top_k=3)
    results = index.retrieve(ptrs, ctx.simple_terms)
    assert len(results) == len(ptrs)
    top = results[0]
    assert "rust" in (top["title"] + top["snippet"]).lower()
    assert top["url"].startswith("http")


def test_signals_matrix(index):
    ctx = QueryContext(raw="rust", simple_terms=["rust"], current_ts=1e9)
    ptrs, scores = index.search_initial(ctx, top_k=3)
    sig = index.compute_signals(ctx, ptrs)
    assert sig.shape == (len(ptrs), S.NUM_SIGNALS)
    # fused score must equal coefficient-weighted sum of core signals
    coeffs = np.array([s.default_coefficient if s.core else 0.0 for s in S.SIGNALS])
    recombined = sig @ coeffs
    for i, s in enumerate(scores):
        assert abs(recombined[i] - s) < 2e-3
    assert sig[0, S.BM25_TITLE.id] > 0 or sig[0, S.BM25_CLEAN_BODY.id] > 0


def test_homepage_boost():
    idx = InvertedIndex.temporary()
    idx.insert(make_doc("https://thesite.com/", "The Site", "welcome to the site"))
    idx.insert(make_doc("https://other.com/thesite", "thesite mention", "thesite is mentioned here thesite thesite"))
    idx.commit()
    # homepage-only fields are only indexed for the true homepage; boosting their
    # coefficient must flip the ranking despite the other doc's higher tf
    ctx = QueryContext(
        raw="thesite",
        simple_terms=["thesite"],
        current_ts=1e9,
        coefficients={"idf_sum_domain_name_if_homepage_no_tokenizer": 5.0},
    )
    ptrs, _ = idx.search_initial(ctx, top_k=2)
    results = idx.retrieve(ptrs)
    assert len(results) == 2
    assert results[0]["url"] == "https://thesite.com/"


def test_region_boost():
    idx = InvertedIndex.temporary()
    idx.insert(make_doc("https://a.com/x", "hello world", "hello world greetings", region=0))
    idx.insert(make_doc("https://b.com/x", "hello world", "hello world greetings", region=2))
    idx.commit()
    ctx = QueryContext(raw="hello", simple_terms=["hello"], selected_region=2, current_ts=1e9)
    ptrs, _ = idx.search_initial(ctx, top_k=2)
    assert idx.retrieve(ptrs)[0]["url"] == "https://b.com/x"


def test_multi_segment_and_merge(tmp_path):
    idx = InvertedIndex(str(tmp_path / "m"))
    idx.insert(make_doc("https://a.com/1", "alpha beta", "alpha content"))
    idx.commit()
    idx.insert(make_doc("https://b.com/2", "beta gamma", "beta content", host_centrality=0.9))
    idx.commit()
    assert len(idx.segments) == 2
    ctx = QueryContext(raw="beta", simple_terms=["beta"], current_ts=1e9)
    ptrs, scores = idx.search_initial(ctx, top_k=10)
    assert len(ptrs) == 2

    idx.merge_all()
    assert len(idx.segments) == 1
    assert idx.num_docs == 2
    ptrs2, scores2 = idx.search_initial(ctx, top_k=10)
    assert len(ptrs2) == 2
    urls = [r["url"] for r in idx.retrieve(ptrs2)]
    assert set(urls) == {"https://a.com/1", "https://b.com/2"}
    assert urls[0] == "https://b.com/2"


def test_high_tf_oracle():
    """tf >= 2 pushes the quantized bm25 tf-factor past 32768, so the packed
    (q1<<16)|q2 int32 wraps negative — presence/coverage and MUST semantics
    must still count those postings (regression: `factors > 0` dropped them)."""
    idx = InvertedIndex.temporary()
    idx.insert(make_doc("https://a.com/1", "ferris crab", "ferris " * 12 + "crab likes ferris"))
    idx.insert(make_doc("https://b.com/1", "ferris appears once", "ferris mentioned one time here"))
    idx.insert(make_doc("https://c.com/1", "crab only", "crab crab crab crab crab crab crab crab"))
    idx.commit()
    # the packed factor for the high-tf postings really is negative on device
    dev = idx.device_segment(0).arrays
    assert int(np.asarray(dev.postings[:, 1]).min()) < 0
    ctx = QueryContext(raw="ferris crab", simple_terms=["ferris", "crab"], current_ts=1e9)
    ptrs, _ = assert_matches_oracle(idx, ctx)
    assert [r["url"] for r in idx.retrieve(ptrs)] == ["https://a.com/1"]
    sig = idx.compute_signals(ctx, ptrs)
    # pass-2 presence: coverage/idf-sum rows must be nonzero for the match
    assert sig[0, S.BM25_TITLE.id] > 0


def test_missing_term_returns_nothing(index):
    ctx = QueryContext(raw="zzzzqqqq", simple_terms=["zzzzqqqq"], current_ts=1e9)
    ptrs, _ = index.search_initial(ctx, top_k=5)
    assert len(ptrs) == 0


def test_and_semantics_missing_one_term(index):
    # 'rust' exists, 'qqqq' doesn't → MUST fails → no results
    ctx = QueryContext(raw="rust qqqq", simple_terms=["rust", "qqqq"], current_ts=1e9)
    ptrs, _ = index.search_initial(ctx, top_k=5)
    assert len(ptrs) == 0


def test_count_estimate(tmp_path):
    idx = InvertedIndex(str(tmp_path / "cnt"))
    for i in range(30):
        idx.insert(make_doc(f"https://h{i}.com/p", f"common page {i}", "common words body"))
    idx.commit()
    ctx = QueryContext(raw="common", simple_terms=["common"], current_ts=1e9)
    est = idx.estimate_count(ctx)
    assert est >= 30  # every doc matches in ≥1 field

    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.searcher.query import SearchQuery

    s = LocalSearcher(idx)
    # saturate with a small candidate budget → approximate count kicks in
    cands, count = s.search_initial(SearchQuery(query="common"), max_candidates=10)
    assert len(cands) == 10
    assert not count.exact
    assert count.value >= 30


def test_chunked_device_postings_match_reference_impl():
    """build_device_postings (chunked, buffer-reused, f32) must produce the
    same packed factors as the straightforward float64 implementation."""
    import os
    from stract_tpu.index.device import build_device_postings, compute_posting_factors

    idx = InvertedIndex.temporary()
    for i in range(30):
        body = " ".join(f"w{(i * 7 + j) % 40}" for j in range(25)) + " rust " * (i % 4)
        idx.insert(make_doc(f"https://h{i}.com/p", f"title w{i % 9}", body,
                            host_centrality=0.01 * i, region=i % 3,
                            last_updated=1_600_000_000 + i * 86400))
    idx.commit()
    seg = idx.segments[0]
    cache = os.path.join(seg.path, "device_postings.bin")
    if os.path.exists(cache):
        os.unlink(cache)
    got = np.asarray(build_device_postings(seg))
    ref = compute_posting_factors(seg)
    # factors equal up to f32-vs-f64 rounding at the q16 boundary
    diff = np.abs((got[:, 1] >> 16 & 0xFFFF) - (ref >> 16 & 0xFFFF))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01
    diff2 = np.abs((got[:, 1] & 0xFFFF) - (ref & 0xFFFF))
    assert diff2.max() <= 1 and (diff2 > 0).mean() < 0.01
    assert (got[:, 0] == np.asarray(seg.postings_docs)).all()


def test_pass2_factor_cache_parity(index):
    """search_initial caches the verify stage's factor columns on the ctx;
    compute_signals must produce identical signal matrices from the cache and
    from fresh posting binary searches (cache cleared)."""
    from stract_tpu.index import inverted as inv

    if inv.DEVICE_JOIN:
        pytest.skip("host factor cache unused when the device join is enabled")
    ctx = QueryContext(raw="rust programming", simple_terms=["rust", "programming"], current_ts=1e9)
    ptrs, _ = index.search_initial(ctx, top_k=3)
    assert ctx.__dict__.get("_p1_factors"), "stage-B factor cache not populated"
    sig_cached = index.compute_signals(ctx, ptrs)
    ctx.__dict__.pop("_p1_factors")
    sig_fresh = index.compute_signals(ctx, ptrs)
    np.testing.assert_allclose(sig_cached, sig_fresh, rtol=1e-5, atol=1e-6)


def test_factor_cache_miss_on_foreign_doc(index):
    """_cached_factor_fill reports a miss for docs outside the cached candidate
    set (e.g. a pass-2 request from a non-search caller)."""
    from stract_tpu.index import inverted as inv

    if inv.DEVICE_JOIN:
        pytest.skip("host factor cache unused when the device join is enabled")
    ctx = QueryContext(raw="rust", simple_terms=["rust"], current_ts=1e9)
    index.search_initial(ctx, top_k=3)
    seg = index.segments[0]
    hit = ctx.__dict__["_p1_factors"]
    key = next(iter(hit))
    cached_docs = set(int(d) for d in hit[key][0])
    foreign = next(d for d in range(seg.num_docs + 1) if d not in cached_docs)
    out = np.zeros((4, 8), dtype=np.int32)
    cand = np.full(8, seg.num_docs, dtype=np.int32)
    cand[0] = foreign
    assert not index._cached_factor_fill(ctx, key[0], seg, cand, 1, out)


def test_device_factor_join_matches_host(index):
    """ops.scoring.factors_join (on-device binary search over full posting
    ranges) must reproduce the host searchsorted factor matrix exactly."""
    from stract_tpu.ops import scoring as O
    from stract_tpu.ranking.computer import build_slots

    seg = index.segments[0]
    dev = index.device_segment(0)
    ctx = QueryContext(raw="rust programming language", simple_terms=["rust", "programming", "language"], current_ts=1e9)
    q, _ = build_slots(ctx, seg, index.num_docs, index.region_scores(), df_lookup=index._df_lookup())
    qc, _ = index._compact_slots(q, min_p=16)
    cand = np.array([0, 1, 2, 3, 4, seg.num_docs, seg.num_docs, seg.num_docs], dtype=np.int32)
    host = index._slot_factors_for(seg, qc, cand)
    device = np.asarray(O.factors_join(dev.arrays, qc.starts, qc.lens, cand))
    np.testing.assert_array_equal(host, device)
    # batch form
    cand_b = np.stack([cand, cand[::-1].copy()])
    starts_b = np.stack([np.asarray(qc.starts)] * 2)
    lens_b = np.stack([np.asarray(qc.lens)] * 2)
    dev_b = np.asarray(O.factors_join(dev.arrays, starts_b, lens_b, cand_b))
    host_b1 = index._slot_factors_for(seg, qc, cand_b[1])
    np.testing.assert_array_equal(dev_b[0], host)
    np.testing.assert_array_equal(dev_b[1], host_b1)


def test_segment_doc_ceiling_asserted():
    """SegmentBuilder.build enforces the 25-bit packed-key doc ceiling at the
    API boundary instead of silently corrupting device sort keys."""
    from stract_tpu.index.segment import SegmentBuilder
    from stract_tpu.ops.scoring import MAX_SEGMENT_DOCS

    b = SegmentBuilder()
    b.docs = [None] * (MAX_SEGMENT_DOCS + 1)  # sizes only; build checks first
    with pytest.raises(ValueError, match="MAX_SEGMENT_DOCS"):
        b.build("/tmp/never-created-segment")


def test_writer_crash_mid_build_leaves_index_consistent(tmp_path, monkeypatch):
    """Fault injection on the index writer (reference: failpoints in the
    tantivy fork): a crash inside SegmentBuilder.build must leave the on-disk
    index reopenable with only the previously committed segments visible."""
    from stract_tpu.index.segment import SegmentBuilder

    idx = InvertedIndex(str(tmp_path))
    idx.insert(make_doc("https://a.com/", "first doc", "committed content"))
    idx.commit()

    idx.insert(make_doc("https://b.com/", "second doc", "doomed content"))
    real_build = SegmentBuilder.build

    def exploding_build(self, path):
        # let the builder create some files, then die mid-way
        os.makedirs(os.path.join(path, "columns"), exist_ok=True)
        with open(os.path.join(path, "postings.bin"), "wb") as fh:
            fh.write(b"partial")
        raise OSError("injected crash: disk full")

    monkeypatch.setattr(SegmentBuilder, "build", exploding_build)
    with pytest.raises(OSError, match="injected crash"):
        idx.commit()
    monkeypatch.setattr(SegmentBuilder, "build", real_build)

    # reopen from disk: only the committed segment is visible; search works
    idx2 = InvertedIndex(str(tmp_path))
    assert idx2.num_docs == 1
    ctx = QueryContext(raw="committed", simple_terms=["committed"], current_ts=1e9)
    ptrs, _ = idx2.search_initial(ctx, top_k=5)
    assert [idx2.retrieve(ptrs)[0]["url"]] == ["https://a.com/"]


def test_meta_save_crash_preserves_old_manifest(tmp_path, monkeypatch):
    """A crash during the manifest write must preserve the previous manifest
    (atomic tmp+rename protocol)."""
    idx = InvertedIndex(str(tmp_path))
    idx.insert(make_doc("https://a.com/", "first", "content one"))
    idx.commit()

    idx.insert(make_doc("https://b.com/", "second", "content two"))
    real_replace = os.replace

    def exploding_replace(src, dst, *a, **kw):
        if dst.endswith("index_meta.json"):
            raise OSError("injected crash: rename")
        return real_replace(src, dst, *a, **kw)

    monkeypatch.setattr(os, "replace", exploding_replace)
    with pytest.raises(OSError, match="injected crash"):
        idx.commit()
    monkeypatch.setattr(os, "replace", real_replace)

    idx2 = InvertedIndex(str(tmp_path))
    assert idx2.num_docs == 1  # old manifest intact, no torn JSON


def test_native_slot_factors_matches_numpy():
    """native.slot_factors (gallop search over sorted candidates) must equal
    the numpy searchsorted fallback on adversarial ranges: empty slots, long
    ranges, candidates outside every range, duplicate pad candidates."""
    from stract_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    n_rows = 50_000
    docs = np.sort(rng.integers(0, 200_000, n_rows)).astype(np.int32)
    pf = np.zeros((n_rows, 3), dtype=np.int32)
    pf[:, 0] = docs
    pf[:, 1] = rng.integers(1, 2**31 - 1, n_rows, dtype=np.int32)
    # slots: [start, len) ranges incl. empty and full
    starts = np.array([0, 100, 40_000, 0, 49_999], dtype=np.int64)
    lens = np.array([n_rows, 5_000, 10_000, 0, 1], dtype=np.int64)
    cand = np.concatenate([
        rng.integers(0, 220_000, 500), np.full(12, 200_001)
    ]).astype(np.int32)

    out_native = np.zeros((len(starts), len(cand)), dtype=np.int32)
    assert native.slot_factors(pf, starts, lens, cand, out_native)

    out_np = np.zeros_like(out_native)
    for p in range(len(starts)):
        s, l = int(starts[p]), int(lens[p])
        if l == 0:
            continue
        dp = pf[s:s + l, 0]
        pos = np.searchsorted(dp, cand)
        pos_c = np.minimum(pos, l - 1)
        found = dp[pos_c] == cand
        out_np[p, found] = pf[s + pos_c[found], 1]
    np.testing.assert_array_equal(out_native, out_np)


def test_q16_batch_signals_match_single_query(index):
    """compute_signals_batch_many (int16-quantized device fetch) must match
    the single-query f32 path within the quantization bound (3e-5 of each
    signal row's absmax)."""
    ctxs = [
        QueryContext(raw="rust programming", simple_terms=["rust", "programming"], current_ts=1e9),
        QueryContext(raw="cooking pasta", simple_terms=["cooking", "pasta"], current_ts=1e9),
    ]
    items = []
    for ctx in ctxs:
        ptrs, _ = index.search_initial(ctx, top_k=4)
        items.append((ctx, ptrs))
    batch = index.compute_signals_batch_many(items)
    for (ctx, ptrs), sig_b in zip(items, batch):
        ctx.__dict__.pop("_p1_factors", None)  # force fresh single-query path
        sig_1 = index.compute_signals(ctx, ptrs)
        bound = 3e-5 * np.abs(sig_1).max(axis=0, keepdims=True) + 1e-7
        assert (np.abs(sig_b - sig_1) <= bound + 3e-5 * np.abs(sig_1)).all(), (
            np.abs(sig_b - sig_1).max())


def test_fused_stageb_signals_parity(index, monkeypatch):
    """The fused verify+signals dispatch (search_initial_batch with
    FUSED_SIGNALS) must populate a per-ctx signal cache whose rows match the
    fresh pass-2 path within the q16 quantization bound — and
    compute_signals_batch_many must serve the page from that cache without a
    device pass."""
    from stract_tpu.index import inverted as inv

    if inv.DEVICE_JOIN:
        pytest.skip("fused signals unused with the device join")
    monkeypatch.setattr(inv, "FUSED_SIGNALS", True)  # platform default is off on CPU
    ctxs = [
        QueryContext(raw="rust programming", simple_terms=["rust", "programming"], current_ts=1e9),
        QueryContext(raw="cooking pasta", simple_terms=["cooking", "pasta"], current_ts=1e9),
    ]
    res = index.search_initial_batch(ctxs, top_k=8)
    for ctx, (ptrs, _) in zip(ctxs, res):
        assert ctx.__dict__.get("_fused_sigs"), "fused signal cache not populated"
        sig_cached = index.compute_signals_batch_many([(ctx, ptrs)])[0]
        fresh = QueryContext(raw=ctx.raw, simple_terms=list(ctx.simple_terms), current_ts=1e9)
        fresh._segments = ctx._segments
        sig_fresh = index.compute_signals(fresh, ptrs)
        bound = 6e-5 * np.abs(sig_fresh).max() + 1e-6
        assert np.abs(sig_cached - sig_fresh).max() <= bound, (
            np.abs(sig_cached - sig_fresh).max(), bound)


def test_fused_signal_fill_miss_falls_back(index, monkeypatch):
    """A pointer outside the fused top-sig_k set must be a clean miss: the
    query falls back to the device pass-2 path and still returns exact rows."""
    from stract_tpu.index import inverted as inv
    from stract_tpu.index.inverted import DocPointer

    if inv.DEVICE_JOIN:
        pytest.skip("fused signals unused with the device join")
    monkeypatch.setattr(inv, "FUSED_SIGNALS", True)  # platform default is off on CPU
    ctx = QueryContext(raw="rust programming", simple_terms=["rust", "programming"], current_ts=1e9)
    res = index.search_initial_batch([ctx], top_k=4)
    ptrs, _ = res[0]
    cached_docs = set()
    for docs_sorted, _cols, _sig in ctx.__dict__["_fused_sigs"].values():
        cached_docs |= set(int(d) for d in docs_sorted)
    foreign = next(DocPointer(0, d) for d in range(index.num_docs)
                   if d not in cached_docs)
    sig = index.compute_signals_batch_many([(ctx, ptrs + [foreign])])[0]
    fresh = QueryContext(raw=ctx.raw, simple_terms=list(ctx.simple_terms), current_ts=1e9)
    fresh._segments = ctx._segments
    sig_fresh = index.compute_signals(fresh, ptrs + [foreign])
    bound = 6e-5 * np.abs(sig_fresh).max() + 1e-6
    assert np.abs(sig - sig_fresh).max() <= bound
