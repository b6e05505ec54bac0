"""Native C++ tokenizer: exact parity with the Python default tokenizer."""

import numpy as np
import pytest

from stract_tpu import native
from stract_tpu.tokenizer import tokenize
from stract_tpu.utils.hashing import prehash, term_hash

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")

TEXTS = [
    "Hello, World! 123",
    "ÆbleGrød på dansk",
    "русский текст И ЕЩЁ",
    "mixed ASCII and 中文字符 here",
    "punct... only!!! ---",
    "CamelCase and UPPER and lower",
    "",
    "a",
    "numbers 42 123abc mixed99",
]


@pytest.mark.parametrize("text", TEXTS)
def test_unigram_parity(text):
    res = native.tokenize_hashes(text, ngrams=True)
    py_toks = tokenize(text)
    if res is None:
        pytest.skip("fallback text")
    uni, bi, tri = res
    expected = np.array([prehash(t) for t in py_toks], dtype=np.uint64)
    np.testing.assert_array_equal(uni, expected)
    exp_bi = np.array([prehash(a + b) for a, b in zip(py_toks, py_toks[1:])], dtype=np.uint64)
    np.testing.assert_array_equal(bi, exp_bi)
    exp_tri = np.array(
        [prehash(a + b + c) for a, b, c in zip(py_toks, py_toks[1:], py_toks[2:])],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(tri, exp_tri)


def test_combine_field_parity():
    uni, _, _ = native.tokenize_hashes("rust systems programming")
    out = native.combine_field(uni, 7)
    expected = np.array([term_hash(7, t) for t in ["rust", "systems", "programming"]], dtype=np.uint64)
    np.testing.assert_array_equal(out, expected)


def test_fallback_codepoint():
    # U+0130 İ lowercases to 2 codepoints — the native tokenizer must refuse
    assert native.tokenize_hashes("İstanbul") is None


def test_final_sigma_falls_back():
    # word-final Σ lowers to ς in Python but σ in any per-codepoint table; the
    # native tokenizer must refuse texts containing Σ (byte-identical contract)
    assert native.tokenize_hashes("ΟΔΥΣΣΕΥΣ hero") is None
    assert "ΟΔΥΣΣΕΥΣ".lower() == "οδυσσευς"  # the context-sensitive case itself


def test_astral_letters_tokenize():
    # plane-3 CJK ext letters are \p{L}: must classify as word chars, not seps
    text = "𰀀𰀁 plane3 \U0002A700 plane2"
    res = native.tokenize_hashes(text, ngrams=True)
    assert res is not None
    uni = res[0]
    expected = np.array([prehash(t) for t in tokenize(text)], dtype=np.uint64)
    np.testing.assert_array_equal(uni, expected)


def test_index_build_native_matches_query_side(tmp_path):
    """Docs indexed through the native path must be findable by Python-side
    query hashing (the semantics contract)."""
    from stract_tpu.index import InvertedIndex
    from stract_tpu.ranking.computer import QueryContext
    from conftest import make_doc

    idx = InvertedIndex(str(tmp_path / "i"))
    idx.insert(make_doc("https://x.com/1", "Blazingly Fast Søgning", "unicode tokens ÆØÅ här"))
    idx.commit()
    ctx = QueryContext(raw="søgning", simple_terms=["søgning"], current_ts=1e9)
    ptrs, _ = idx.search_initial(ctx, top_k=5)
    assert len(ptrs) == 1
    ctx = QueryContext(raw="här", simple_terms=["här"], current_ts=1e9)
    ptrs, _ = idx.search_initial(ctx, top_k=5)
    assert len(ptrs) == 1
