"""q8 posting-row layout (STRACT_TPU_ROW_LAYOUT=q8, index/device.py
quantize_rows_q8): the 8 B/posting HBM variant of the [Ptot, 3] q16 rows.
Stage A scans the quantized rows; stage B verifies with exact q16 factors, so
end-to-end results must match the q16 layout bit-for-bit whenever the
candidate cut is not binding (any small corpus)."""

import numpy as np
import pytest

from stract_tpu.index import InvertedIndex
from stract_tpu.index.device import quantize_rows_q8
from stract_tpu.ops import scoring as O
from stract_tpu.ranking.computer import QueryContext

from conftest import make_doc


def _ctx(q: str) -> QueryContext:
    return QueryContext(raw=q, simple_terms=q.split(), current_ts=1.7e9)


def test_quantize_decode_roundtrip():
    rng = np.random.default_rng(7)
    n = 4096
    docs = np.sort(rng.integers(0, (1 << 25) - 2, n)).astype(np.int64)
    f1 = rng.integers(1, 65536, n)
    f2 = rng.integers(1, 65536, n)
    static = rng.integers(0, 65536, n)
    region = rng.integers(0, 16, n)
    days = rng.integers(0, 4096, n)
    rows = np.empty((n, 3), dtype=np.int32)
    rows[:, 0] = docs
    rows[:, 1] = (((f1 << 16) | f2) & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    rows[:, 2] = (((static << 16) | (region << O.AUX_REGION_SHIFT) | days)
                  & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

    q8 = quantize_rows_q8(rows)
    import jax.numpy as jnp

    d_docs, d_factors, d_aux = O._decode_rows(jnp.asarray(q8))
    d_docs, d_factors, d_aux = map(np.asarray, (d_docs, d_factors, d_aux))

    np.testing.assert_array_equal(d_docs, docs)  # doc ids are exact
    w1 = (np.asarray(d_factors).astype(np.int64) & 0xFFFFFFFF)
    g1, g2 = (w1 >> 16) & 0xFFFF, w1 & 0xFFFF
    assert np.abs(g1 - f1).max() <= 128 + 257  # round ±128; clip-to-1 floor
    assert np.abs(g2 - f2).max() <= 128 + 257
    assert (g1 >= 257).all() and (g2 >= 257).all()  # presence preserved
    aux = np.asarray(d_aux).astype(np.int64) & 0xFFFFFFFF
    assert np.abs(((aux >> 16) & 0xFFFF) - static).max() <= 129
    np.testing.assert_array_equal((aux >> O.AUX_REGION_SHIFT) & 0xF, region)
    d_days = aux & O.AUX_DAYS_MASK
    assert ((d_days > 0) == (days > 0)).all()  # freshness presence exact
    assert np.abs(d_days - days)[days > 0].max() <= 16


@pytest.fixture()
def corpus(tmp_path):
    docs = []
    rng = np.random.default_rng(3)
    words = ["rust", "python", "tokio", "async", "web", "search", "engine",
             "index", "fast", "slow", "crab", "snake"]
    for i in range(120):
        t = " ".join(rng.choice(words, 3))
        b = " ".join(rng.choice(words, 24))
        docs.append(make_doc(url=f"https://s{i % 7}.example.com/p{i}",
                             title=t, body=b,
                             host_centrality=float(rng.random())))
    return docs


def _search(path, docs, queries, monkeypatch, layout):
    if layout == "q8":
        monkeypatch.setenv("STRACT_TPU_ROW_LAYOUT", "q8")
    else:
        monkeypatch.delenv("STRACT_TPU_ROW_LAYOUT", raising=False)
    idx = InvertedIndex(str(path))
    if idx.num_docs == 0:
        for d in docs:
            idx.insert(d)
        idx.commit()
    out = []
    for q in queries:
        ptrs, scores = idx.search_initial(_ctx(q), top_k=32)
        out.append(([(p.segment, p.doc) for p in ptrs], np.asarray(scores)))
    return out


def test_q8_layout_end_to_end_parity(tmp_path, corpus, monkeypatch):
    queries = ["rust async", "python search engine", "crab", "web index fast"]
    a = _search(tmp_path / "idx", corpus, queries, monkeypatch, "q16")
    b = _search(tmp_path / "idx", corpus, queries, monkeypatch, "q8")
    for (docs16, sc16), (docs8, sc8) in zip(a, b):
        assert docs16 == docs8
        np.testing.assert_allclose(sc16, sc8, rtol=1e-6)
