import numpy as np

from stract_tpu.index import InvertedIndex
from stract_tpu.ranking.computer import QueryContext
from stract_tpu.utils.tracing import span, tracing_registry, setup_logging

from conftest import make_doc


def test_span_records_histogram():
    setup_logging("debug")
    with span("unit_test_span", query="x"):
        pass
    text = tracing_registry().render()
    assert "span_unit_test_span_seconds_count" in text


def test_compute_signals_batch_many_matches_single(tmp_path):
    idx = InvertedIndex(str(tmp_path / "i"))
    for i in range(12):
        idx.insert(make_doc(f"https://s{i}.com/p", f"alpha {i % 2} title",
                            f"alpha content {i % 2} body text here"))
    idx.commit()

    items = []
    for i in range(4):
        ctx = QueryContext(raw=f"alpha {i % 2}", simple_terms=["alpha", str(i % 2)], current_ts=1e9)
        ptrs, _ = idx.search_initial(ctx, top_k=5)
        items.append((ctx, ptrs))

    batched = idx.compute_signals_batch_many(items)
    for (ctx, ptrs), sig_b in zip(items, batched):
        sig_s = idx.compute_signals(ctx, ptrs)
        np.testing.assert_allclose(sig_b, sig_s, rtol=1e-5, atol=1e-6)
