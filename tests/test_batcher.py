"""Query micro-batcher: concurrent queries share a device batch and return the
same results as the single path."""

import threading

import numpy as np
import pytest

from stract_tpu.index import InvertedIndex
from stract_tpu.ranking.computer import QueryContext
from stract_tpu.searcher.batcher import QueryBatcher

from conftest import make_doc


def test_batched_results_match_single(tmp_path):
    idx = InvertedIndex(str(tmp_path / "b"))
    for i in range(20):
        idx.insert(make_doc(f"https://s{i}.com/x", f"topic {i % 3} page",
                            f"content about topic {i % 3} and item {i}",
                            host_centrality=0.1 * (i % 7)))
    idx.commit()

    queries = [QueryContext(raw=f"topic {i % 3}", simple_terms=["topic", str(i % 3)],
                            current_ts=1e9) for i in range(12)]
    # batched (via API used by the batcher)
    batched = idx.search_initial_batch(queries, top_k=10)
    # single path
    for ctx, (b_ptrs, b_scores) in zip(queries, batched):
        s_ptrs, s_scores = idx.search_initial(ctx, top_k=10)
        assert [p.doc for p in b_ptrs] == [p.doc for p in s_ptrs]
        np.testing.assert_allclose(b_scores, s_scores, rtol=1e-6)


def test_batcher_concurrent_callers(tmp_path):
    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.searcher.query import SearchQuery

    idx = InvertedIndex(str(tmp_path / "c"))
    idx.insert(make_doc("https://a.com/1", "alpha page", "alpha content here"))
    idx.insert(make_doc("https://b.com/2", "beta page", "beta content here"))
    idx.commit()
    local = LocalSearcher(idx)
    local.batcher = QueryBatcher(local, max_batch=8, window_ms=20)
    try:
        results = {}

        def call(term):
            results[term] = local.search_initial(SearchQuery(query=term))

        threads = [threading.Thread(target=call, args=(t,)) for t in ["alpha", "beta"] * 3]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert len(results["alpha"][0]) == 1
        assert len(results["beta"][0]) == 1
        a_cand = results["alpha"][0][0]
        assert idx.retrieve([a_cand.pointer])[0]["url"] == "https://a.com/1"
        # dedup columns come back through the batcher; signals are LAZY for a
        # local searcher and materialize on demand
        assert a_cand.dedup
        assert a_cand.signals is None
        local.materialize_signals(SearchQuery(query="alpha"), [a_cand])
        assert a_cand.signals.shape[0] > 0 and a_cand.signals.any()
    finally:
        local.batcher.stop()


def test_pipelined_batcher_overlap_and_results():
    """PipelinedBatcher: results map back to the right callers, and batch k's
    phase2 overlaps batch k+1's phase1 (the whole point of the two workers)."""
    import threading
    import time

    from stract_tpu.searcher.batcher import PipelinedBatcher

    events = []
    lock = threading.Lock()

    def phase1(items):
        with lock:
            events.append(("p1", tuple(items)))
        time.sleep(0.05)
        return [x * 10 for x in items]

    def phase2(mid):
        with lock:
            events.append(("p2", tuple(mid)))
        time.sleep(0.05)
        return [x + 1 for x in mid]

    b = PipelinedBatcher(phase1, phase2, max_batch=4, window_ms=20.0)
    try:
        results = {}

        def call(x):
            results[x] = b.submit(x)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == {i: i * 10 + 1 for i in range(12)}
        # overlap: at least one phase1 started before an earlier batch's phase2
        # finished — i.e. the event log interleaves p1/p2 (with 12 items in
        # 4-batches there are >= 3 of each)
        kinds = [k for k, _ in events]
        assert kinds.count("p1") >= 3 and kinds.count("p2") >= 3
        first_p2 = kinds.index("p2")
        assert "p1" in kinds[first_p2 + 1:], kinds  # a later batch's phase1 ran after a phase2 began
    finally:
        b.stop()


def test_pipelined_batcher_exception_propagates_per_batch():
    """A phase1 (or phase2) exception fails exactly that batch's callers; the
    workers stay alive for the next batch."""
    import threading

    from stract_tpu.searcher.batcher import PipelinedBatcher

    def phase1(items):
        if any(x < 0 for x in items):
            raise ValueError("bad batch")
        return items

    def phase2(mid):
        if any(x == 99 for x in mid):
            raise RuntimeError("tail exploded")
        return [x * 2 for x in mid]

    b = PipelinedBatcher(phase1, phase2, max_batch=1, window_ms=1.0)
    try:
        import pytest as _pytest

        with _pytest.raises(ValueError, match="bad batch"):
            b.submit(-5)
        with _pytest.raises(RuntimeError, match="tail exploded"):
            b.submit(99)
        assert b.submit(21) == 42  # workers survived both failures
    finally:
        b.stop()
