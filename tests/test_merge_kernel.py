"""Segmented P-way bitonic merge (ops/scoring.py merge_sorted_tiles — the
wire-or-kill candidate for HOT LOOP 1's packed-key lax.sort, reference
inverted_index/search.rs:47): exact output parity with the full sort, and
end-to-end pass-1 parity under STRACT_TPU_MERGE_KERNEL=1."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stract_tpu.ops import scoring as O


def _runs(rng, P, L, hi=1 << 20):
    k = np.sort(rng.integers(0, hi, (P, L)), axis=1).astype(np.int32)
    c = rng.random((P, L)).astype(np.float32)
    x = rng.integers(0, 1 << 30, (P, L)).astype(np.int32)
    return k, c, x


@pytest.mark.parametrize("P,L", [(2, 8), (4, 128), (64, 1024)])
def test_merge_matches_sort(P, L):
    rng = np.random.default_rng(11)
    k, c, x = _runs(rng, P, L)
    mk, (mc, mx) = jax.jit(O.merge_sorted_tiles)(k, c, x)
    mk, mc, mx = map(np.asarray, (mk, mc, mx))
    flat = k.reshape(-1)
    order = np.argsort(flat, kind="stable")
    np.testing.assert_array_equal(mk, flat[order])
    # payload rows ride with their key: per-key multisets must match (the
    # merge is unstable within equal keys, like lax.sort num_keys=1)
    ref_c, ref_x = c.reshape(-1)[order], x.reshape(-1)[order]
    lo = 0
    for hi in np.flatnonzero(np.concatenate([mk[1:] != mk[:-1], [True]])) + 1:
        assert sorted(mc[lo:hi]) == pytest.approx(sorted(ref_c[lo:hi]))
        assert sorted(mx[lo:hi]) == sorted(ref_x[lo:hi])
        lo = hi


def test_pass1_parity_with_merge_kernel(monkeypatch):
    """score_candidates under the merge kernel returns the exact same top-k
    as under lax.sort (same keys → same segment sums → same scores)."""
    from stract_tpu.index import InvertedIndex
    from stract_tpu.ranking.computer import QueryContext

    from conftest import make_doc

    idx = InvertedIndex.temporary()
    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for i in range(96):
        idx.insert(make_doc(url=f"https://h{i % 5}.example.com/{i}",
                            title=" ".join(rng.choice(words, 2)),
                            body=" ".join(rng.choice(words, 20))))
    idx.commit()
    ctx = QueryContext(raw="alpha beta", simple_terms=["alpha", "beta"],
                       current_ts=1.7e9)

    ptrs_a, sc_a = idx.search_initial(ctx, top_k=16)
    monkeypatch.setattr(O, "MERGE_KERNEL", True)
    idx2 = InvertedIndex(idx.path)
    ptrs_b, sc_b = idx2.search_initial(ctx, top_k=16)
    assert [(p.segment, p.doc) for p in ptrs_a] == [(p.segment, p.doc) for p in ptrs_b]
    np.testing.assert_allclose(np.asarray(sc_a), np.asarray(sc_b), rtol=1e-6)
