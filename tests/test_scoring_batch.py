"""Pallas batched pass-1 vs the XLA-gather variant (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stract_tpu.ops import scoring as O
from stract_tpu.ranking import bm25_math as BM


def make_fixture(rng, D=5000, n_terms=50):
    dfs = rng.integers(5, 400, n_terms)
    starts = np.concatenate([[0], np.cumsum(dfs)[:-1]]).astype(np.int64)
    total = int(dfs.sum())
    docs = np.empty(total, dtype=np.int32)
    for i in range(n_terms):
        docs[starts[i]: starts[i] + dfs[i]] = np.sort(
            rng.choice(D, size=dfs[i], replace=False)
        )
    tfs = rng.integers(1, 10, total).astype(np.float64)
    flen = rng.integers(10, 300, D).astype(np.float64)
    norm = BM.K1 * (1 - BM.B + BM.B * flen[docs] / 100.0)
    f1 = tfs * (BM.K1 + 1) / (tfs + norm)
    q1 = np.clip(np.round(f1 * O.FACTOR_SCALE), 1, 65535).astype(np.int64)
    factors = ((q1 << 16) | q1).astype(np.int32)

    L = 512
    DB = 8192
    static = rng.random((O.NUM_STATIC, DB)).astype(np.float32) * 0.1
    static[:, D:] = 0
    static_default = (O.DEFAULT_STATIC_COEFFS[:, None] * static).sum(0)
    static_scale = max(float(static_default[:D].max()), 1e-6) / 65535.0
    static_q = np.clip(np.round(static_default[docs] / static_scale), 0, 65535).astype(np.int64)
    postings = np.zeros((len(docs) + L, 3), np.int32)
    postings[:, 0] = D
    postings[: len(docs), 0] = docs
    postings[: len(docs), 1] = factors
    postings[: len(docs), 2] = (static_q << 16).astype(np.int64).astype(np.int32)
    seg = O.SegmentArrays(
        postings=jnp.asarray(postings),
        static_cols=jnp.asarray(static),
        static_default=jnp.asarray(static_default),
        static_scale=jnp.float32(static_scale),
        region_ids=jnp.zeros(DB, jnp.int32),
        last_updated=jnp.zeros(DB, jnp.float32),
        num_docs=jnp.int32(D),
    )
    return seg, dfs, starts, L


def make_batch(rng, dfs, starts, B=4, P=16, D=5000):
    n_terms = len(dfs)
    term_ids = rng.integers(0, n_terms, (B, 6))
    z = np.zeros((B, P - 6), np.int32)
    q_starts = np.concatenate([starts[term_ids].astype(np.int32), z], 1)
    q_lens = np.concatenate([dfs[term_ids].astype(np.int32), z], 1)
    idf = np.log1p((D - q_lens + 0.5) / (q_lens + 0.5)).astype(np.float32)
    idf[q_lens == 0] = 0
    group = np.full((B, P), O.OPTIONAL_GROUP, np.int32)
    group[:, 0] = 0
    group[:, 1] = 1
    NS = O.NUM_STATIC
    return O.QuerySlots(
        starts=jnp.asarray(q_starts), lens=jnp.asarray(q_lens), group=jnp.asarray(group),
        n_required=jnp.full((B,), 2, jnp.int32), idf=jnp.asarray(idf),
        w_bm25=jnp.asarray(idf * 0.01), w_bm25f=jnp.asarray(idf * 0.1),
        w_presence=jnp.asarray(idf * 0.001),
        static_coeffs=jnp.asarray(np.tile(O.DEFAULT_STATIC_COEFFS, (B, 1))),
        region_lut=jnp.zeros((B, O.NUM_REGIONS), jnp.float32),
        coeff_region=jnp.zeros((B,), jnp.float32), coeff_update=jnp.zeros((B,), jnp.float32),
        current_ts=jnp.full((B,), 1e9, jnp.float32),
    )


def test_pallas_batch_matches_xla_batch(rng):
    seg, dfs, starts, L = make_fixture(rng)
    qs = make_batch(rng, dfs, starts)
    K = 128
    d_x, s_x = O.score_candidates_batch_xla(seg, qs, L, K, True)
    d_p, s_p = O.score_candidates_batch(seg, qs, L, K, True)
    np.testing.assert_array_equal(np.asarray(d_x), np.asarray(d_p))
    np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_p), rtol=1e-5, atol=1e-6)
    # at least one query found valid candidates
    assert (np.asarray(d_p) < 5000).any()


def test_custom_static_path_matches_default_when_defaults(rng):
    seg, dfs, starts, L = make_fixture(rng)
    qs = make_batch(rng, dfs, starts)
    d_a, s_a = O.score_candidates_batch_xla(seg, qs, L, 128, True)
    d_b, s_b = O.score_candidates_batch_xla(seg, qs, L, 128, False)
    np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_b))
    # fast path quantizes the static score to 16 bits
    np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_b), rtol=1e-3, atol=1e-3)
