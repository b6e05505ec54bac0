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
        soft_bonus=jnp.full((B,), O.SOFT_REQUIRED_BONUS, jnp.float32),
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


def test_soft_bonus_dominates_extreme_custom_boost():
    """Advisor round-2 low: with a per-query scaled soft bonus, a FULL boolean
    match must stay inside the stage-A candidate cut even when an extreme
    custom coefficient inflates partial matches' scores past the old fixed
    SOFT_REQUIRED_BONUS=16384."""
    from stract_tpu.ranking.computer import _soft_bonus

    D = 600
    # slot 0 (required group 0): only doc 0. slot 1 (optional): docs 1..D-1,
    # carrying a HUGE weight so every partial match scores ~1e6 * factor.
    docs0 = np.array([0], np.int32)
    docs1 = np.arange(1, D, dtype=np.int32)
    all_docs = np.concatenate([docs0, docs1])
    q1 = np.full(len(all_docs), 40000, np.int64)  # tf factor ~0.61 of max
    factors = ((q1 << 16) | q1).astype(np.int32)
    L = 512
    postings = np.zeros((len(all_docs) + L, 3), np.int32)
    postings[:, 0] = D
    postings[: len(all_docs), 0] = all_docs
    postings[: len(all_docs), 1] = factors
    seg = O.SegmentArrays(
        postings=jnp.asarray(postings),
        static_cols=jnp.zeros((O.NUM_STATIC, 1024), jnp.float32),
        static_default=jnp.zeros(1024, jnp.float32),
        static_scale=jnp.float32(1e-6),
        region_ids=jnp.zeros(1024, jnp.int32),
        last_updated=jnp.zeros(1024, jnp.float32),
        num_docs=jnp.int32(D),
    )
    P = 16
    starts = np.zeros(P, np.int32)
    lens = np.zeros(P, np.int32)
    starts[0], lens[0] = 0, 1
    starts[1], lens[1] = 1, D - 1
    group = np.full(P, O.OPTIONAL_GROUP, np.int32)
    group[0] = 0
    w_bm25 = np.zeros(P, np.float32)
    w_bm25[0] = 1.0
    w_bm25[1] = 1e6  # extreme custom/optic boost on the optional slot
    zeros = np.zeros(P, np.float32)
    bonus = _soft_bonus(w_bm25, zeros, zeros, np.zeros(O.NUM_STATIC, np.float32),
                        np.zeros(O.NUM_REGIONS, np.float32), 0.0, 0.0)
    assert bonus > 1e6  # scaled past the extreme coefficient
    q = O.QuerySlots(
        starts=jnp.asarray(starts), lens=jnp.asarray(lens), group=jnp.asarray(group),
        n_required=jnp.int32(1), idf=jnp.ones(P, jnp.float32),
        w_bm25=jnp.asarray(w_bm25), w_bm25f=jnp.asarray(zeros),
        w_presence=jnp.asarray(zeros),
        static_coeffs=jnp.zeros(O.NUM_STATIC, jnp.float32),
        region_lut=jnp.zeros(O.NUM_REGIONS, jnp.float32),
        coeff_region=jnp.float32(0), coeff_update=jnp.float32(0),
        current_ts=jnp.float32(1e9),
        soft_bonus=jnp.float32(bonus),
    )
    # K smaller than the number of boosted partials: without the scaled bonus
    # doc 0 (the only full match) is crowded out of the cut
    cand, _ = O.score_candidates(seg, q, L, 64, False, soft_required=True)
    assert 0 in np.asarray(cand), "full match crowded out of stage-A cut"
    assert int(np.asarray(cand)[0]) == 0, "full match must rank first"
