"""Headline benchmark: fused multi-signal search QPS on one TPU chip.

Workload mirrors BASELINE.json config 1+2: single-shard keyword queries over a
synthetic zipf-distributed index, scored with the full fused core-signal pass
(BM25 per field + BM25F + idf-sums + coverage + static column signals) and
exact top-k — the device path of InvertedIndex.search_initial.

Baseline: the same workload on the host CPU in vectorized numpy (the reference
is a native CPU engine; this proxy measures the identical gather+score+topk
algorithm on this machine's CPU since the Rust reference can't run here).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BENCH_DOCS (default 2_000_000), BENCH_QUERIES, BENCH_BATCH.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def build_synthetic(D: int, n_terms: int, rng):
    """Synthetic postings with zipf doc frequencies, plus static columns."""
    ranks = np.arange(1, n_terms + 1)
    dfs = np.minimum((D * 0.3 / ranks**0.7).astype(np.int64) + 5, D)
    total = int(dfs.sum())
    starts = np.concatenate([[0], np.cumsum(dfs)[:-1]])
    docs = np.empty(total, dtype=np.int32)
    # doc ids ascending per term: random sorted subsets via stride sampling
    for i in range(n_terms):
        df = dfs[i]
        offs = rng.integers(0, max(D // df, 1), df, dtype=np.int64)
        ids = np.cumsum(offs) + rng.integers(0, 3)
        ids = np.minimum(ids * (D // max(ids[-1], 1)) if ids[-1] >= D else ids, D - 1)
        ids = np.unique(ids.astype(np.int32))
        if len(ids) < df:
            ids = np.pad(ids, (0, df - len(ids)), mode="edge")
        docs[starts[i] : starts[i] + df] = ids[:df]
    tfs = rng.integers(1, 16, total).astype(np.int32)
    field_lens = rng.integers(20, 2000, D).astype(np.float32)
    static = rng.random((11, D), dtype=np.float32) * 0.1
    return dfs, starts.astype(np.int64), docs, tfs, field_lens, static


def main():
    import jax
    import jax.numpy as jnp

    from stract_tpu.ops import scoring as O

    D = int(os.environ.get("BENCH_DOCS", 2_000_000))
    N_TERMS = int(os.environ.get("BENCH_TERMS", 20_000))
    N_QUERIES = int(os.environ.get("BENCH_QUERIES", 512))
    BATCH = int(os.environ.get("BENCH_BATCH", 64))
    P, L, K = 64, O.DEFAULT_L, O.DEFAULT_K
    TERMS_PER_QUERY = 12  # ~3 words × 4 scored fields

    rng = np.random.default_rng(0)
    dfs, t_starts, docs, tfs, field_lens, static = build_synthetic(D, N_TERMS, rng)

    # ---- device arrays (one segment resident in HBM) -------------------------
    DB = 1
    while DB < D + 1:
        DB *= 2
    flens = np.ones((1, DB), dtype=np.float32)
    flens[0, :D] = field_lens
    static_pad = np.zeros((O.NUM_STATIC, DB), dtype=np.float32)
    static_pad[:, :D] = static
    seg = O.SegmentArrays(
        postings_docs=jnp.asarray(docs),
        postings_tfs=jnp.asarray(tfs),
        field_lens=jnp.asarray(flens),
        static_cols=jnp.asarray(static_pad),
        region_ids=jnp.zeros(DB, jnp.int32),
        last_updated=jnp.zeros(DB, jnp.float32),
        num_docs=jnp.int32(D),
    )

    # ---- query batches ---------------------------------------------------------
    def make_query_batch(B):
        # zipf-ish term picks: mix of common and rare terms
        term_ids = rng.integers(0, N_TERMS, (B, TERMS_PER_QUERY))
        q_starts = t_starts[term_ids].astype(np.int32)
        q_lens = dfs[term_ids].astype(np.int32)
        pad = P - TERMS_PER_QUERY
        z_i = np.zeros((B, pad), np.int32)
        starts_arr = np.concatenate([q_starts, z_i], axis=1)
        lens_arr = np.concatenate([q_lens, z_i], axis=1)
        idf = np.log1p((D - lens_arr + 0.5) / (lens_arr + 0.5)).astype(np.float32)
        idf[lens_arr == 0] = 0
        group = np.full((B, P), O.OPTIONAL_GROUP, np.int32)
        group[:, :3] = np.arange(3)[None, :]  # 3 required term groups
        group[:, 3:TERMS_PER_QUERY] = O.OPTIONAL_GROUP
        S_, NS = 46, O.NUM_STATIC
        qs = O.QuerySlots(
            starts=jnp.asarray(starts_arr),
            lens=jnp.asarray(lens_arr),
            group=jnp.asarray(group),
            n_required=jnp.full((B,), 3, jnp.int32),
            field_idx=jnp.zeros((B, P), jnp.int32),
            avg_len=jnp.full((B, P), 500.0, jnp.float32),
            idf=jnp.asarray(idf),
            w_bm25=jnp.asarray(idf * 0.01),
            w_bm25f=jnp.asarray(idf * 0.1),
            bm25f_cf=jnp.ones((B, P), jnp.float32),
            w_presence=jnp.asarray(idf * 0.001),
            agg_bm25=jnp.zeros((B, S_, P), jnp.float32),
            agg_bm25f=jnp.zeros((B, 1, P), jnp.float32),
            agg_idf=jnp.zeros((B, S_, P), jnp.float32),
            agg_cov=jnp.zeros((B, S_, P), jnp.float32),
            static_coeffs=jnp.full((B, NS), 0.1, jnp.float32),
            region_lut=jnp.zeros((B, O.NUM_REGIONS), jnp.float32),
            coeff_region=jnp.zeros((B,), jnp.float32),
            coeff_update=jnp.zeros((B,), jnp.float32),
            current_ts=jnp.full((B,), 1e9, jnp.float32),
        )
        return qs, starts_arr, lens_arr, idf, group

    qs, h_starts, h_lens, h_idf, h_group = make_query_batch(BATCH)

    # warmup + compile
    d, s = O.score_candidates_batch(seg, qs, L, K)
    jax.block_until_ready((d, s))

    n_batches = max(N_QUERIES // BATCH, 1)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        d, s = O.score_candidates_batch(seg, qs, L, K)
    jax.block_until_ready((d, s))
    tpu_time = time.perf_counter() - t0
    tpu_qps = (n_batches * BATCH) / tpu_time

    # ---- CPU baseline: same algorithm, vectorized numpy -------------------------
    def cpu_query(qi):
        acc: dict = {}
        total_contrib = np.zeros(0)
        all_docs = []
        all_contrib = []
        all_group = []
        for p in range(TERMS_PER_QUERY):
            st, ln = h_starts[qi, p], min(h_lens[qi, p], L)
            if ln <= 0:
                continue
            dd = docs[st : st + ln]
            tt = tfs[st : st + ln].astype(np.float32)
            fl = field_lens[dd]
            norm = 1.2 * (1 - 0.75 + 0.75 * fl / 500.0)
            tf_factor = tt * 2.2 / (tt + norm)
            c = h_idf[qi, p] * 0.01 * tf_factor + h_idf[qi, p] * 0.1 * tf_factor + h_idf[qi, p] * 0.001
            all_docs.append(dd)
            all_contrib.append(c)
            all_group.append(np.full(ln, h_group[qi, p]))
        dd = np.concatenate(all_docs)
        cc = np.concatenate(all_contrib)
        gg = np.concatenate(all_group)
        order = np.lexsort((gg, dd))
        dd, cc, gg = dd[order], cc[order], gg[order]
        uniq, inv = np.unique(dd, return_inverse=True)
        sums = np.bincount(inv, weights=cc)
        req = np.zeros((len(uniq), 3), bool)
        m = gg < 3
        req[inv[m], gg[m]] = True
        ok = req.all(axis=1)
        total = sums + 0.1 * static[:, uniq].sum(axis=0)
        total[~ok] = -np.inf
        k = min(K, len(total))
        top = np.argpartition(-total, k - 1)[:k]
        return uniq[top]

    n_cpu = min(16, BATCH)
    t0 = time.perf_counter()
    for qi in range(n_cpu):
        cpu_query(qi)
    cpu_time = time.perf_counter() - t0
    cpu_qps = n_cpu / cpu_time

    print(json.dumps({
        "metric": "fused_multisignal_search_qps_1chip",
        "value": round(tpu_qps, 2),
        "unit": f"qps (D={D}, L={L}, K={K}, batch={BATCH})",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
    }))


if __name__ == "__main__":
    main()
