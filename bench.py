"""Headline benchmark: fused multi-signal search QPS on one TPU chip.

Workload mirrors BASELINE.json config 1+2: single-shard keyword queries over a
synthetic zipf-distributed index, scored with the full fused core-signal pass
(BM25 per field + BM25F + idf-sums + coverage + static column signals), exact
MUST-semantics boolean filtering, and exact top-k — the device path of
InvertedIndex.search_initial.

Measurement notes:
  - the axon tunnel memoizes identical dispatches, so every timed call uses a
    DIFFERENT query batch and forces a small device→host fetch to complete;
  - queries: 1 required common term + 11 optional mixed-frequency terms per
    query (12 slots), P=64 slot bucket, L=1024 postings/slot, K=1024 — i.e.
    the device scores up to 65k posting entries per query, far above the
    reference's 1000-doc early-termination budget.

Baseline: the same gather+score+merge+topk algorithm in vectorized numpy on
this host's CPU (the Rust reference cannot run here; this is the same-machine
proxy). Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BENCH_DOCS, BENCH_TERMS, BENCH_BATCHES, BENCH_BATCH.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def build_synthetic(D: int, n_terms: int, rng):
    """Synthetic postings with zipf doc frequencies + random tf/field lens."""
    ranks = np.arange(1, n_terms + 1)
    dfs = np.minimum((D * 0.3 / ranks**0.7).astype(np.int64) + 5, D)
    total = int(dfs.sum())
    starts = np.concatenate([[0], np.cumsum(dfs)[:-1]])
    docs = np.empty(total, dtype=np.int32)
    for i in range(n_terms):
        df = int(dfs[i])
        # sorted pseudo-random subset: cumulative gaps scaled into [0, D)
        gaps = rng.random(df)
        ids = (np.cumsum(gaps) / (gaps.sum() + 1e-9) * (D - 1)).astype(np.int32)
        docs[starts[i] : starts[i] + df] = np.maximum.accumulate(ids)
    tfs = rng.integers(1, 16, total).astype(np.int32)
    field_lens = rng.integers(20, 2000, D).astype(np.float32)
    static = rng.random((11, D), dtype=np.float32) * 0.1
    return dfs, starts.astype(np.int64), docs, tfs, field_lens, static


def main():
    import jax
    import jax.numpy as jnp

    from stract_tpu.ops import scoring as O
    from stract_tpu.ranking import bm25_math as BM

    D = int(os.environ.get("BENCH_DOCS", 2_000_000))
    N_TERMS = int(os.environ.get("BENCH_TERMS", 20_000))
    N_BATCHES = int(os.environ.get("BENCH_BATCHES", 3))
    BATCH = int(os.environ.get("BENCH_BATCH", 8192))
    P, L, K = 16, O.DEFAULT_L, O.DEFAULT_K  # 12 slots → P=16 bucket
    TPQ = 12
    AVG_LEN = 500.0

    rng = np.random.default_rng(0)
    dfs, t_starts, docs, tfs, field_lens, static = build_synthetic(D, N_TERMS, rng)

    # ---- device arrays (one segment resident in HBM) -------------------------
    norm = BM.K1 * (1 - BM.B + BM.B * field_lens[docs] / AVG_LEN)
    f1 = tfs * (BM.K1 + 1) / (tfs + norm)
    q1 = np.clip(np.round(f1 * O.FACTOR_SCALE), 1, 65535).astype(np.int64)
    factors = ((q1 << 16) | q1).astype(np.int32)  # bm25f factor ≈ bm25 factor here

    DB = 1
    while DB < D + 1:
        DB *= 2
    static_pad = np.zeros((O.NUM_STATIC, DB), dtype=np.float32)
    static_pad[:, :D] = static
    static_default = (O.DEFAULT_STATIC_COEFFS[:, None] * static_pad).sum(axis=0)
    static_scale = max(float(static_default[:D].max()), 1e-6) / 65535.0
    static_q = np.clip(np.round(static_default[docs] / static_scale), 0, 65535).astype(np.int64)
    aux = (static_q << 16).astype(np.int64).astype(np.int32)
    postings = np.zeros((len(docs) + L, 3), np.int32)
    postings[:, 0] = D
    postings[: len(docs), 0] = docs
    postings[: len(docs), 1] = factors
    postings[: len(docs), 2] = aux
    seg = O.SegmentArrays(
        postings=jnp.asarray(postings),
        static_cols=jnp.asarray(static_pad),
        static_default=jnp.asarray(static_default),
        static_scale=jnp.float32(static_scale),
        region_ids=jnp.zeros(DB, jnp.int32),
        last_updated=jnp.zeros(DB, jnp.float32),
        num_docs=jnp.int32(D),
    )

    # ---- query batches ---------------------------------------------------------
    def make_qs(B, seed):
        r = np.random.default_rng(seed)
        req = r.integers(0, 200, (B, 1))                 # 1 required common term
        opt = r.integers(0, N_TERMS, (B, TPQ - 1))       # 11 optional terms
        term_ids = np.concatenate([req, opt], axis=1)
        z = np.zeros((B, P - TPQ), np.int32)
        starts = np.concatenate([t_starts[term_ids].astype(np.int32), z], 1)
        lens = np.concatenate([dfs[term_ids].astype(np.int32), z], 1)
        idf = np.log1p((D - lens + 0.5) / (lens + 0.5)).astype(np.float32)
        idf[lens == 0] = 0
        group = np.full((B, P), O.OPTIONAL_GROUP, np.int32)
        group[:, 0] = 0
        NS = O.NUM_STATIC
        return O.QuerySlots(
            starts=jnp.asarray(starts), lens=jnp.asarray(lens), group=jnp.asarray(group),
            n_required=jnp.full((B,), 1, jnp.int32), idf=jnp.asarray(idf),
            w_bm25=jnp.asarray(idf * 0.01), w_bm25f=jnp.asarray(idf * 0.1),
            w_presence=jnp.asarray(idf * 0.001),
            static_coeffs=jnp.asarray(np.tile(O.DEFAULT_STATIC_COEFFS, (B, 1))),
            region_lut=jnp.zeros((B, O.NUM_REGIONS), jnp.float32),
            coeff_region=jnp.zeros((B,), jnp.float32), coeff_update=jnp.zeros((B,), jnp.float32),
            current_ts=jnp.full((B,), 1e9, jnp.float32),
        )

    batches = [make_qs(BATCH, s) for s in range(N_BATCHES + 1)]

    # warmup/compile + sanity
    d, s = O.score_candidates_batch(seg, batches[0], L, K, True)
    sd = np.asarray(d)
    n_valid = int((sd[0] < D).sum())
    assert n_valid > 0, "bench queries must match documents"

    t0 = time.perf_counter()
    for qs in batches[1:]:
        d, s = O.score_candidates_batch(seg, qs, L, K, True)
        np.asarray(d[0, :1])  # force completion (defeats tunnel memoization too)
    tpu_time = time.perf_counter() - t0
    tpu_qps = (N_BATCHES * BATCH) / tpu_time

    # ---- CPU baseline: same algorithm, vectorized numpy -------------------------
    h = batches[1]
    h_starts = np.asarray(h.starts)
    h_lens = np.asarray(h.lens)
    h_idf = np.asarray(h.idf)
    h_group = np.asarray(h.group)

    def cpu_query(qi):
        all_docs, all_contrib, all_group = [], [], []
        for p in range(TPQ):
            st, ln = int(h_starts[qi, p]), min(int(h_lens[qi, p]), L)
            if ln <= 0:
                continue
            dd = docs[st : st + ln]
            ff = (factors[st : st + ln] >> 16).astype(np.float32) / O.FACTOR_SCALE
            c = h_idf[qi, p] * 0.01 * ff + h_idf[qi, p] * 0.1 * ff + h_idf[qi, p] * 0.001
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
        has_req = np.zeros(len(uniq), bool)
        has_req[inv[gg == 0]] = True
        total = sums + static_default[uniq]
        total[~has_req] = -np.inf
        k = min(K, len(total))
        top = np.argpartition(-total, k - 1)[:k]
        return uniq[top]

    n_cpu = min(32, BATCH)
    best = None
    for _ in range(3):  # best-of-3 to stabilize the host-side baseline
        t0 = time.perf_counter()
        for qi in range(n_cpu):
            cpu_query(qi)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    cpu_qps = n_cpu / best

    print(json.dumps({
        "metric": "fused_multisignal_search_qps_1chip",
        "value": round(tpu_qps, 2),
        "unit": f"qps (D={D}, L={L}, K={K}, batch={BATCH}, valid_cands_q0={n_valid})",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
    }))


if __name__ == "__main__":
    main()
