"""Headline benchmark: END-TO-END search QPS/chip on a 10M-doc shard.

The measured path is the real serving path (BASELINE.json's operating point),
through real HTTP: aiohttp API server → ApiSearcher (parse → device pass-1 →
device pass-2 → cross-shard merge/dedup → recall stage → retrieve top-20 with
snippets → precision slop signals), backed by the shard micro-batcher so
concurrent queries share device programs. Reported alongside: p50/p99 latency
and NDCG@10 against an exact float64 host oracle over the full corpus (no
early-termination, unquantized BM25) — the quality-parity check BASELINE.json
demands.

Corpus: 10M synthetic web pages (zipf vocabulary, per-site centralities,
stored docs, site/domain identity fields) written by stract_tpu/bench_corpus.py
in the ordinary segment format and cached under BENCH_CACHE.

Baseline: the SAME end-to-end path with JAX on this host's CPU (the Rust
reference cannot run here — no cargo; this machine exposes a single CPU core,
so the host baseline is single-socket-single-core, stated in the unit field).

Env knobs: BENCH_DOCS, BENCH_QUERIES, BENCH_CONCURRENCY, BENCH_CACHE,
BENCH_NDCG_QUERIES, BENCH_SKIP_CPU, BENCH_ROLE (internal).
Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

DOCS = int(os.environ.get("BENCH_DOCS", 10_000_000))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 4096))
CONCURRENCY = int(os.environ.get("BENCH_CONCURRENCY", 64))
CACHE = os.environ.get("BENCH_CACHE", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache"))
NDCG_QUERIES = int(os.environ.get("BENCH_NDCG_QUERIES", 24))


def build_stack():
    import jax

    try:  # persistent XLA cache: tunnel compiles cost seconds, cache survives runs
        jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — older jax / unsupported backend
        pass

    from stract_tpu.api.server import build_app
    from stract_tpu.bench_corpus import ensure_corpus
    from stract_tpu.index import InvertedIndex
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.batcher import QueryBatcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher

    path = ensure_corpus(CACHE, DOCS, log=lambda m: print(m, file=sys.stderr))
    index = InvertedIndex(path)
    local = LocalSearcher(index, shard_id=0)
    local.batcher = QueryBatcher(local, max_batch=CONCURRENCY, window_ms=4.0)
    api = ApiSearcher(LocalShardedSearcher([local]))
    app = build_app(api, max_concurrency=CONCURRENCY)
    return index, local, api, app


def run_http_load(app, queries: list, concurrency: int):
    """Drive the aiohttp app over real HTTP with `concurrency` in-flight
    requests; → (elapsed_s, latencies_ms, n_ok)."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    latencies: list = []

    async def go():
        async with TestClient(TestServer(app)) as client:
            sem = asyncio.Semaphore(concurrency)
            n_ok = 0

            async def one(q):
                nonlocal n_ok
                async with sem:
                    t0 = time.perf_counter()
                    resp = await client.post("/beta/api/search", json={"query": q})
                    body = await resp.json()
                    latencies.append((time.perf_counter() - t0) * 1000)
                    if resp.status == 200 and body.get("type") == "websites":
                        n_ok += 1

            t0 = time.perf_counter()
            await asyncio.gather(*[one(q) for q in queries])
            return time.perf_counter() - t0, n_ok

    # one persistent loop across calls — the aiohttp Application binds to the
    # loop that first serves it, so asyncio.run (fresh loop each call) breaks
    global _LOOP
    try:
        _LOOP
    except NameError:
        _LOOP = asyncio.new_event_loop()
    elapsed, n_ok = _LOOP.run_until_complete(go())
    return elapsed, latencies, n_ok


# ---- exact host oracle (float64, no early termination, unquantized BM25) ------

def oracle_scores(index, ctx) -> np.ndarray:
    from stract_tpu.ranking import bm25_math as BM
    from stract_tpu.ranking import signals as S
    from stract_tpu.schema import text_field
    from stract_tpu.tokenizer import get_tokenizer
    from stract_tpu.utils.hashing import term_hash
    from stract_tpu.ranking.computer import NGRAM_FIELDS

    seg = index.segments[0]
    n = seg.num_docs
    total_docs = index.num_docs
    text = np.zeros(n)
    req_count = np.zeros(n, dtype=np.int64)
    excluded = np.zeros(n, dtype=bool)
    cand = np.zeros(n, dtype=bool)
    n_terms = max(len(ctx.simple_terms), 1)
    n_req = 0
    bm25_sigs = {s.field: s for s in S.SIGNALS if s.kind == "bm25"}
    idf_sigs = {s.field: s for s in S.SIGNALS if s.kind == "idf_sum"}
    cov_sigs = {s.field: s for s in S.SIGNALS if s.kind == "coverage"}

    def score_slot(fname, tok, scoring):
        f = text_field(fname)
        docs, tfs = seg.postings(term_hash(f.id, tok))
        if len(docs) == 0 or not scoring:
            return docs
        df = len(docs)
        idf = np.log1p((max(total_docs - df, 0) + 0.5) / (df + 0.5))
        avg = seg.avg_field_len(f.id)
        flen = np.maximum(seg.field_lens[f.id][docs].astype(np.float64), 1.0)
        tff = BM.bm25_tf_factor(tfs.astype(np.float64), flen, avg)
        if fname in bm25_sigs:
            text[docs] += ctx.coeff(bm25_sigs[fname]) * idf * tff
        if fname in idf_sigs:
            text[docs] += ctx.coeff(idf_sigs[fname]) * idf
        if fname in cov_sigs:
            text[docs] += ctx.coeff(cov_sigs[fname]) / n_terms
        if fname in S.BM25F_FIELD_COEFFS:
            cf = S.BM25F_FIELD_COEFFS[fname]
            text[docs] += ctx.coeff(S.BM25_F) * idf * BM.bm25f_tf_factor(
                tfs.astype(np.float64), cf, flen, avg)
        return docs

    for g in ctx.groups:
        gd = None
        expand = getattr(g, "expand", None)
        pairs = (
            [(fn, tok) for fn, v in expand(seg) for tok in [v]]
            if expand is not None
            else [
                (fn, tok)
                for fn in g.fields
                for tok in dict.fromkeys(get_tokenizer(text_field(fn).tokenizer).tokenize(g.text))
            ]
        )
        for fname, tok in pairs:
            docs = score_slot(fname, tok, g.scoring and not g.excluded)
            if len(docs):
                cand[docs] = True
                m = np.zeros(n, bool)
                m[docs] = True
                gd = m if gd is None else (gd | m)
        if gd is None:
            gd = np.zeros(n, bool)
        if g.excluded:
            excluded |= gd
        elif g.required:
            n_req += 1
            req_count[gd] += 1

    joined = " ".join(ctx.simple_terms)
    if len(ctx.simple_terms) >= 2:
        for fname in NGRAM_FIELDS:
            f = text_field(fname)
            for tok in dict.fromkeys(get_tokenizer(f.tokenizer).tokenize(joined)):
                docs = score_slot(fname, tok, True)
                if len(docs):
                    cand[docs] = True

    static = _oracle_static(index, ctx)
    scores = text + static
    valid = cand & (req_count == n_req) & ~excluded
    return np.where(valid, scores, -np.inf)


_STATIC_CACHE = {}


def _oracle_static(index, ctx) -> np.ndarray:
    from stract_tpu.ranking import bm25_math as BM
    from stract_tpu.ranking import signals as S

    seg = index.segments[0]
    key = id(seg)
    if key not in _STATIC_CACHE:
        col = lambda nm: np.asarray(seg.column(nm), dtype=np.float64)
        st = np.zeros(seg.num_docs)
        st += S.HOST_CENTRALITY.default_coefficient * col("host_centrality")
        st += S.PAGE_CENTRALITY.default_coefficient * col("page_centrality")
        st += S.HOST_CENTRALITY_RANK.default_coefficient * BM.score_rank(col("host_centrality_rank"), np)
        st += S.PAGE_CENTRALITY_RANK.default_coefficient * BM.score_rank(col("page_centrality_rank"), np)
        st += S.IS_HOMEPAGE.default_coefficient * col("is_homepage")
        st += S.FETCH_TIME_MS.default_coefficient * BM.score_fetch_time(col("fetch_time_ms"), np)
        st += S.TRACKER_SCORE.default_coefficient * BM.score_reciprocal(col("tracker_score"))
        st += S.URL_DIGITS.default_coefficient * BM.score_reciprocal(col("num_path_and_query_digits"))
        st += S.URL_SLASHES.default_coefficient * BM.score_reciprocal(col("num_path_and_query_slashes"))
        st += S.LINK_DENSITY.default_coefficient * BM.score_link_density(col("link_density"), np)
        st += S.HAS_ADS.default_coefficient * BM.score_has_ads(col("likely_has_ads"), np)
        _STATIC_CACHE[key] = (st, col("last_updated"))
    st, last_updated = _STATIC_CACHE[key]
    from stract_tpu.ranking import bm25_math as BM2
    from stract_tpu.ranking import signals as S2

    upd = BM2.score_update_timestamp(last_updated, ctx.current_ts or time.time(), np)
    return st + S2.UPDATE_TIMESTAMP.default_coefficient * upd


def ndcg_at_10(index, local, queries: list) -> float:
    """Device top-10 vs exact oracle: relevance of the oracle's rank-r doc is
    1/log2(r+2) over its top-100; NDCG@10 averaged over queries with hits."""
    from stract_tpu.searcher.query import SearchQuery

    vals = []
    for q in queries:
        pq = local.parse_query(SearchQuery(query=q))
        ctx = pq.context()
        oracle = oracle_scores(index, ctx)
        n_valid = int(np.isfinite(oracle).sum())
        if n_valid == 0:
            continue
        top100 = np.argsort(-oracle, kind="stable")[: min(100, n_valid)]
        rel = {int(d): 1.0 / np.log2(r + 2) for r, d in enumerate(top100)}
        cands, _ = local.search_initial(SearchQuery(query=q), max_candidates=100)
        got = [c.pointer.doc for c in cands[:10]]
        dcg = sum(rel.get(d, 0.0) / np.log2(i + 2) for i, d in enumerate(got))
        ideal = sum(
            1.0 / np.log2(r + 2) / np.log2(r + 2) for r in range(min(10, n_valid))
        )
        vals.append(dcg / ideal)
    return float(np.mean(vals)) if vals else 0.0


def main():
    from stract_tpu.bench_corpus import sample_queries

    role = os.environ.get("BENCH_ROLE", "main")
    index, local, api, app = build_stack()
    rng = np.random.default_rng(7)
    warm_qs = sample_queries(rng, 512 if role == "main" else 96)
    run_qs = sample_queries(rng, N_QUERIES)

    # warm: compile every (B, P, L, Kd, K) shape bucket the workload can hit —
    # a single new shape mid-run costs seconds of XLA compile via the tunnel.
    # (cpu_baseline warms less: XLA CPU compiles locally and the single-core
    # baseline would otherwise spend its whole 1h budget warming.)
    run_http_load(app, warm_qs[:64], 8)
    run_http_load(app, warm_qs, CONCURRENCY)

    elapsed, lats, n_ok = run_http_load(app, run_qs, CONCURRENCY)
    qps = len(run_qs) / elapsed
    lats = np.array(lats)
    p50, p99 = float(np.percentile(lats, 50)), float(np.percentile(lats, 99))

    if role == "cpu_baseline":
        print(json.dumps({"qps": qps, "p50": p50, "p99": p99, "ok": n_ok}))
        return

    ndcg = ndcg_at_10(index, local, sample_queries(np.random.default_rng(11), NDCG_QUERIES))

    cpu_qps = None
    if not os.environ.get("BENCH_SKIP_CPU"):
        env = dict(os.environ)
        env.update({
            "BENCH_ROLE": "cpu_baseline",
            "JAX_PLATFORMS": "cpu",
            # enough for a stable single-core qps estimate; 512+ would blow
            # the 1h budget at D=10M
            "BENCH_QUERIES": str(min(N_QUERIES, 128)),
            "BENCH_DOCS": str(DOCS),
            "BENCH_CACHE": CACHE,
        })
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            cpu_qps = json.loads(out.stdout.strip().splitlines()[-1])["qps"]
        except Exception as e:  # noqa: BLE001
            print(f"cpu baseline failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "e2e_search_qps_10M_1chip",
        "value": round(qps, 2),
        "unit": (
            f"qps e2e-HTTP (D={DOCS}, n={len(run_qs)}, conc={CONCURRENCY}, ok={n_ok}, "
            f"p50={p50:.1f}ms, p99={p99:.1f}ms, ndcg@10={ndcg:.4f} vs exact-f64-oracle, "
            f"cpu-baseline=single-core-host)"
        ),
        "vs_baseline": round(qps / cpu_qps, 2) if cpu_qps else 0.0,
    }))


if __name__ == "__main__":
    main()
