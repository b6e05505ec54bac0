#!/usr/bin/env python
"""e2e serving benchmark with the neural precision stage ENABLED using REAL
trained weights (VERDICT round-2 item 3b: replace RERANK.json's random-weight
FLOPs proxy with a measured pipeline-on serving row).

Trains (or loads from .bench_cache) a cross-encoder on the bench corpus's own
documents via the weak-supervision recipe in entrypoint/train_encoders.py,
then drives the REAL coordinator (ApiSearcher + PrecisionStage) over HTTP and
reports pipeline-off vs pipeline-on qps interleaved. Quality delta for the
full 3-model pipeline is measured separately on a judged corpus
(tools/eval_pipeline.py → EVAL_PIPELINE.json — the bench corpus has no
human-meaningful judgments to grade against).

Merges an `e2e_pipeline` section into RERANK.json.

    python tools/bench_pipeline_on.py [--docs 10000000] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run_http_load(app, queries, concurrency):
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    latencies = []

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

    global _LOOP
    try:
        _LOOP
    except NameError:
        import asyncio as _a

        _LOOP = _a.new_event_loop()
    elapsed, n_ok = _LOOP.run_until_complete(go())
    return elapsed, latencies, n_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--conc", type=int, default=64)
    ap.add_argument("--train-steps", type=int, default=150)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RERANK.json"))
    args = ap.parse_args()

    cache = os.environ.get("BENCH_CACHE", os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), ".bench_cache"))

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(cache, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from stract_tpu.api.server import build_app
    from stract_tpu.bench_corpus import ensure_corpus, sample_queries
    from stract_tpu.index import InvertedIndex
    from stract_tpu.ranking.models.cross_encoder import CrossEncoderModel
    from stract_tpu.ranking.pipeline import PrecisionStage, RankingPipeline
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.batcher import QueryBatcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher

    path = ensure_corpus(cache, args.docs, log=lambda m: print(m, file=sys.stderr))
    index = InvertedIndex(path)

    cross_path = os.path.join(cache, f"cross_encoder-{args.docs}")
    if not os.path.exists(os.path.join(cross_path, "config.json")):
        from stract_tpu.entrypoint.train_encoders import train_cross_encoder

        print("[bench] training cross encoder on bench corpus", file=sys.stderr)
        train_cross_encoder(path, cross_path, steps=args.train_steps, batch=16,
                            max_len=48, n_triples=4 * args.train_steps,
                            log=lambda m: print(m, file=sys.stderr))
    cross = CrossEncoderModel.load(cross_path)

    def app_for(pipeline):
        local = LocalSearcher(index, shard_id=0)
        local.batcher = QueryBatcher(local, max_batch=args.conc, window_ms=4.0)
        api = ApiSearcher(LocalShardedSearcher([local]), pipeline=pipeline)
        return build_app(api, max_concurrency=args.conc)

    apps = {
        "off": app_for(RankingPipeline()),
        "on": app_for(RankingPipeline(
            precision=PrecisionStage(cross_encoder=cross))),
    }

    rng = np.random.default_rng(7)
    for name, app in apps.items():
        run_http_load(app, sample_queries(rng, 128), args.conc)
        print(f"[bench] warmed {name}", file=sys.stderr)

    res = {"off": [], "on": []}
    for r in range(args.rounds):
        qs = sample_queries(rng, args.chunk)
        for name, app in apps.items():
            elapsed, lats, n_ok = run_http_load(app, qs, args.conc)
            qps = len(qs) / elapsed
            res[name].append(qps)
            print(f"[bench] round {r} {name}: {qps:.1f} qps "
                  f"(p50 {np.percentile(lats, 50):.0f}ms, ok {n_ok}/{len(qs)})",
                  file=sys.stderr, flush=True)

    section = {
        "docs": args.docs,
        "concurrency": args.conc,
        "model": "cross-encoder trained on the corpus via weak supervision "
                 "(entrypoint/train_encoders.py), served by PrecisionStage",
        "qps_pipeline_off": round(float(np.median(res["off"])), 1),
        "qps_pipeline_on": round(float(np.median(res["on"])), 1),
        "cost_pct": round(100.0 * (1 - np.median(res["on"]) / np.median(res["off"])), 1),
        "quality_delta_source": "EVAL_PIPELINE.json (judged corpus, full 3-model pipeline)",
    }
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            existing = json.load(fh)
    existing["e2e_pipeline"] = section
    with open(args.out, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps(section))


if __name__ == "__main__":
    main()
