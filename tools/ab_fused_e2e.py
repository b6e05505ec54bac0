#!/usr/bin/env python
"""Interleaved A/B of STRACT_TPU_FUSED_SIGNALS at 10M docs on the real TPU.
Alternates fused-on/fused-off chunks in one process (the flag is a module
global read per search call); reports per-arm median chunk qps."""
import json
import os
import sys
import time

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), ".."))
import numpy as np

os.environ.setdefault("BENCH_CACHE", "/root/repo/.bench_cache")
CACHE = os.environ["BENCH_CACHE"]
DOCS = int(os.environ.get("AB_DOCS", 10_000_000))
CONC = int(os.environ.get("AB_CONC", 64))
CHUNK = int(os.environ.get("AB_CHUNK", 256))
ROUNDS = int(os.environ.get("AB_ROUNDS", 5))

import jax
if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from stract_tpu.api.server import build_app
from stract_tpu.bench_corpus import ensure_corpus, sample_queries
from stract_tpu.index import InvertedIndex
from stract_tpu.index import inverted as inv
from stract_tpu.searcher.api import ApiSearcher
from stract_tpu.searcher.batcher import QueryBatcher
from stract_tpu.searcher.distributed import LocalShardedSearcher
from stract_tpu.searcher.local import LocalSearcher

sys.path.insert(0, os.path.dirname(os.path.abspath("/root/repo/bench.py")))
import importlib.util
spec = importlib.util.spec_from_file_location("benchmod", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
os.environ.setdefault("BENCH_BUDGET_S", "100000")
spec.loader.exec_module(bench) if False else None  # avoid running main-side effects

# inline minimal http loader (copied semantics from bench.run_http_load)
import asyncio
from aiohttp.test_utils import TestClient, TestServer

_LOOP = asyncio.new_event_loop()

def run_http_load(app, queries, concurrency):
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

    elapsed, n_ok = _LOOP.run_until_complete(go())
    return elapsed, latencies, n_ok


path = ensure_corpus(CACHE, DOCS, log=lambda m: print(m, file=sys.stderr))
index = InvertedIndex(path)
local = LocalSearcher(index, shard_id=0)
local.batcher = QueryBatcher(local, max_batch=CONC, window_ms=4.0)
api = ApiSearcher(LocalShardedSearcher([local]))
app = build_app(api, max_concurrency=CONC)

rng = np.random.default_rng(7)
warm = sample_queries(rng, 192)
for arm in (True, False):
    inv.FUSED_SIGNALS = arm
    t0 = time.time()
    run_http_load(app, warm, CONC)
    print(f"warm fused={arm}: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

qs = sample_queries(rng, CHUNK * ROUNDS * 2)
res = {True: [], False: []}
i = 0
for r in range(ROUNDS):
    for arm in (True, False):
        inv.FUSED_SIGNALS = arm
        chunk = qs[i: i + CHUNK]; i += CHUNK
        elapsed, lats, n_ok = run_http_load(app, chunk, CONC)
        qps = len(chunk) / elapsed
        res[arm].append(qps)
        print(f"round {r} fused={arm}: {qps:.1f} qps (ok {n_ok}/{len(chunk)}, "
              f"p50 {np.percentile(lats, 50):.0f}ms)", file=sys.stderr, flush=True)

out = {"docs": DOCS, "conc": CONC, "chunk": CHUNK, "rounds": ROUNDS,
       "fused_qps": res[True], "plain_qps": res[False],
       "fused_median": float(np.median(res[True])),
       "plain_median": float(np.median(res[False]))}
print(json.dumps(out))
