#!/usr/bin/env python
"""Shard-level interleaved A/B of FUSED_SIGNALS: search_initial_many(batch=32)
+ page materialization (top-10/query), direct calls, no HTTP pipeline."""
import json
import os
import sys
import time

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), ".."))
import numpy as np

CACHE = os.environ.get("BENCH_CACHE", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache"))
DOCS = int(os.environ.get("AB_DOCS", 10_000_000))
B = int(os.environ.get("AB_BATCH", 32))
ITERS = int(os.environ.get("AB_ITERS", 12))

import jax
import os as _os
if _os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', _os.environ['JAX_PLATFORMS'])
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from stract_tpu.bench_corpus import ensure_corpus, sample_queries
from stract_tpu.index import InvertedIndex
from stract_tpu.index import inverted as inv
from stract_tpu.searcher.local import LocalSearcher
from stract_tpu.searcher.query import SearchQuery

path = ensure_corpus(CACHE, DOCS, log=lambda m: print(m, file=sys.stderr))
index = InvertedIndex(path)
local = LocalSearcher(index, shard_id=0)

rng = np.random.default_rng(7)


def run_batch(qs):
    t0 = time.perf_counter()
    res = local.search_initial_many([SearchQuery(query=q) for q in qs])
    t1 = time.perf_counter()
    items = []
    for (cands, _), q in zip(res, qs):
        items.append((SearchQuery(query=q), cands[:10]))
    local.materialize_signals_many(items)
    t2 = time.perf_counter()
    return t1 - t0, t2 - t1


# warm both arms
for arm in (True, False):
    inv.FUSED_SIGNALS = arm
    run_batch(sample_queries(rng, B))
    print(f"warmed fused={arm}", file=sys.stderr, flush=True)

res = {True: {"p1": [], "p2": []}, False: {"p1": [], "p2": []}}
for it in range(ITERS):
    qs = sample_queries(rng, B)
    for arm in (True, False):
        inv.FUSED_SIGNALS = arm
        p1, p2 = run_batch(qs)  # same queries both arms
        res[arm]["p1"].append(p1)
        res[arm]["p2"].append(p2)
        print(f"iter {it} fused={arm}: pass1+B {p1*1000:.0f}ms "
              f"materialize {p2*1000:.0f}ms", file=sys.stderr, flush=True)

out = {}
for arm in (True, False):
    k = "fused" if arm else "plain"
    out[k + "_p1_ms"] = round(float(np.median(res[arm]["p1"])) * 1000, 1)
    out[k + "_mat_ms"] = round(float(np.median(res[arm]["p2"])) * 1000, 1)
    out[k + "_total_ms"] = round(float(np.median(
        np.array(res[arm]["p1"]) + np.array(res[arm]["p2"]))) * 1000, 1)
print(json.dumps(out))
