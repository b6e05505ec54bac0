#!/usr/bin/env python
"""Coordinator host-tail profile at bench scale: wall time for phase1 (parse +
shard fan-out incl. device) and phase2 (merge → recall → page → retrieve →
precision) over N batches of B queries via ApiSearcher.search_many, plus a
cProfile top list of phase2.

Interleaved A/B of STRACT_TPU_OBJECT_RESULTS (legacy per-object shard results
vs array-carried CandidateBlocks) when AB=1.

Env: PDOCS (default 1M), PCACHE (default /tmp/prof_cache), PBATCHES, PBATCH,
JAX_PLATFORMS, AB, PROFILE (cProfile dump of phase2).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

CACHE = os.environ.get("PCACHE", "/tmp/prof_cache")
DOCS = int(os.environ.get("PDOCS", 1_000_000))
N_BATCHES = int(os.environ.get("PBATCHES", 8))
BATCH = int(os.environ.get("PBATCH", 32))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # axon sitecustomize force-sets jax_platforms at interpreter start: the
    # env var alone is IGNORED — must set the config explicitly
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from stract_tpu.bench_corpus import ensure_corpus, sample_queries
from stract_tpu.index import InvertedIndex
from stract_tpu.searcher.api import ApiSearcher
from stract_tpu.searcher.distributed import LocalShardedSearcher
from stract_tpu.searcher.local import LocalSearcher
from stract_tpu.searcher.query import SearchQuery


def run_arm(api, batches, label):
    p1 = p2 = 0.0
    for qs in batches:
        sqs = [SearchQuery(query=q) for q in qs]
        t0 = time.perf_counter()
        state = api.search_phase1(sqs)
        t1 = time.perf_counter()
        api.search_phase2(state)
        t2 = time.perf_counter()
        p1 += t1 - t0
        p2 += t2 - t1
    n = sum(len(b) for b in batches)
    print(f"{label}: phase1={p1:.3f}s phase2={p2:.3f}s total={(p1+p2):.3f}s "
          f"({n} queries, {(p1+p2)/n*1000:.2f} ms/q)", flush=True)
    return p1, p2


def main():
    path = ensure_corpus(CACHE, DOCS, log=lambda m: print(m, file=sys.stderr))
    index = InvertedIndex(path)
    api = ApiSearcher(LocalShardedSearcher([LocalSearcher(index, 0)]))
    rng = np.random.default_rng(7)
    qs = sample_queries(rng, N_BATCHES * BATCH + BATCH)
    batches = [qs[i * BATCH : (i + 1) * BATCH] for i in range(N_BATCHES + 1)]
    run_arm(api, batches[:1], "warm")  # compile + caches
    work = batches[1:]

    if os.environ.get("AB"):
        arms = {"block": [], "object": []}
        for r in range(3):
            for name, env in (("block", ""), ("object", "1")):
                os.environ["STRACT_TPU_OBJECT_RESULTS"] = env
                p1, p2 = run_arm(api, work, f"round{r} {name}")
                arms[name].append(p1 + p2)
            os.environ.pop("STRACT_TPU_OBJECT_RESULTS", None)
        for name, vals in arms.items():
            print(f"{name}: median total {np.median(vals):.3f}s over {len(vals)} rounds")
        return

    if os.environ.get("PROFILE"):
        import cProfile
        import pstats

        states = [api.search_phase1([SearchQuery(query=q) for q in b]) for b in work]
        pr = cProfile.Profile()
        pr.enable()
        for st in states:
            api.search_phase2(st)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
    else:
        run_arm(api, work, "measure")


if __name__ == "__main__":
    main()
