#!/usr/bin/env python
"""Steady-state pipeline-on qps: N back-to-back HTTP loads in one process —
round 1 absorbs compiles/page-faults, the last round is the steady state.
Env: BENCH_DOCS, SS_ROUNDS (default 4), SS_QUERIES (128), SS_CONC (64)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

os.environ.setdefault("BENCH_BUDGET_S", "86400")

import bench  # noqa: E402


def main():
    from stract_tpu.bench_corpus import sample_queries

    rounds = int(os.environ.get("SS_ROUNDS", 4))
    n = int(os.environ.get("SS_QUERIES", 128))
    conc = int(os.environ.get("SS_CONC", 64))
    index, local, api, app = bench.build_stack(bench.DOCS)
    print(f"[ss] stack up, pipeline={bench._PH['pipe']}", file=sys.stderr)
    rng = np.random.default_rng(7)  # the bench load seed
    t0 = time.monotonic()
    bench.run_http_load(app, sample_queries(rng, 16), 4)
    bench.run_http_load(app, sample_queries(rng, 48), 8)
    print(f"[ss] warm done {time.monotonic()-t0:.0f}s", file=sys.stderr)
    for r in range(rounds):
        qs = sample_queries(rng, n)
        elapsed, lats, ok = bench.run_http_load(app, qs, conc)
        print(f"[ss] round {r+1}/{rounds}: qps={n/elapsed:.2f} ok={ok} "
              f"p50={float(np.percentile(lats,50)):.0f}ms", file=sys.stderr)


if __name__ == "__main__":
    main()
