#!/usr/bin/env python
"""Where does the 294 ms/query go at the reference-capacity operating point?

Serves N warm queries through the real HTTP path (bench.run_http_load) under
cProfile and prints the top host-side cumulative sinks, plus a coarse wall
split (total wall vs host-CPU process time — the difference is device +
tunnel + idle). Read-only: touches no cache, changes no source.

Env: BENCH_DOCS (default 10M), PROF_QUERIES (default 128), PROF_CONC (64).
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

os.environ.setdefault("BENCH_BUDGET_S", "86400")

import bench  # noqa: E402


def main():
    from stract_tpu.bench_corpus import sample_queries

    n = int(os.environ.get("PROF_QUERIES", 128))
    conc = int(os.environ.get("PROF_CONC", 64))
    docs = bench.DOCS
    index, local, api, app = bench.build_stack(docs)
    print(f"[prof] stack up, pipeline={bench._PH['pipe']}", file=sys.stderr)

    rng = np.random.default_rng(23)
    # warm the shape buckets first (not profiled) — conc 8 like bench.main's
    # first warm pass: at conc 64 every request's 5-min aiohttp default
    # timeout starts together while first-touch compiles/page-faults serialize
    # behind the single host core, and the tail requests time out
    t_w = time.monotonic()
    bench.run_http_load(app, sample_queries(rng, 16), 4)
    print(f"[prof] warm-4 done {time.monotonic()-t_w:.0f}s", file=sys.stderr)
    bench.run_http_load(app, sample_queries(rng, 48), 8)
    print(f"[prof] warm-8 done {time.monotonic()-t_w:.0f}s", file=sys.stderr)
    qs = sample_queries(rng, n)

    cpu0, t0 = time.process_time(), time.monotonic()
    prof = cProfile.Profile()
    prof.enable()
    elapsed, lats, ok = bench.run_http_load(app, qs, conc)
    prof.disable()
    cpu1, t1 = time.process_time(), time.monotonic()

    wall, host_cpu = t1 - t0, cpu1 - cpu0
    print(f"[prof] n={n} conc={conc} ok={ok} qps={n/elapsed:.2f} "
          f"wall={wall:.1f}s host_cpu={host_cpu:.1f}s "
          f"({host_cpu/wall*100:.0f}% of wall is host compute; "
          f"rest = device+tunnel+idle)", file=sys.stderr)
    print(f"[prof] per query: wall {wall/n*1000:.0f} ms, "
          f"host {host_cpu/n*1000:.0f} ms", file=sys.stderr)

    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())


if __name__ == "__main__":
    main()
