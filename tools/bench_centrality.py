#!/usr/bin/env python
"""HyperBall harmonic-centrality iteration benchmark (BASELINE.json config 3:
"HyperBall harmonic centrality iterations on host-level webgraph"; the
reference's criterion harness crates/core/benches/harmonic_centrality.rs has no
committed numbers, so this records ours).

Synthesizes a power-law host graph (default 1M nodes / 20M edges — a realistic
host-level webgraph shard), runs HyperBall register-merge rounds on the TPU and
reports rounds/s and edge-merges/s. Writes CENTRALITY.json at the repo root.

    python tools/bench_centrality.py [--nodes 1000000] [--edges 20000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CENTRALITY.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stract_tpu.ops import hll_ops

    rng = np.random.default_rng(0)
    n, m = args.nodes, args.edges
    # power-law in-degree: preferential targets
    targets = (rng.pareto(1.3, m) * n / 50).astype(np.int64) % n
    sources = rng.integers(0, n, m)
    keep = sources != targets
    ef = jnp.asarray(sources[keep].astype(np.int32))
    et = jnp.asarray(targets[keep].astype(np.int32))
    n_edges = int(keep.sum())

    regs = jnp.asarray(hll_ops.init_registers(n, 6))
    # warm + run timed rounds (distinct inputs per round: regs evolve)
    regs = hll_ops.merge_iteration(regs, ef, et)
    np.asarray(regs[:1])
    t0 = time.perf_counter()
    done_rounds = 0
    for r in range(args.rounds):
        new_regs = hll_ops.merge_iteration(regs, ef, et)
        np.asarray(new_regs[:1, :1])  # force completion (tunnel memoization)
        regs = new_regs
        done_rounds += 1
    dt = time.perf_counter() - t0
    # size estimation cost per round (part of a real HyperBall round)
    sizes = hll_ops.estimate_sizes(regs)
    np.asarray(sizes[:1])
    t1 = time.perf_counter()
    sizes = hll_ops.estimate_sizes(regs * 1)
    np.asarray(sizes[:1])
    est_s = time.perf_counter() - t1

    per_round = dt / done_rounds
    artifact = {
        "metric": "hyperball_centrality",
        "nodes": n,
        "edges": n_edges,
        "rounds_per_s": round(1.0 / (per_round + est_s), 3),
        "merge_round_s": round(per_round, 4),
        "estimate_s": round(est_s, 4),
        "edge_merges_per_s": round(n_edges / per_round, 0),
        "registers": "uint8[N, 64]",
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
