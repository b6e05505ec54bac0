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
    ap.add_argument("--sharded", action="store_true",
                    help="also run the ring-exchange sharded HyperBall on the "
                         "available device mesh and assert parity vs single-device")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CENTRALITY.json"))
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
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

    if args.sharded:
        from stract_tpu.webgraph.centrality import _hyperball, _hyperball_sharded

        src_np = sources[keep].astype(np.int32)
        tgt_np = targets[keep].astype(np.int32)
        devs = jax.devices()
        mesh = jax.sharding.Mesh(np.array(devs), ("x",))
        n_dev = len(devs)
        timings: list = []
        t0 = time.perf_counter()
        acc_sh = _hyperball_sharded(n, src_np, tgt_np, mesh, 6,
                                    max_rounds=args.rounds, timings=timings)
        sh_total = time.perf_counter() - t0
        acc_1 = _hyperball(n, src_np, tgt_np, 6, max_rounds=args.rounds)
        parity = bool(np.allclose(acc_sh, acc_1, rtol=1e-6, atol=1e-9))
        pad_n = ((n + n_dev - 1) // n_dev) * n_dev
        S = pad_n // n_dev
        m_regs = 64
        artifact["sharded"] = {
            "devices": n_dev,
            "platform": devs[0].platform,
            "parity_vs_single_device": parity,
            "rounds_run": len(timings),
            "round_s_median": round(float(np.median(timings)), 4) if timings else None,
            "total_s": round(sh_total, 2),
            # ring exchange: 3 register shards per device (local, rotating
            # buffer, output) vs the all-gather design's full matrix + shard
            "per_device_reg_mb": round(3 * S * m_regs / 1e6, 1),
            "allgather_design_reg_mb": round((pad_n + S) * m_regs / 1e6, 1),
        }
        if not parity:
            artifact["sharded"]["max_abs_diff"] = float(np.abs(acc_sh - acc_1).max())
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
