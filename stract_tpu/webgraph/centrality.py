"""Harmonic centrality via HyperBall on TPU (role of reference
webgraph/centrality/harmonic.rs:215-292 in-process HyperBall, and the
AMPC-distributed variant entrypoint/ampc/harmonic_centrality/).

    c(v) = Σ_r (|ball_r(v)| − |ball_{r−1}(v)|) / r
    ball_r(v) = {v} ∪ ⋃_{(w,v)∈E} ball_{r−1}(w)   (nodes that can reach v)

Device kernel: all sketches are one uint8[N, m] register matrix; a round is a
single gather + scatter-max over the edge list (ops/hll_ops.py), followed by a
vectorized size estimate. The per-node Σ/r accumulation uses Kahan-compensated
f64 on host (the reference uses KahanSum, kahan_sum.rs).

Sharded variant (replaces AMPC+DHT inside one TPU slice): nodes are partitioned
over mesh devices; each round all-gathers registers over ICI and merges only
locally-owned targets — the HLL register max is commutative/idempotent, which is
exactly why the reference could run it over a DHT and we can run it as a
collective."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import hll_ops
from .store import Webgraph

DEFAULT_PRECISION = 6  # 64 registers, like the reference's HyperLogLog<64>


def harmonic_centrality(
    graph: Webgraph,
    precision: int = DEFAULT_PRECISION,
    max_rounds: int = 64,
) -> dict[str, float]:
    """→ {node_name: centrality}, normalized by (N-1) like the reference."""
    n = graph.num_nodes
    if n == 0:
        return {}
    # edges (w → v): merge ball(w) into ball(v). Build from forward CSR.
    out_off = np.asarray(graph.out_offsets, dtype=np.int64)
    sources = np.repeat(np.arange(n, dtype=np.int32), np.diff(out_off).astype(np.int64))
    targets = np.asarray(graph.out_targets, dtype=np.int32)

    centrality = _hyperball(n, sources, targets, precision, max_rounds)
    norm = max(n - 1, 1)
    return {graph.name_of(i): float(centrality[i]) / norm for i in range(n)}


def _hyperball(n, edge_from, edge_to, precision, max_rounds) -> np.ndarray:
    regs = jnp.asarray(hll_ops.init_registers(n, precision))
    ef = jnp.asarray(edge_from, dtype=jnp.int32)
    et = jnp.asarray(edge_to, dtype=jnp.int32)

    sizes = np.asarray(hll_ops.estimate_sizes(regs), dtype=np.float64)
    # Kahan-compensated accumulation, VECTORIZED over all nodes per round (a
    # per-node Python loop dominated at web-graph scale)
    acc = np.zeros(n, dtype=np.float64)
    comp = np.zeros(n, dtype=np.float64)
    for r in range(1, max_rounds + 1):
        new_regs = hll_ops.merge_iteration(regs, ef, et)
        if bool(jnp.all(new_regs == regs)):
            break
        regs = new_regs
        new_sizes = np.asarray(hll_ops.estimate_sizes(regs), dtype=np.float64)
        delta = (new_sizes - sizes) / r
        y = delta - comp
        t = acc + y
        comp = (t - acc) - y
        acc = t
        sizes = new_sizes
    return acc


def harmonic_centrality_sharded(
    graph: Webgraph,
    mesh,
    precision: int = DEFAULT_PRECISION,
    max_rounds: int = 64,
) -> dict[str, float]:
    """Multi-device HyperBall over a 1-D mesh axis 'x' with O(N/d) per-device
    memory: node-sharded registers + a RING exchange (the TPU-native
    replacement for the reference's AMPC DHT upsert round,
    ampc/coordinator.rs:151-213).

    Each round rotates the round-start register shards once around the ring
    (jax.lax.ppermute over ICI). At ring step k, device d holds the shard of
    device (d+k) mod n_dev and applies exactly its local edges whose SOURCE
    lives in that shard (edges are pre-bucketed host-side by (target owner,
    owner distance)). Per-device HBM is 3 register shards (local, rotating
    buffer, output) = O(N/d · m) — the earlier all-gather design materialized
    the full [N, m] matrix on every device, so sharding bought compute but
    zero memory, which defeats sharding a web-scale graph. Gathers still read
    only round-start registers (the rotating buffer is never written), so
    Jacobi semantics — and therefore parity with the single-device kernel —
    are preserved. Total bytes moved per round equal one all-gather; the ring
    just never holds more than one remote shard at a time.
    """
    n = graph.num_nodes
    if n == 0:
        return {}
    out_off = np.asarray(graph.out_offsets, dtype=np.int64)
    sources = np.repeat(np.arange(n, dtype=np.int32), np.diff(out_off).astype(np.int64))
    targets = np.asarray(graph.out_targets, dtype=np.int32)
    acc = _hyperball_sharded(n, sources, targets, mesh, precision, max_rounds)
    norm = max(n - 1, 1)
    return {graph.name_of(i): float(acc[i]) / norm for i in range(n)}


def _hyperball_sharded(n, sources, targets, mesh, precision=DEFAULT_PRECISION,
                       max_rounds=64, timings: list | None = None) -> np.ndarray:
    """Raw ring-exchange HyperBall → unnormalized centrality f64[n].
    `timings`, when given, receives per-round wall seconds (bench hook)."""
    import time as _time

    from jax.sharding import PartitionSpec as P

    n_dev = mesh.devices.size
    pad_n = ((n + n_dev - 1) // n_dev) * n_dev

    # bucket edges by (owner of TARGET, ring distance to owner of SOURCE):
    # the scatter side must be local, and the gather side must match the
    # shard in the rotating buffer at ring step k
    S = pad_n // n_dev
    tgt_owner = targets // S
    dist = ((sources // S) - tgt_owner) % n_dev
    key = tgt_owner * n_dev + dist
    order = np.argsort(key, kind="stable")
    sources, targets, key = sources[order], targets[order], key[order]
    counts = np.bincount(key, minlength=n_dev * n_dev)
    max_e = max(int(counts.max()), 1)
    ef = np.zeros((n_dev, n_dev, max_e), dtype=np.int32)  # source LOCAL row
    # padding targets point past the shard (row S): the scatter drops them
    # (mode='drop') — cheaper than masking the gathered [max_e, m] values
    et = np.full((n_dev, n_dev, max_e), S, dtype=np.int32)  # target LOCAL row
    pos = 0
    for d in range(n_dev):
        for k in range(n_dev):
            c = counts[d * n_dev + k]
            ef[d, k, :c] = sources[pos : pos + c] % S
            et[d, k, :c] = targets[pos : pos + c] - d * S
            pos += c

    regs0 = hll_ops.init_registers(n, precision)
    regs0 = np.concatenate([regs0, np.zeros((pad_n - n, regs0.shape[1]), np.uint8)])
    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def round_fn(local_regs, lef, let):
        lef, let = lef[0], let[0]  # [n_dev, max_e]

        def step(k, carry):
            buf, out = carry  # buf: round-start shard of device (d+k) % n_dev
            out = out.at[let[k]].max(buf[lef[k]], mode="drop")
            buf = jax.lax.ppermute(buf, "x", perm)
            return buf, out

        _, out = jax.lax.fori_loop(0, n_dev, step, (local_regs, local_regs))
        return out

    round_jit = jax.jit(jax.shard_map(
        round_fn,
        mesh=mesh,
        in_specs=(P("x", None), P("x", None, None), P("x", None, None)),
        out_specs=P("x", None),
    ))
    sizes_jit = jax.jit(hll_ops.estimate_sizes)

    regs = jax.device_put(jnp.asarray(regs0))
    ef_j, et_j = jnp.asarray(ef), jnp.asarray(et)

    sizes = np.asarray(sizes_jit(regs), dtype=np.float64)[:n]
    acc = np.zeros(n, dtype=np.float64)
    comp = np.zeros(n, dtype=np.float64)
    for r in range(1, max_rounds + 1):
        t0 = _time.perf_counter()
        new_regs = round_jit(regs, ef_j, et_j)
        if bool(jnp.all(new_regs == regs)):
            break
        regs = new_regs
        new_sizes = np.asarray(sizes_jit(regs), dtype=np.float64)[:n]
        if timings is not None:
            timings.append(_time.perf_counter() - t0)
        delta = (new_sizes - sizes) / r
        # kahan step, vectorized
        y = delta - comp
        t = acc + y
        comp = (t - acc) - y
        acc = t
        sizes = new_sizes
    return acc


def exact_harmonic_centrality(graph: Webgraph) -> dict[str, float]:
    """Exact O(N·E) BFS oracle for tests (role of the reference's exact tests,
    webgraph/centrality/harmonic.rs tests)."""
    n = graph.num_nodes
    out_off = np.asarray(graph.out_offsets, dtype=np.int64)
    tgt = np.asarray(graph.out_targets, dtype=np.int64)
    adj = [tgt[out_off[i] : out_off[i + 1]] for i in range(n)]
    out = np.zeros(n)
    for src in range(n):
        # BFS forward from src; contributes 1/d to each reached node
        dist = -np.ones(n, dtype=np.int64)
        dist[src] = 0
        frontier = [src]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if dist[v] < 0:
                        dist[v] = d
                        nxt.append(int(v))
                        out[v] += 1.0 / d
            frontier = nxt
    norm = max(n - 1, 1)
    return {graph.name_of(i): out[i] / norm for i in range(n)}


def centrality_ranks(centrality: dict[str, float]) -> dict[str, int]:
    """Dense ranks, best = 0 (feeds the HostCentralityRank column)."""
    ordered = sorted(centrality.items(), key=lambda kv: -kv[1])
    ranks = {}
    prev_val, prev_rank = None, -1
    for i, (name, val) in enumerate(ordered):
        if val != prev_val:
            prev_rank = i
            prev_val = val
        ranks[name] = prev_rank
    return ranks


def store_harmonic(centrality: dict[str, float], path: str) -> None:
    """Persist centrality + ranks as a speedy-kv style store (role of
    centrality/mod.rs:206 store_harmonic)."""
    from ..kv import Db

    db = Db.open(path)
    ranks = centrality_ranks(centrality)
    for name, val in centrality.items():
        db.insert(name.encode(), {"centrality": val, "rank": ranks[name]})
    db.commit()
