"""Shortest paths on the webgraph (role of reference webgraph/shortest_path.rs
BFS and the AMPC shortest-path job, ampc/shortest_path/).

Device kernel: edge-parallel Bellman-Ford relaxation — dist[to] =
min(dist[to], dist[from]+1) as one gather + scatter-min per round, fixpoint
detected on device. Also used by approximated harmonic centrality (sampled
sources, entrypoint/centrality.rs:73 build_approx_harmonic)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .store import Webgraph

UNREACHABLE = np.int32(2**30)


@jax.jit
def _relax(dist, edge_from, edge_to):
    cand = dist[edge_from] + 1
    return dist.at[edge_to].min(cand)


def distances(graph: Webgraph, source, max_rounds: int = 128) -> dict[str, int]:
    """BFS distances from `source` following forward edges."""
    n = graph.num_nodes
    src = source if isinstance(source, int) else graph.rank_of(source)
    if src is None or n == 0:
        return {}
    out_off = np.asarray(graph.out_offsets, dtype=np.int64)
    ef = jnp.asarray(np.repeat(np.arange(n, dtype=np.int32), np.diff(out_off)), dtype=jnp.int32)
    et = jnp.asarray(np.asarray(graph.out_targets, dtype=np.int32))

    dist = jnp.full(n, UNREACHABLE, dtype=jnp.int32).at[src].set(0)
    for _ in range(max_rounds):
        new = _relax(dist, ef, et)
        if bool(jnp.all(new == dist)):
            break
        dist = new
    out = np.asarray(dist)
    return {graph.name_of(i): int(out[i]) for i in range(n) if out[i] < UNREACHABLE}


def distances_many(graph: Webgraph, sources: list, max_rounds: int = 128) -> np.ndarray:
    """Multi-source BFS, one device program: dist i32[S, N]."""
    n = graph.num_nodes
    out_off = np.asarray(graph.out_offsets, dtype=np.int64)
    ef = jnp.asarray(np.repeat(np.arange(n, dtype=np.int32), np.diff(out_off)), dtype=jnp.int32)
    et = jnp.asarray(np.asarray(graph.out_targets, dtype=np.int32))
    src = np.array(
        [s if isinstance(s, int) else graph.rank_of(s) for s in sources], dtype=np.int64
    )
    dist = np.full((len(src), n), UNREACHABLE, dtype=np.int32)
    dist[np.arange(len(src)), src] = 0
    dist = jnp.asarray(dist)

    relax = jax.jit(jax.vmap(_relax, in_axes=(0, None, None)))
    for _ in range(max_rounds):
        new = relax(dist, ef, et)
        if bool(jnp.all(new == dist)):
            break
        dist = new
    return np.asarray(dist)


def approx_harmonic_centrality(
    graph: Webgraph, num_samples: int = 256, seed: int = 0
) -> dict[str, float]:
    """Sampled-source approximation (role of reference build_approx_harmonic,
    entrypoint/centrality.rs:73): run BFS from `num_samples` random sources and
    scale contributions by N/num_samples."""
    n = graph.num_nodes
    if n == 0:
        return {}
    rng = np.random.default_rng(seed)
    k = min(num_samples, n)
    sources = rng.choice(n, size=k, replace=False)
    dist = distances_many(graph, [int(s) for s in sources])
    with np.errstate(divide="ignore"):
        contrib = np.where((dist > 0) & (dist < UNREACHABLE), 1.0 / dist, 0.0)
    acc = contrib.sum(axis=0) * (n / k)
    norm = max(n - 1, 1)
    return {graph.name_of(i): float(acc[i]) / norm for i in range(n)}
