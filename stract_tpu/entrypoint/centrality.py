"""Centrality jobs (role of reference entrypoint/centrality.rs:41,73:
`centrality harmonic` / `approx-harmonic` over a webgraph → kv store with
values + ranks)."""

from __future__ import annotations

from ..webgraph import Webgraph
from ..webgraph.centrality import (
    harmonic_centrality,
    harmonic_centrality_sharded,
    store_harmonic,
)
from ..webgraph.shortest_path import approx_harmonic_centrality


def run_harmonic(graph_path: str, output_path: str, precision: int = 6, mesh=None) -> dict:
    graph = Webgraph(graph_path)
    if mesh is not None and mesh.devices.size > 1:
        c = harmonic_centrality_sharded(graph, mesh, precision=precision)
    else:
        c = harmonic_centrality(graph, precision=precision)
    store_harmonic(c, output_path)
    return c


def run_approx_harmonic(graph_path: str, output_path: str, num_samples: int = 256) -> dict:
    graph = Webgraph(graph_path)
    c = approx_harmonic_centrality(graph, num_samples=num_samples)
    store_harmonic(c, output_path)
    return c


def run_harmonic_nearest_seed(page_graph_path: str, original_centrality_path: str,
                              output_path: str, discount_factor: float = 0.85) -> dict:
    """Page-level centrality propagation (role of reference
    entrypoint/centrality.rs:126 harmonic_nearest_seed): a page keeps its
    original harmonic centrality if one was computed; otherwise it inherits
    its first backlink seed's centrality × discount_factor — the cheap way to
    give freshly-discovered pages a sane prior without recomputing the full
    HyperBall job."""
    from ..kv import Db

    graph = Webgraph(page_graph_path)
    original = Db.open(original_centrality_path)
    out = {}
    for rank in range(graph.num_nodes):
        name = graph.name_of(rank)
        own = original.get(name.encode())
        if own is not None:
            out[name] = own["centrality"] if isinstance(own, dict) else float(own)
            continue
        for src_rank, _flags in graph.backlinks(name)[:1]:
            seed = original.get(graph.name_of(src_rank).encode())
            if seed is not None:
                v = seed["centrality"] if isinstance(seed, dict) else float(seed)
                out[name] = v * discount_factor
    store_harmonic(out, output_path)
    return out
