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
