"""Document-partitioned search over a device mesh — the PRODUCT's multi-chip
story (role of reference searcher/distributed.rs:341-404: fan-out to all index
shards + coordinator merge — but INSIDE one TPU slice: each device holds one
segment shard in its HBM, scores locally, and the top-k merge is an
all-gather over ICI instead of sonic RPC).

The cross-host layer (distributed/, gossip + sonic) still fans out between
hosts; this module is the intra-slice fan-out where the shards are devices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops import scoring as O


def stack_segment_arrays(segs: list) -> O.SegmentArrays:
    """Stack per-device SegmentArrays along a new leading shard axis. All
    segments must share bucketed shapes (index/device.py buckets them)."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *segs)


def make_sharded_search(mesh, axis: str = "x", L: int = O.DEFAULT_L, K: int = O.DEFAULT_K,
                        default_static: bool = True):
    """→ jitted fn(stacked_segs, q) → (docs i32[K], shards i32[K], scores f32[K])
    globally ranked across every device's segment. q is replicated; the stacked
    SegmentArrays are sharded one-segment-per-device along `axis`."""

    def local(seg_stk, q):
        seg = jax.tree.map(lambda x: x[0], seg_stk)  # this device's segment
        docs, scores = O.score_candidates(seg, q, L, K, default_static)
        shard = jax.lax.axis_index(axis).astype(jnp.int32)
        gd = jax.lax.all_gather(docs, axis)                      # [n_dev, K]
        gs = jax.lax.all_gather(scores, axis)
        gh = jax.lax.all_gather(jnp.full((K,), shard, jnp.int32), axis)
        top_scores, idx = jax.lax.top_k(gs.reshape(-1), K)
        flat_d = gd.reshape(-1)
        flat_h = gh.reshape(-1)
        return flat_d[idx], flat_h[idx], top_scores

    shmap = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shmap)


def pad_segments_to_common_shapes(dev_segments: list) -> list:
    """Host-side pad so differently-sized segments stack (shards are built
    independently, so their bucketed shapes can differ by one bucket)."""
    arrays = [d.arrays for d in dev_segments]
    maxes = jax.tree.map(lambda *xs: tuple(np.max([np.shape(x) for x in xs], axis=0)), *arrays)

    def pad_leaf(x, shape):
        x = np.asarray(x)
        if x.shape == tuple(shape):
            return x
        pads = [(0, int(t) - int(s)) for s, t in zip(x.shape, shape)]
        return np.pad(x, pads)

    return [jax.tree.map(pad_leaf, a, maxes) for a in arrays]
