"""Device mesh + sharding rules for the neural rerankers.

The reference has no multi-device ML (candle runs single-threaded CPU inference,
SURVEY.md §2.4); this module is where the TPU build instead scales encoder
training/inference over a jax.sharding.Mesh:

  dp — data parallel (batch)
  tp — tensor parallel (megatron-style: QKV/MLP-in column split, out/MLP-out
       row split → XLA inserts the all-reduces)
  sp — sequence parallel (activation sequence axis between layers)

Logical axis names used by models/bert.py map onto mesh axes via AXIS_RULES.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import flax.linen as nn

AXIS_RULES = (
    ("batch", "dp"),
    ("seq", "sp"),
    ("embed", None),
    ("heads", "tp"),
    ("mlp", "tp"),
    ("expert", "ep"),
    ("experts_out", None),
    ("vocab", None),
    ("pos", None),
    ("types", None),
)


def _factor(n: int, ways: int) -> list[int]:
    """Split n into `ways` factors by distributing its prime factors round-robin
    (8, 3 → [2, 2, 2]; 4, 3 → [2, 2, 1]; 6, 3 → [3, 2, 1])."""
    primes = []
    f, d = n, 2
    while f > 1:
        while f % d == 0:
            primes.append(d)
            f //= d
        d += 1
    dims = [1] * ways
    for i, p in enumerate(sorted(primes, reverse=True)):
        dims[i % ways] *= p
    return dims


def make_mesh(n_devices: int | None = None, axes=("dp", "tp", "sp")) -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    dims = _factor(n, len(axes))
    mesh_devices = np.array(devices).reshape(dims)
    return Mesh(mesh_devices, axis_names=axes)


def rules_for_mesh(mesh: Mesh):
    """AXIS_RULES restricted to axes the mesh actually has (logical axes whose
    target axis is absent replicate)."""
    names = set(mesh.axis_names)
    return tuple((logical, axis if axis in names else None) for logical, axis in AXIS_RULES)


def shard_params(params, mesh: Mesh):
    """Compute NamedShardings for a flax param tree with logical metadata."""
    specs = nn.get_partition_spec(params)
    return nn.logical_to_mesh_sharding(specs, mesh, rules_for_mesh(mesh))
