"""Device HyperLogLog register ops for HyperBall centrality.

The reference merges HLL counters edge-by-edge on CPU (webgraph/centrality/
harmonic.rs:292 in-process; ampc/ over a DHT for the distributed variant).
Here the whole graph's sketches are ONE [N, m] register matrix in HBM and an
iteration is gather + scatter-max over the edge list — the VPU does millions of
register merges per microsecond, and the ICI all-gather replaces the DHT for
sharded graphs (centrality.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.hashing import _MASK64


def init_registers(n: int, precision: int = 6, seed: int = 0) -> np.ndarray:
    """Initial HLL registers: sketch of {node} per node → uint8[N, m].
    Vectorized numpy twin of utils.hyperloglog.HyperLogLog.add_u64."""
    m = 1 << precision
    ids = np.arange(n, dtype=np.uint64) + np.uint64(seed)
    # splitmix64, vectorized
    x = (ids + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK64)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK64)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_MASK64)
    h = (z ^ (z >> np.uint64(31))) & np.uint64(_MASK64)

    idx = (h >> np.uint64(64 - precision)).astype(np.int64)
    rest = (h << np.uint64(precision)) & np.uint64(_MASK64)
    # rank = leading zeros of `rest` + 1 (capped): count via 64-step halving
    rank = np.zeros(n, dtype=np.uint8)
    zero = rest == 0
    lz = np.zeros(n, dtype=np.int64)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz += np.where(mask, shift, 0)
        cur = np.where(mask, cur << np.uint64(shift), cur)
    rank = np.where(zero, 64 - precision + 1, lz + 1).astype(np.uint8)

    regs = np.zeros((n, m), dtype=np.uint8)
    regs[np.arange(n), idx] = rank
    return regs


@jax.jit
def merge_iteration(regs, edge_from, edge_to):
    """One HyperBall round: ball(to) ∪= ball(from) for every edge, as a
    gather + scatter-max. regs uint8[N, m]; edges i32[E].

    A degree-bucketed variant (dense per-class max-reductions + unique-index
    scatters) was measured on hardware and REJECTED: 3.11 s/round vs 0.53 s
    for this scatter — with uint8[N, 64] rows every random row access touches
    a full (32, 128) tile either way, so bucketing only added overhead.
    docs/perf_notes.md has the numbers."""
    gathered = regs[edge_from]
    return regs.at[edge_to].max(gathered)


@jax.jit
def estimate_sizes(regs):
    """Vectorized HLL estimate f32[N] (same formula as utils.hyperloglog)."""
    n, m = regs.shape
    mf = jnp.float32(m)
    alpha = jnp.float32(
        0.673 if m == 16 else 0.697 if m == 32 else 0.709 if m == 64 else 0.7213 / (1 + 1.079 / m)
    )
    r = regs.astype(jnp.float32)
    est = alpha * mf * mf / jnp.sum(jnp.exp2(-r), axis=1)
    zeros = jnp.sum((regs == 0).astype(jnp.float32), axis=1)
    lc = mf * jnp.log(mf / jnp.maximum(zeros, 1.0))
    use_lc = (est <= 2.5 * mf) & (zeros > 0)
    return jnp.where(use_lc, lc, est)
