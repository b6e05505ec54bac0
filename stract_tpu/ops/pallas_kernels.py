"""Pallas TPU kernels for the scoring hot path.

The fused-scoring pipeline (ops/scoring.py) is mostly XLA-friendly (sorts,
gathers, matmuls), but two inner stages benefit from explicit kernels:

  fused_contrib      — the per-entry text-signal formula over [P, L] posting
                       tiles (VPU elementwise; one VMEM pass, no intermediate
                       HBM traffic for the 5 term-weight broadcasts)
  hll_estimate       — HLL size estimation over [N, m] register matrices
                       (per-row exp2 + reductions, tiled over N)

Both have identical-math XLA twins; `use_pallas()` gates them (env
STRACT_TPU_PALLAS=1, default on for TPU backends, interpret mode on CPU so
tests always exercise the kernel code)."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ranking import bm25_math as BM


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",) and "axon" not in jax.default_backend()


def use_pallas() -> bool:
    v = os.environ.get("STRACT_TPU_PALLAS")
    if v is not None:
        return v == "1"
    return False  # default off until profiled faster than the fused XLA path


# ---------------------------------------------------------------------------
# fused per-entry contribution kernel

def _contrib_kernel(tf_ref, flen_ref, avg_ref, w_bm25_ref, w_bm25f_ref, cf_ref, w_pres_ref, out_ref):
    tfs = tf_ref[:]
    flen = flen_ref[:]
    k1 = BM.K1
    b = BM.B
    norm = k1 * (1.0 - b + b * flen / avg_ref[:])
    tf_factor = tfs * (k1 + 1.0) / (tfs + norm)
    stf = tfs * cf_ref[:]
    tf_factor_f = stf * (k1 + 1.0) / (stf + norm)
    present = (tfs > 0).astype(jnp.float32)
    out_ref[:] = (
        w_bm25_ref[:] * tf_factor + w_bm25f_ref[:] * tf_factor_f + w_pres_ref[:] * present
    )


@jax.jit
def fused_contrib_pallas(tfs, flen, avg_len, w_bm25, w_bm25f, bm25f_cf, w_presence):
    """tfs/flen f32[P, L]; per-slot params f32[P] → contributions f32[P, L]."""
    P, L = tfs.shape
    bc = lambda v: jnp.broadcast_to(v[:, None], (P, L))
    return pl.pallas_call(
        _contrib_kernel,
        out_shape=jax.ShapeDtypeStruct((P, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(tfs, flen, bc(avg_len), bc(w_bm25), bc(w_bm25f), bc(bm25f_cf), bc(w_presence))


# ---------------------------------------------------------------------------
# HLL size estimation kernel (tiled over nodes)

def _hll_kernel(regs_ref, out_ref):
    # Mosaic can't cast uint8→f32 directly; hop through int32
    regs = regs_ref[:].astype(jnp.int32).astype(jnp.float32)
    m = regs.shape[1]
    mf = jnp.float32(m)
    alpha = jnp.float32(
        0.673 if m == 16 else 0.697 if m == 32 else 0.709 if m == 64 else 0.7213 / (1 + 1.079 / m)
    )
    denom = jnp.sum(jnp.exp2(-regs), axis=1, keepdims=True)
    est = alpha * mf * mf / denom
    zeros = jnp.sum((regs == 0.0).astype(jnp.float32), axis=1, keepdims=True)
    lc = mf * jnp.log(mf / jnp.maximum(zeros, 1.0))
    use_lc = (est <= 2.5 * mf) & (zeros > 0)
    out_ref[:] = jnp.where(use_lc, lc, est)


@functools.partial(jax.jit, static_argnames=("tile",))
def hll_estimate_pallas(regs, tile: int = 1024):
    """uint8[N, m] registers → f32[N] size estimates, grid-tiled over N."""
    N, m = regs.shape
    pad = (-N) % tile
    if pad:
        regs = jnp.concatenate([regs, jnp.zeros((pad, m), regs.dtype)])
    NP = regs.shape[0]
    out = pl.pallas_call(
        _hll_kernel,
        grid=(NP // tile,),
        in_specs=[pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, 1), jnp.float32),
        interpret=_interpret(),
    )(regs)
    return out[:N, 0]
