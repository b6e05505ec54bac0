"""Pallas kernels vs their XLA twins (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stract_tpu.ops import hll_ops
from stract_tpu.ops.pallas_kernels import fused_contrib_pallas, hll_estimate_pallas
from stract_tpu.ranking import bm25_math as BM


def test_fused_contrib_matches_xla(rng):
    P, L = 8, 128
    tfs = rng.integers(0, 10, (P, L)).astype(np.float32)
    flen = rng.integers(1, 500, (P, L)).astype(np.float32)
    avg = rng.uniform(10, 300, P).astype(np.float32)
    w1 = rng.uniform(0, 1, P).astype(np.float32)
    w2 = rng.uniform(0, 1, P).astype(np.float32)
    cf = rng.uniform(0.5, 4, P).astype(np.float32)
    wp = rng.uniform(0, 0.1, P).astype(np.float32)

    out = np.asarray(fused_contrib_pallas(
        jnp.asarray(tfs), jnp.asarray(flen), jnp.asarray(avg),
        jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(cf), jnp.asarray(wp),
    ))
    norm = BM.K1 * (1 - BM.B + BM.B * flen / avg[:, None])
    tff = tfs * (BM.K1 + 1) / (tfs + norm)
    stf = tfs * cf[:, None]
    tfff = stf * (BM.K1 + 1) / (stf + norm)
    expected = w1[:, None] * tff + w2[:, None] * tfff + wp[:, None] * (tfs > 0)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_hll_estimate_matches_host(rng):
    N, m = 300, 64
    regs = rng.integers(0, 20, (N, m)).astype(np.uint8)
    regs[0] = 0  # all-zero row → linear counting path
    out = np.asarray(hll_estimate_pallas(jnp.asarray(regs), tile=128))
    expected = np.asarray(hll_ops.estimate_sizes(jnp.asarray(regs)))
    np.testing.assert_allclose(out, expected, rtol=1e-4)
