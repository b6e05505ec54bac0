"""GPipe-style pipeline parallelism: pipelined forward == sequential forward,
and a (pp, dp) training step converges."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from stract_tpu.parallel.pipeline import (
    init_stage_params,
    make_pipeline_train_step,
    pipeline_apply,
    reference_forward,
)


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, axis_names=("pp", "dp"))


def test_pipeline_matches_sequential(mesh, rng):
    H, FFN, S, M, MB, T = 16, 32, 4, 6, 2, 4
    params = init_stage_params(jax.random.PRNGKey(0), H, FFN, S)
    mbs = jnp.asarray(rng.normal(size=(M, MB, T, H)).astype(np.float32))

    from jax.sharding import PartitionSpec as P

    spec = {k: P("pp", None, None) for k in params}
    piped = jax.jit(
        jax.shard_map(
            pipeline_apply, mesh=mesh,
            in_specs=(spec, P(None, None, None, None)),
            out_specs=P(None, None, None, None),
        )
    )(params, mbs)
    seq = reference_forward(params, mbs)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(seq), rtol=2e-4, atol=2e-5)


def test_pipeline_training_converges(mesh, rng):
    H = 16
    init_fn, step_fn = make_pipeline_train_step(mesh, hidden=H, ffn=32, learning_rate=5e-2)
    params = init_fn(jax.random.PRNGKey(1))
    M, MB, T = 4, 4, 4
    mbs = jnp.asarray(rng.normal(size=(M, MB, T, H)).astype(np.float32))
    targets = jnp.asarray(rng.normal(size=(M, MB)).astype(np.float32))

    with mesh:
        losses = []
        for _ in range(30):
            params, loss = step_fn(params, mbs, targets)
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]
