"""Pipeline parallelism (pp) for encoder training — GPipe-style microbatch
rotation over `jax.lax.ppermute` inside shard_map.

Each pp-shard owns one transformer stage (stacked stage params sharded on the
leading axis); microbatches enter stage 0, activations rotate rightward one
stage per step, and after M + S − 1 steps every microbatch has crossed all S
stages. The whole schedule is differentiable (ppermute transposes to the
reverse rotation), so jax.grad gives pipelined backprop — combined with 'dp'
for data parallelism in the same mesh.

The reference has no model parallelism at all (CPU candle inference,
SURVEY §2.4); this module is TPU-new, used for scaling ranker fine-tunes
beyond one chip's memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


# ---- functional transformer stage (homogeneous across pp shards) -------------

def init_stage_params(rng, hidden: int, ffn: int, num_stages: int):
    """Stacked stage params [S, ...] — shard axis 0 over 'pp'."""
    ks = jax.random.split(rng, 4)
    scale = 0.02

    def norm(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * scale

    return {
        "attn_qkv": norm(ks[0], (num_stages, hidden, 3 * hidden)),
        "attn_out": norm(ks[1], (num_stages, hidden, hidden)),
        "ffn_in": norm(ks[2], (num_stages, hidden, ffn)),
        "ffn_out": norm(ks[3], (num_stages, ffn, hidden)),
    }


def _apply_stage(p, x):
    """One transformer block with single-head attention (pp demo scale).
    p: per-stage params (no leading S axis). x: [mb, T, H]."""
    h = x.shape[-1]
    qkv = x @ p["attn_qkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    att = jax.nn.softmax(jnp.einsum("bth,bsh->bts", q, k) / np.sqrt(h), axis=-1)
    x = x + jnp.einsum("bts,bsh->bth", att, v) @ p["attn_out"]
    x = x + jax.nn.gelu(x @ p["ffn_in"]) @ p["ffn_out"]
    return x


def pipeline_apply(stage_params, microbatches):
    """Runs inside shard_map on the 'pp' axis. stage_params: this shard's stage
    (leading axis 1), microbatches: [M, mb, T, H] (replicated across pp).
    → [M, mb, T, H] outputs after all S stages."""
    s = jax.lax.axis_index("pp")
    S = jax.lax.psum(1, "pp")
    local = jax.tree.map(lambda a: a[0], stage_params)
    M = microbatches.shape[0]
    steps = M + S - 1

    state = jnp.zeros_like(microbatches[0])
    outputs = jnp.zeros_like(microbatches)
    # the carry becomes device-varying after the first ppermute; mark the
    # initial zeros as varying over 'pp' so scan's carry types match
    try:
        state = jax.lax.pvary(state, ("pp",))
        outputs = jax.lax.pvary(outputs, ("pp",))
    except AttributeError:  # older jax
        pass

    def step_fn(carry, t):
        state, outputs = carry
        # stage 0 ingests microbatch t (while in range)
        mb_idx = jnp.clip(t, 0, M - 1)
        inject = jnp.where(s == 0, 1.0, 0.0)
        x = state * (1.0 - inject) + microbatches[mb_idx] * inject
        y = _apply_stage(local, x)
        # last stage emits microbatch (t - (S - 1))
        out_idx = jnp.clip(t - (S - 1), 0, M - 1)
        is_emit = jnp.logical_and(s == S - 1, t >= S - 1).astype(y.dtype)
        merged = outputs[out_idx] * (1.0 - is_emit) + y * is_emit
        outputs = outputs.at[out_idx].set(merged)
        # rotate activations rightward
        perm = [(i, (i + 1) % S) for i in range(S)]
        state = jax.lax.ppermute(y, "pp", perm)
        return (state, outputs), None

    (state, outputs), _ = jax.lax.scan(step_fn, (state, outputs), jnp.arange(steps))
    # only the last pp shard holds real outputs; broadcast them to all shards
    outputs = jax.lax.psum(jnp.where(s == S - 1, outputs, jnp.zeros_like(outputs)), "pp")
    return outputs


def make_pipeline_train_step(mesh: Mesh, hidden: int = 32, ffn: int = 64,
                             learning_rate: float = 1e-3):
    """→ (init_fn, step_fn): pipelined regression training over mesh axes
    ('pp', 'dp'). Batch [B, T, H] with targets [B] splits into dp shards ×
    microbatches; loss = MSE of mean-pooled output projected to a scalar."""
    S = mesh.shape["pp"]

    def init_fn(rng):
        p = init_stage_params(rng, hidden, ffn, S)
        p["head"] = jax.random.normal(jax.random.fold_in(rng, 7), (hidden,), jnp.float32) * 0.02
        return p

    stage_spec = {
        "attn_qkv": P("pp", None, None),
        "attn_out": P("pp", None, None),
        "ffn_in": P("pp", None, None),
        "ffn_out": P("pp", None, None),
    }

    def forward(params, mbs):
        # shard_map over pp; dp handled by the outer jit sharding of mbs
        body = jax.shard_map(
            pipeline_apply,
            mesh=mesh,
            in_specs=(stage_spec, P(None, "dp", None, None)),
            out_specs=P(None, "dp", None, None),
        )
        stage_params = {k: v for k, v in params.items() if k != "head"}
        out = body(stage_params, mbs)  # [M, mb, T, H]
        pooled = out.mean(axis=2)      # [M, mb, H]
        return pooled @ params["head"]  # [M, mb]

    def loss_fn(params, mbs, targets):
        preds = forward(params, mbs)
        return jnp.mean((preds - targets) ** 2)

    @jax.jit
    def step_fn(params, mbs, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, mbs, targets)
        params = jax.tree.map(lambda p, g: p - learning_rate * g, params, grads)
        return params, loss

    return init_fn, step_fn


def reference_forward(params, mbs):
    """Sequential (non-pipelined) twin for correctness tests."""
    S = params["attn_qkv"].shape[0]
    out = []
    for m in range(mbs.shape[0]):
        x = mbs[m]
        for s in range(S):
            local = {k: v[s] for k, v in params.items() if k != "head"}
            x = _apply_stage(local, x)
        out.append(x)
    return jnp.stack(out)
