"""Sharded training for the cross-encoder reranker (the framework's flagship
neural model). The reference trains its rankers offline in Python
(ltr/lambdamart.py; encoder checkpoints are imported) — here training is a
first-class pjit program over a (dp, tp, sp, ep) mesh:

  dp — batch, tp — megatron attention/MLP splits, sp — activation sequence
  axis, ep — experts of the optional MoE FFN (models/bert.py MoEMlp).

Loss: pairwise logistic ranking loss over (relevant, irrelevant) pair batches —
what a click-log fine-tune of the cross-encoder needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from ..models.bert import BertConfig, BertForSequenceScore
from .mesh import rules_for_mesh, shard_params


def ranking_loss(scores_pos, scores_neg):
    """Pairwise logistic loss: -log σ(s+ − s−)."""
    return jnp.mean(jax.nn.softplus(-(scores_pos - scores_neg)))


def make_train_state(cfg: BertConfig, mesh, learning_rate: float = 1e-4, seed: int = 0,
                     num_experts: int = 0):
    """Initialize params on the mesh with proper shardings. Returns
    (model, params, opt_state, opt, param_shardings)."""
    model = BertForSequenceScore(cfg, num_experts=num_experts)
    opt = optax.adamw(learning_rate)
    rules = rules_for_mesh(mesh)

    def init_fn(rng):
        dummy = jnp.zeros((1, 8), dtype=jnp.int32)
        with nn.logical_axis_rules(rules):
            return model.init(rng, dummy, jnp.ones((1, 8), jnp.int32))

    abstract = jax.eval_shape(init_fn, jax.random.PRNGKey(seed))
    shardings = shard_params(abstract, mesh)
    params = jax.jit(init_fn, out_shardings=shardings)(jax.random.PRNGKey(seed))
    params = nn.meta.unbox(params)
    shardings = nn.meta.unbox(shardings)
    opt_state = jax.jit(opt.init)(params)
    return model, params, opt_state, opt, shardings


def train_step(model, opt, params, opt_state, batch, rules):
    """One pairwise-ranking training step. batch: dict with pos_ids/pos_mask/
    neg_ids/neg_mask int32[B, T]. Shard batch over 'dp' before calling."""

    def loss_fn(p):
        # token-type ids MUST match serving (cross_encoder.py score passes
        # them): a model trained without segment-B type embeddings scores
        # (query, text) pairs with untrained embeddings at serving time —
        # measured to INVERT pos/neg ordering on held-out pairs
        with nn.logical_axis_rules(rules):
            s_pos = model.apply(p, batch["pos_ids"], batch["pos_mask"], batch.get("pos_types"))
            s_neg = model.apply(p, batch["neg_ids"], batch["neg_mask"], batch.get("neg_types"))
        return ranking_loss(s_pos, s_neg)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_jitted_distill_step(model, opt, mesh, param_shardings, alpha: float = 0.5):
    """Pairwise loss + teacher regression: batch carries t_pos/t_neg f32[B]
    target scores (a trained dual encoder's scaled cosines — see
    entrypoint/train_encoders.py train_cross_encoder distill mode). The dense
    per-example regression is what makes a small synthetic-triple pool
    generalize: ground-truth pairwise alone memorizes the pool (measured:
    held-out pos>neg 0.52-0.58 across recipes) while the teacher's scores
    carry the full overlap-ranking function it learned contrastively."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    tok_sharding = NamedSharding(mesh, P("dp", None))
    vec_sharding = NamedSharding(mesh, P("dp"))
    rules = rules_for_mesh(mesh)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        batch = {k: jax.lax.with_sharding_constraint(
                     v, vec_sharding if v.ndim == 1 else tok_sharding)
                 for k, v in batch.items()}

        def loss_fn(p):
            with nn.logical_axis_rules(rules):
                s_pos = model.apply(p, batch["pos_ids"], batch["pos_mask"], batch.get("pos_types"))
                s_neg = model.apply(p, batch["neg_ids"], batch["neg_mask"], batch.get("neg_types"))
            pair = ranking_loss(s_pos, s_neg)
            reg = jnp.mean((s_pos - batch["t_pos"]) ** 2) + jnp.mean((s_neg - batch["t_neg"]) ** 2)
            return pair + alpha * reg

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def make_jitted_train_step(model, opt, mesh, param_shardings):
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = NamedSharding(mesh, P("dp", None))
    rules = rules_for_mesh(mesh)

    @functools.partial(
        jax.jit,
        donate_argnums=(0, 1),
    )
    def step(params, opt_state, batch):
        batch = {k: jax.lax.with_sharding_constraint(v, batch_sharding) for k, v in batch.items()}
        return train_step(model, opt, params, opt_state, batch, rules)

    return step


# ---- checkpointing (orbax) ---------------------------------------------------

def save_checkpoint(path: str, params, opt_state, step: int = 0) -> None:
    """Persist train state (orbax; role of segment meta.json commits — the
    reference has no training checkpoints at all, SURVEY §5)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    import os

    ckpt.save(os.path.abspath(f"{path}/step_{step}"),
              {"params": params, "opt_state": opt_state})
    ckpt.wait_until_finished()


def restore_checkpoint(path: str, params_template, opt_state_template, step: int = 0):
    import orbax.checkpoint as ocp
    import os

    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(
        os.path.abspath(f"{path}/step_{step}"),
        {"params": params_template, "opt_state": opt_state_template},
    )
    return restored["params"], restored["opt_state"]
