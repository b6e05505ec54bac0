"""BERT in flax — the neural reranker backbone.

Role of the reference's hand-written candle BERT (crates/core/src/models/bert.rs,
567 LoC: embeddings + encoder + pooler, loaded from HF safetensors). Rewritten
TPU-first:

  - bfloat16 params/compute by default, f32 accumulations on the MXU
    (`preferred_element_type`), f32 layernorm.
  - every weight matrix is annotated with logical mesh axes so pjit shards it:
    attention QKV/out and MLP in/out split over the 'tp' axis, activations over
    'dp' (batch) and optionally 'sp' (sequence), following the standard
    megatron-style layout. Single-device use just ignores the annotations.
  - static shapes: tokenized batches are padded to fixed (B, T) buckets
    (T=128 cross-encoder / 256 dual-encoder, reference cross_encoder.rs:30,
    dual_encoder.rs:33).

Loads HF `bert-*` / sentence-transformers safetensors checkpoints via
`load_hf_safetensors`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from flax.linen import partitioning as nn_partitioning

param_with_axes = nn_partitioning.param_with_axes


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: object = jnp.bfloat16
    # cross-encoder score readout: "cls" (reference cross_encoder.rs:35-90
    # parity) or "mean" (masked mean pool — when the trunk is warm-started
    # from a mean-pooled dual encoder, a CLS head reads a position the donor
    # objective never shaped: measured round 5, the same distill recipe went
    # held-out 0.57 (cls) → trains the head against the trunk instead of with
    # it; mean matches the donor's readout geometry)
    score_pool: str = "cls"

    @classmethod
    def tiny(cls, **kw):
        """4-layer test config."""
        d = dict(vocab_size=1024, hidden_size=64, num_layers=2, num_heads=4,
                 intermediate_size=128, max_position_embeddings=128, type_vocab_size=2)
        d.update(kw)
        return cls(**d)

    @classmethod
    def mini_lm(cls, **kw):
        """MiniLM-L6 (the usual dual-encoder size)."""
        d = dict(hidden_size=384, num_layers=6, num_heads=12, intermediate_size=1536)
        d.update(kw)
        return cls(**d)


def _dense(features, name, kernel_axes, dtype):
    return nn.Dense(
        features,
        name=name,
        dtype=dtype,
        kernel_init=nn.with_logical_partitioning(
            nn.initializers.normal(0.02), kernel_axes
        ),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros, (kernel_axes[-1],)),
    )


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        # QKV projections: kernel [hidden, hidden] sharded (embed, heads*tp)
        q = _dense(c.hidden_size, "query", ("embed", "heads"), c.dtype)(x)
        k = _dense(c.hidden_size, "key", ("embed", "heads"), c.dtype)(x)
        v = _dense(c.hidden_size, "value", ("embed", "heads"), c.dtype)(x)

        B, T, _ = x.shape
        shape = (B, T, c.num_heads, head_dim)
        q, k, v = (t.reshape(shape) for t in (q, k, v))

        scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(head_dim)
        big_neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(mask[:, None, None, :], scores, big_neg)
        probs = jax.nn.softmax(scores, axis=-1).astype(c.dtype)
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32)
        ctx = ctx.astype(c.dtype).reshape(B, T, c.hidden_size)
        out = _dense(c.hidden_size, "out", ("heads", "embed"), c.dtype)(ctx)
        return out


class MoEMlp(nn.Module):
    """Mixture-of-experts FFN (expert-parallel over the 'expert' logical axis).

    Top-1 routing, dense dispatch (every expert computes every token, masked by
    the router's one-hot — exact and simple; capacity-based sparse dispatch is a
    scale optimization, not a semantics change). The reference has no MoE; this
    exists so ranker fine-tunes can scale over the ep mesh axis."""

    cfg: BertConfig
    num_experts: int = 4

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, T, H = x.shape
        logits = _dense(self.num_experts, "router", ("embed", "experts_out"), jnp.float32)(
            x.astype(jnp.float32)
        )
        probs = jax.nn.softmax(logits, axis=-1)
        top = jnp.argmax(probs, axis=-1)                        # [B, T]
        onehot = jax.nn.one_hot(top, self.num_experts, dtype=c.dtype)
        gate = jnp.take_along_axis(probs, top[..., None], axis=-1).astype(c.dtype)

        w_in = self.param(
            "experts_in",
            nn.with_logical_partitioning(nn.initializers.normal(0.02), ("expert", "embed", "mlp")),
            (self.num_experts, H, c.intermediate_size), c.dtype,
        )
        w_out = self.param(
            "experts_out",
            nn.with_logical_partitioning(nn.initializers.normal(0.02), ("expert", "mlp", "embed")),
            (self.num_experts, c.intermediate_size, H), c.dtype,
        )
        # XLA CPU can't emit bf16×bf16→f32 dots (dryrun runs on virtual CPU
        # devices); TPU MXU handles it natively. Pick per backend at trace time.
        if jax.default_backend() in ("tpu",) or "axon" in jax.default_backend():
            pet = {"preferred_element_type": jnp.float32}
            xe, wi, wo = x, w_in, w_out
        else:
            pet = {}
            xe, wi, wo = x.astype(jnp.float32), w_in.astype(jnp.float32), w_out.astype(jnp.float32)
        h = jnp.einsum("bth,ehi->beti", xe, wi, **pet).astype(c.dtype)
        h = jax.nn.gelu(h)
        out = jnp.einsum("beti,eih->beth", h.astype(xe.dtype), wo, **pet).astype(c.dtype)
        out = jnp.einsum("beth,bte->bth", out, onehot)
        return out * gate


class BertLayer(nn.Module):
    cfg: BertConfig
    num_experts: int = 0  # 0 = dense FFN; >0 = MoE (expert-parallel)

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        attn = BertSelfAttention(c, name="attention")(x, mask)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="attn_ln")(x + attn)
        x = x.astype(c.dtype)
        x = nn_partitioning.with_sharding_constraint(x, ("batch", "seq", "embed"))
        if self.num_experts:
            h = MoEMlp(c, self.num_experts, name="moe")(x)
        else:
            h = _dense(c.intermediate_size, "mlp_in", ("embed", "mlp"), c.dtype)(x)
            h = jax.nn.gelu(h)
            h = _dense(c.hidden_size, "mlp_out", ("mlp", "embed"), c.dtype)(h)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="mlp_ln")(x + h)
        return x.astype(c.dtype)


class BertEncoder(nn.Module):
    """Embeddings + transformer stack. Returns final hidden states [B, T, H]."""

    cfg: BertConfig
    num_experts: int = 0

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        c = self.cfg
        B, T = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        word = nn.Embed(
            c.vocab_size, c.hidden_size, dtype=c.dtype, name="word_embeddings",
            embedding_init=nn.with_logical_partitioning(nn.initializers.normal(0.02), ("vocab", "embed")),
        )(input_ids)
        pos_ids = jnp.minimum(jnp.arange(T), c.max_position_embeddings - 1)
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, dtype=c.dtype, name="position_embeddings",
            embedding_init=nn.with_logical_partitioning(nn.initializers.normal(0.02), ("pos", "embed")),
        )(pos_ids[None, :].repeat(B, axis=0))
        typ = nn.Embed(
            c.type_vocab_size, c.hidden_size, dtype=c.dtype, name="token_type_embeddings",
            embedding_init=nn.with_logical_partitioning(nn.initializers.normal(0.02), ("types", "embed")),
        )(token_type_ids)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="emb_ln")(word + pos + typ)
        x = x.astype(c.dtype)
        mask = attention_mask.astype(bool)
        for i in range(c.num_layers):
            x = BertLayer(c, num_experts=self.num_experts, name=f"layer_{i}")(x, mask)
        return x


class BertForEmbedding(nn.Module):
    """Mean-pooled sentence embedding (dual-encoder head — reference
    models/dual_encoder.rs:30-80 mean-pools BERT outputs)."""

    cfg: BertConfig
    normalize: bool = True

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        h = BertEncoder(self.cfg, name="bert")(input_ids, attention_mask, token_type_ids)
        m = attention_mask[:, :, None].astype(h.dtype)
        pooled = (h * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        pooled = pooled.astype(jnp.float32)
        if self.normalize:
            pooled = pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)
        return pooled


class BertForSequenceScore(nn.Module):
    """CLS → linear score head (cross-encoder — reference
    ranking/models/cross_encoder.rs:35-90: BERT + linear classifier).
    num_experts > 0 swaps the FFNs for expert-parallel MoE blocks."""

    cfg: BertConfig
    num_experts: int = 0

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        h = BertEncoder(self.cfg, num_experts=self.num_experts, name="bert")(
            input_ids, attention_mask, token_type_ids
        )
        if self.cfg.score_pool == "mean":
            m = attention_mask[:, :, None].astype(h.dtype)
            pooled = ((h * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)).astype(jnp.float32)
        else:
            pooled = h[:, 0, :].astype(jnp.float32)
        score = nn.Dense(1, dtype=jnp.float32, name="score")(pooled)
        return score[:, 0]


# ---------------------------------------------------------------------------
# HF checkpoint loading

_HF_MAP = {
    "embeddings.word_embeddings.weight": ("bert", "word_embeddings", "embedding"),
    "embeddings.position_embeddings.weight": ("bert", "position_embeddings", "embedding"),
    "embeddings.token_type_embeddings.weight": ("bert", "token_type_embeddings", "embedding"),
    "embeddings.LayerNorm.weight": ("bert", "emb_ln", "scale"),
    "embeddings.LayerNorm.bias": ("bert", "emb_ln", "bias"),
}


def _layer_map(i: int):
    p = f"encoder.layer.{i}."
    l = f"layer_{i}"
    m = {}
    for src, dst in [
        ("attention.self.query", ("attention", "query")),
        ("attention.self.key", ("attention", "key")),
        ("attention.self.value", ("attention", "value")),
        ("attention.output.dense", ("attention", "out")),
        ("intermediate.dense", ("mlp_in",)),
        ("output.dense", ("mlp_out",)),
    ]:
        m[p + src + ".weight"] = ("bert", l, *dst, "kernel")
        m[p + src + ".bias"] = ("bert", l, *dst, "bias")
    m[p + "attention.output.LayerNorm.weight"] = ("bert", l, "attn_ln", "scale")
    m[p + "attention.output.LayerNorm.bias"] = ("bert", l, "attn_ln", "bias")
    m[p + "output.LayerNorm.weight"] = ("bert", l, "mlp_ln", "scale")
    m[p + "output.LayerNorm.bias"] = ("bert", l, "mlp_ln", "bias")
    return m


def load_hf_safetensors(path: str, cfg: BertConfig, head: str | None = None, dtype=jnp.bfloat16):
    """Load an HF bert safetensors file into our param tree. `head`:
    None | 'score' (cross-encoder classifier)."""
    from safetensors import safe_open

    mapping = dict(_HF_MAP)
    for i in range(cfg.num_layers):
        mapping.update(_layer_map(i))

    params: dict = {}

    def put(tree_path, value):
        node = params
        for k in tree_path[:-1]:
            node = node.setdefault(k, {})
        node[tree_path[-1]] = value

    with safe_open(path, framework="np") as f:
        keys = list(f.keys())
        for key in keys:
            k = key
            for prefix in ("bert.", "model."):
                if k.startswith(prefix):
                    k = k[len(prefix):]
            if k in mapping:
                v = f.get_tensor(key)
                dest = mapping[k]
                if dest[-1] == "kernel":
                    v = v.T  # torch Linear stores [out, in]
                ld = jnp.float32 if ("ln" in dest[-2] if len(dest) >= 2 else False) else dtype
                put(dest, jnp.asarray(v, dtype=jnp.float32 if "ln" in str(dest) else dtype))
            elif head == "score" and k in ("classifier.weight", "classifier.bias"):
                v = f.get_tensor(key)
                if k.endswith("weight"):
                    put(("score", "kernel"), jnp.asarray(v.T, dtype=jnp.float32))
                else:
                    put(("score", "bias"), jnp.asarray(v, dtype=jnp.float32))
    return {"params": params}
