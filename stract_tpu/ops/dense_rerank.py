"""Dense embedding rerank on device (BASELINE.json config 4: dual-encoder
dot-product + top-k over candidate sets; role of reference
pipeline/scorers/embedding.rs which dots 300 candidates on CPU).

One [K, H] @ [H] matmul per embedding field + top-k — MXU-bound, batched over
queries when the coordinator processes several at once."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def rerank_topk(cand_emb, query_emb, base_scores, weight: float = 0.01, k: int = 20):
    """cand_emb f32/bf16[K, H] (L2-normalized rows or zero), query_emb f32[H],
    base_scores f32[K] → (top-k indices, combined scores)."""
    sims = jnp.dot(cand_emb.astype(jnp.float32), query_emb.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    norms = jnp.linalg.norm(cand_emb.astype(jnp.float32), axis=1)
    sims = jnp.where(norms > 1e-6, sims / jnp.maximum(norms, 1e-6), 0.0)
    total = base_scores + weight * sims
    scores, idx = jax.lax.top_k(total, k)
    return idx, scores


@functools.partial(jax.jit, static_argnames=("k",))
def rerank_topk_batch(cand_emb, query_emb, base_scores, weight: float = 0.01, k: int = 20):
    """Batched: cand_emb [B, K, H], query_emb [B, H], base [B, K]."""
    return jax.vmap(lambda c, q, b: rerank_topk(c, q, b, weight, k))(
        cand_emb, query_emb, base_scores
    )
