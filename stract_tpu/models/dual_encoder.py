"""Dual encoder — mean-pooled BERT sentence embeddings (role of reference
models/dual_encoder.rs:30-80: F16 CPU candle model, 256-token truncation).

TPU-native: bf16 forward under jit with static (B, T) buckets; embeddings are
written into the index's dense embedding columns at indexing time
(entrypoint/indexer) and compared with one matmul in the recall stage
(ranking/pipeline/recall.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bert import BertConfig, BertForEmbedding
from .wordpiece import WordPieceTokenizer

MAX_TOKENS = 256  # reference dual_encoder.rs:33


class DualEncoder:
    def __init__(self, cfg: BertConfig, params, tokenizer: WordPieceTokenizer, max_len: int = MAX_TOKENS):
        self.cfg = cfg
        self.model = BertForEmbedding(cfg)
        self.params = params
        self.tokenizer = tokenizer
        self.max_len = max_len
        self._apply = jax.jit(self.model.apply)

    @classmethod
    def random_init(cls, cfg: BertConfig | None = None, tokenizer: WordPieceTokenizer | None = None, seed: int = 0):
        """Random-weight encoder for tests/benchmarks."""
        cfg = cfg or BertConfig.tiny()
        tokenizer = tokenizer or WordPieceTokenizer.build(["the quick brown fox"], vocab_size=cfg.vocab_size)
        model = BertForEmbedding(cfg)
        dummy = jnp.zeros((1, 8), dtype=jnp.int32)
        params = model.init(jax.random.PRNGKey(seed), dummy, jnp.ones((1, 8), jnp.int32))
        return cls(cfg, params, tokenizer, max_len=min(MAX_TOKENS, cfg.max_position_embeddings))

    def save(self, path: str) -> None:
        from .store import save_encoder

        save_encoder(path, self.cfg, self.params, self.tokenizer, self.max_len, "dual")

    @classmethod
    def load(cls, path: str) -> "DualEncoder":
        """Load from a native checkpoint dir or an HF safetensors dir (the
        config field read here: reference config/mod.rs:270-272)."""
        from .store import load_encoder

        cfg, params, tok, max_len = load_encoder(path, BertForEmbedding, "dual")
        return cls(cfg, params, tok, max_len=min(MAX_TOKENS, max_len))

    @property
    def embedding_dim(self) -> int:
        return self.cfg.hidden_size

    @staticmethod
    def _bucket(n: int) -> int:
        b = 8
        while b < n:
            b *= 2
        return b

    def embed(self, texts: list[str]) -> np.ndarray:
        """→ f32[len(texts), hidden] L2-normalized embeddings."""
        return self.embed_async(texts)()

    def embed_async(self, texts: list[str], out_dtype=None):
        """Dispatch the forward WITHOUT blocking on the result; → a fetch
        closure yielding f32[len(texts), hidden]. jax dispatch is async — the
        coordinator kicks the query-side embed off at the START of phase 1 so
        its device round trip rides behind the pass-1 fan-out instead of
        serializing after it (the round-4 pipeline-on regression was exactly
        these extra sequential round trips). out_dtype: optional device-side
        cast before the fetch (bulk indexing fetches f16 — halves the
        device→host transfer for the 10M embedding-column build)."""
        if not texts:
            return lambda: np.zeros((0, self.cfg.hidden_size),
                                    dtype=out_dtype or np.float32)
        from .wordpiece import trim_to_bucket

        B = self._bucket(len(texts))
        padded = list(texts) + [""] * (B - len(texts))
        ids, mask, types = trim_to_bucket(
            *self.tokenizer.encode_batch(padded, self.max_len))
        out = self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types))
        if out_dtype is not None:
            out = out.astype(out_dtype)  # on-device cast, fetched post-cast
        n = len(texts)
        return lambda: np.asarray(out)[:n]
