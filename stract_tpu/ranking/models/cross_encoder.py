"""Cross-encoder reranker (role of reference ranking/models/cross_encoder.rs:35-90:
BERT + linear classifier over (query, snippet/title) pairs, 128-token truncation,
F16 CPU candle).

TPU-native: bf16 BERT forward under jit with a static (B, 128) bucket; the
precision stage scores ~20 pairs per query (searcher/api/mod.rs:598-614) which
batch into one MXU-friendly forward."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...models.bert import BertConfig, BertForSequenceScore
from ...models.wordpiece import WordPieceTokenizer

MAX_TOKENS = 128  # reference cross_encoder.rs:30


class CrossEncoderModel:
    def __init__(self, cfg: BertConfig, params, tokenizer: WordPieceTokenizer, max_len: int = MAX_TOKENS):
        self.cfg = cfg
        self.model = BertForSequenceScore(cfg)
        self.params = params
        self.tokenizer = tokenizer
        self.max_len = max_len
        self._apply = jax.jit(self.model.apply)

    @classmethod
    def random_init(cls, cfg: BertConfig | None = None, tokenizer: WordPieceTokenizer | None = None, seed: int = 0):
        cfg = cfg or BertConfig.tiny()
        tokenizer = tokenizer or WordPieceTokenizer.build(["the quick brown fox"], vocab_size=cfg.vocab_size)
        model = BertForSequenceScore(cfg)
        dummy = jnp.zeros((1, 8), dtype=jnp.int32)
        params = model.init(jax.random.PRNGKey(seed), dummy, jnp.ones((1, 8), jnp.int32))
        return cls(cfg, params, tokenizer, max_len=min(MAX_TOKENS, cfg.max_position_embeddings))

    def save(self, path: str) -> None:
        from ...models.store import save_encoder

        save_encoder(path, self.cfg, self.params, self.tokenizer, self.max_len, "cross")

    @classmethod
    def load(cls, path: str) -> "CrossEncoderModel":
        """Load from a native checkpoint dir or an HF safetensors dir (the
        config field read here: reference config/mod.rs:270-272)."""
        from ...models.store import load_encoder

        cfg, params, tok, max_len = load_encoder(path, BertForSequenceScore, "cross")
        return cls(cfg, params, tok, max_len=min(MAX_TOKENS, max_len))

    @staticmethod
    def _bucket(n: int) -> int:
        b = 8
        while b < n:
            b *= 2
        return b

    def score(self, query: str, texts: list[str]) -> np.ndarray:
        """Sigmoid relevance of (query, text) pairs → f32[len(texts)]."""
        return self.score_pairs([(query, t) for t in texts])

    def score_pairs(self, pairs: list) -> np.ndarray:
        """Sigmoid relevance of arbitrary (query, text) pairs in ONE bucketed
        forward — the coordinator batches every query's title+snippet pairs of
        a request batch into a single dispatch (a per-query dispatch costs a
        ~25 ms device round trip)."""
        from ...models.wordpiece import trim_to_bucket

        if not pairs:
            return np.zeros(0, dtype=np.float32)
        B = self._bucket(len(pairs))
        padded = list(pairs) + [("", "")] * (B - len(pairs))
        ids, mask, types = trim_to_bucket(
            *self.tokenizer.encode_batch(padded, self.max_len))
        logits = self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types))
        return np.asarray(jax.nn.sigmoid(logits))[: len(pairs)]
