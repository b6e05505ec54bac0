"""Extractive summarizer (role of reference summarizer.rs:17-35 — dual-encoder
passage scoring: split into passages, score against the query embedding, keep
the best). One batched TPU forward + one matmul."""

from __future__ import annotations

import numpy as np

PASSAGE_WORDS = 64
MAX_PASSAGES = 64


def split_passages(text: str, passage_words: int = PASSAGE_WORDS) -> list[str]:
    words = text.split()
    return [
        " ".join(words[i : i + passage_words])
        for i in range(0, min(len(words), passage_words * MAX_PASSAGES), passage_words)
    ]


class Summarizer:
    def __init__(self, dual_encoder):
        self.encoder = dual_encoder

    def summarize(self, query: str, text: str, top_k: int = 3) -> str:
        passages = split_passages(text)
        if not passages:
            return ""
        if len(passages) <= top_k:
            return " ".join(passages)
        qv = self.encoder.embed([query])[0]
        pv = self.encoder.embed(passages)
        sims = pv @ qv
        best = np.sort(np.argsort(-sims)[:top_k])  # keep original order
        return " ".join(passages[i] for i in best)
