#!/usr/bin/env python
"""Neural-rerank benchmarks (BASELINE.json configs 4 & 5):

  4. dual-encoder dense rerank: embed 1k candidate texts (MiniLM-L6, bf16,
     256 tokens) + one [1k, H] @ [H] similarity matmul
  5. precision pipeline: cross-encoder scoring of (query, text) pairs at 128
     tokens (MiniLM-L6) + tensorized LambdaMART over the signal matrix

The reference runs both models F16 on CPU via candle, single-thread
(cross_encoder.rs:30,45-47 / dual_encoder.rs:33,39-41). Here they run bf16
under jit on the TPU with static (B, T) buckets. Random weights — identical
FLOPs/layout to trained ones; this measures throughput, not quality.
Writes RERANK.json at the repo root.

    python tools/bench_rerank.py [--candidates 1024] [--pairs 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidates", type=int, default=1024)
    ap.add_argument("--pairs", type=int, default=20,
                    help="cross-encoder pairs/query (reference precision page)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RERANK.json"))
    args = ap.parse_args()

    from stract_tpu.models.bert import BertConfig
    from stract_tpu.models.dual_encoder import DualEncoder
    from stract_tpu.models.wordpiece import WordPieceTokenizer
    from stract_tpu.ranking.models.cross_encoder import CrossEncoderModel
    from stract_tpu.ranking.models.lambdamart import LambdaMART

    rng = np.random.default_rng(0)
    words = [f"word{i}" for i in range(2000)]
    texts = [" ".join(rng.choice(words, 48)) for _ in range(args.candidates)]
    tok = WordPieceTokenizer.build(words, vocab_size=8192)
    cfg = BertConfig.mini_lm(vocab_size=8192)

    # ---- config 4: dual-encoder embed + similarity ---------------------------------
    de = DualEncoder.random_init(cfg, tok)
    emb = de.embed(texts[:8])  # warm compile (8-bucket)
    de.embed(texts)            # warm compile (candidate bucket)
    t0 = time.perf_counter()
    for i in range(args.iters):
        # vary one text so the tunnel cannot memoize the dispatch
        texts[i % len(texts)] += " x"
        emb = de.embed(texts)
    embed_s = (time.perf_counter() - t0) / args.iters
    q = emb[0]
    t0 = time.perf_counter()
    for _ in range(args.iters * 10):
        sims = emb @ q
    sim_s = (time.perf_counter() - t0) / (args.iters * 10)

    # ---- config 5a: cross-encoder (query, text) pairs ------------------------------
    ce = CrossEncoderModel.random_init(
        BertConfig.mini_lm(vocab_size=8192, max_position_embeddings=128), tok)
    ce.score("the query", texts[: args.pairs])  # warm
    t0 = time.perf_counter()
    for i in range(args.iters):
        ce.score(f"the query {i}", texts[: args.pairs])
    ce_s = (time.perf_counter() - t0) / args.iters

    # ---- config 5b: tensorized LambdaMART over signal matrices ---------------------
    from stract_tpu.ranking import signals as S

    # random complete-depth-6 forest, reference-scale (300 trees like a
    # typical LightGBM ranking dump)
    T, depth = 300, 6
    N = 2 ** depth - 1
    feature = rng.integers(0, S.NUM_SIGNALS, (T, N))
    threshold = rng.random((T, N)).astype(np.float32)
    left = np.zeros((T, N), np.int32)
    right = np.zeros((T, N), np.int32)
    for i in range(N):
        l, r = 2 * i + 1, 2 * i + 2
        left[:, i] = l if l < N else -(l - N + 1)
        right[:, i] = r if r < N else -(r - N + 1)
    leaf_value = (rng.random((T, 2 ** depth)).astype(np.float32) - 0.5) * 0.01
    lm = LambdaMART(feature, threshold, left, right, leaf_value, max_depth=depth)
    feats = rng.random((300, S.NUM_SIGNALS)).astype(np.float32)
    lm.predict(feats)  # warm
    t0 = time.perf_counter()
    for i in range(args.iters * 4):
        feats[0, 0] = i
        lm.predict(feats)
    lm_s = (time.perf_counter() - t0) / (args.iters * 4)

    artifact = {
        "metric": "neural_rerank",
        "model": "MiniLM-L6 bf16 (random weights, reference-shape FLOPs)",
        "dual_encoder_embed_1k_s": round(embed_s, 4),
        "dual_encoder_candidates_per_s": round(args.candidates / embed_s, 1),
        "similarity_matmul_1k_s": round(sim_s, 6),
        "cross_encoder_20pair_s": round(ce_s, 4),
        "cross_encoder_pairs_per_s": round(args.pairs / ce_s, 1),
        "lambdamart_300cand_s": round(lm_s, 5),
        "tokens": {"dual_encoder": 256, "cross_encoder": 128},
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
