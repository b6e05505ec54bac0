#!/usr/bin/env python
"""Retrofit doc-side dual-encoder embeddings onto a cached bench corpus
(VERDICT round-3 item 4: the reference stores per-doc Title/Keyword embeddings
in columnar fields and scores them over all recall candidates —
pipeline/scorers/embedding.rs; schema/numerical_field.rs:132-175).

Embeddings live in standalone files (segments/<s>/embeddings/<name>.bin,
f16[num_docs, dim]) + an embedding_dims entry in meta.json, so the 16 GB
posting/store files are untouched: this tool
  1. trains (or loads) the dual encoder for the corpus
     (.bench_cache/dual_encoder-<docs>, entrypoint/train_encoders.py recipe),
  2. streams every stored title through it in batches,
  3. writes title_embeddings.bin / keyword_embeddings.bin + updates meta.

Env: BENCH_CACHE, EMB_DOCS (default 10M), EMB_BATCH (default 4096),
JAX_PLATFORMS. Idempotent — skips if meta already has embedding_dims."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

CACHE = os.environ.get("BENCH_CACHE", "/root/repo/.bench_cache")
DOCS = int(os.environ.get("EMB_DOCS", 10_000_000))
BATCH = int(os.environ.get("EMB_BATCH", 4096))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from stract_tpu.bench_corpus import ensure_corpus
    from stract_tpu.index import InvertedIndex
    from stract_tpu.models.dual_encoder import DualEncoder

    index_path = ensure_corpus(CACHE, DOCS, log=lambda m: print(m, file=sys.stderr))
    index = InvertedIndex(index_path)
    seg = index.segments[0]
    meta_p = os.path.join(seg.path, "meta.json")
    with open(meta_p) as fh:
        meta = json.load(fh)
    if meta.get("embedding_dims"):
        print(f"already embedded: {meta['embedding_dims']}", file=sys.stderr)
        return

    dual_path = os.path.join(CACHE, f"dual_encoder-{DOCS}")
    if not os.path.exists(os.path.join(dual_path, "config.json")):
        from stract_tpu.entrypoint.train_encoders import train_dual_encoder

        print("[emb] training dual encoder on the corpus", file=sys.stderr)
        train_dual_encoder(index_path, dual_path, steps=200, batch=32,
                           max_len=32, n_triples=1024,
                           log=lambda m: print(m, file=sys.stderr))
    enc = DualEncoder.load(dual_path)
    dim = enc.embedding_dim
    n = seg.num_docs
    emb_dir = os.path.join(seg.path, "embeddings")
    os.makedirs(emb_dir, exist_ok=True)

    # one pass over the row store; keyword embeddings use the stored keywords
    # (title fallback — the reference embeds top key phrases, ours carry the
    # same text surface on this corpus)
    t_path = os.path.join(emb_dir, "title_embeddings.bin.tmp")
    k_path = os.path.join(emb_dir, "keyword_embeddings.bin.tmp")
    nbytes = n * dim * 2
    resume = (os.path.exists(t_path) and os.path.getsize(t_path) == nbytes
              and os.path.exists(k_path) and os.path.getsize(k_path) == nbytes)
    mode = "r+" if resume else "w+"
    t_mm = np.memmap(t_path, dtype=np.float16, mode=mode, shape=(n, dim))
    k_mm = np.memmap(k_path, dtype=np.float16, mode=mode, shape=(n, dim))
    start = 0
    if resume:
        # rows are written sequentially and are L2-normalized (never all-zero),
        # so the written/unwritten boundary is binary-searchable: resume a
        # killed run from the last fully-written batch instead of hours of redo
        def written_upto(mm):
            lo, hi = 0, n  # invariant: rows < lo written, rows >= hi unwritten
            while lo < hi:
                mid = (lo + hi) // 2
                if mm[mid].any():
                    lo = mid + 1
                else:
                    hi = mid
            return lo

        start = (min(written_upto(t_mm), written_upto(k_mm)) // BATCH) * BATCH
        print(f"[emb] resuming at row {start}/{n}", file=sys.stderr, flush=True)
    t0 = time.time()

    def read_batch(lo: int):
        hi = min(lo + BATCH, n)
        titles, keywords = [], []
        for d in range(lo, hi):
            stored = seg.stored_doc(d)
            titles.append(stored.get("title", ""))
            keywords.append(stored.get("keywords", "") or stored.get("title", ""))
        return lo, hi, titles, keywords

    def dispatch(lo: int):
        """Kick the device forward(s) for one batch without blocking — the
        next batch's host work (row-store reads + tokenize) overlaps the
        in-flight device round trip (double buffering; the serial loop left
        the chip idle during every host phase and vice versa)."""
        lo, hi, titles, keywords = read_batch(lo)
        t_fetch = enc.embed_async(titles, out_dtype=np.float16)
        same = all(a == b for a, b in zip(titles, keywords))
        k_fetch = None if same else enc.embed_async(keywords, out_dtype=np.float16)
        return lo, hi, t_fetch, k_fetch

    inflight = dispatch(start) if start < n else None
    for nxt in range(start + BATCH, n + BATCH, BATCH):
        lo, hi, t_fetch, k_fetch = inflight
        nxt_inflight = dispatch(nxt) if nxt < n else None
        t_mm[lo:hi] = t_fetch()
        k_mm[lo:hi] = t_mm[lo:hi] if k_fetch is None else k_fetch()
        inflight = nxt_inflight
        if (lo // BATCH) % 50 == 0:
            done = hi - start
            rate = done / max(time.time() - t0, 1e-9)
            print(f"[emb] {hi}/{n} docs ({rate:.0f} docs/s, "
                  f"eta {(n-hi)/max(rate,1e-9)/60:.0f} min)", file=sys.stderr, flush=True)
    t_mm.flush(); k_mm.flush()
    del t_mm, k_mm
    os.replace(t_path, os.path.join(emb_dir, "title_embeddings.bin"))
    os.replace(k_path, os.path.join(emb_dir, "keyword_embeddings.bin"))
    meta["embedding_dims"] = {"title_embeddings": dim, "keyword_embeddings": dim}
    tmp = meta_p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_p)
    print(json.dumps({"docs": n, "dim": dim, "seconds": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
