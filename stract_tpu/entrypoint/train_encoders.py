"""Encoder training entrypoints — fine-tune the dual- and cross-encoder BERTs
on (query, relevant, irrelevant) triples synthesized from an index's own
documents, then save serving checkpoints (models/store.py) for the config
fields the API coordinator loads (reference config/mod.rs:270-272; the
reference imports offline-trained candle checkpoints — here training is a
first-class TPU program: pjit over the (dp, tp, sp, ep) mesh for the cross
encoder, in-batch-negative contrastive for the dual encoder).

Triple synthesis (a click-log surrogate): query = a few terms sampled from a
document's title/body, positive = that document's title + body window,
negative = a random other document — the standard weak-supervision recipe when
no click logs exist (Inverse Cloze Task family).
"""

from __future__ import annotations

import numpy as np

from ..index import InvertedIndex
from ..index.inverted import DocPointer
from ..models.bert import BertConfig
from ..models.wordpiece import WordPieceTokenizer


def synthesize_triples(index: InvertedIndex, n: int, seed: int = 0,
                       q_terms: tuple = (2, 3), body_window: int = 30) -> list:
    """→ [(query, pos_text, neg_text)] sampled from the index's stored docs."""
    rng = np.random.default_rng(seed)
    sizes = [(ord_, s.num_docs) for ord_, s in enumerate(index.segments) if s.num_docs > 0]
    if not sizes:
        raise ValueError("empty index")
    total = sum(c for _, c in sizes)
    bounds = np.cumsum([c for _, c in sizes])

    def rand_ptr():
        g = int(rng.integers(0, total))
        si = int(np.searchsorted(bounds, g, side="right"))
        ord_, cnt = sizes[si]
        off = g - (int(bounds[si - 1]) if si else 0)
        return DocPointer(ord_, off)

    # draw in rounds with rejection: a negative that CONTAINS the query terms
    # is a false negative — training on those teaches noise, and held-out
    # pairs become unjudgeable (measured: held-out accuracy fell to chance
    # until this filter was added)
    triples = []
    attempts = 0
    while len(triples) < n and attempts < 6 * n:
        m = min(2 * (n - len(triples)), 2 * n)
        attempts += m
        docs = index.retrieve([rand_ptr() for _ in range(2 * m)])
        for i in range(m):
            pos, neg = docs[2 * i], docs[2 * i + 1]
            stored_p = pos.get("stored", pos)
            stored_n = neg.get("stored", neg)
            text = (stored_p.get("title", "") + " " + stored_p.get("clean_text", "")).split()
            if not text:
                continue
            k = int(rng.integers(q_terms[0], q_terms[1] + 1))
            q_words = list(rng.choice(text, size=min(k, len(text)), replace=False))
            body_p = " ".join(stored_p.get("clean_text", "").split()[:body_window])
            body_n = " ".join(stored_n.get("clean_text", "").split()[:body_window])
            pos_text = (stored_p.get("title", "") + " " + body_p).strip()
            neg_text = (stored_n.get("title", "") + " " + body_n).strip()
            neg_words = set(neg_text.split())
            if any(w in neg_words for w in q_words):
                continue
            if pos_text and neg_text and pos_text != neg_text:
                triples.append((" ".join(q_words), pos_text, neg_text))
            if len(triples) >= n:
                break
    return triples


def _fit_tokenizer(triples: list, vocab_size: int) -> WordPieceTokenizer:
    texts = [t for tri in triples for t in tri]
    return WordPieceTokenizer.build(texts, vocab_size=vocab_size)


def corpus_tokenizer(index: InvertedIndex, vocab_size: int = 30522,
                     n_docs: int = 50_000, seed: int = 0) -> WordPieceTokenizer:
    """WordPiece vocab fit on a uniform sample of the index's stored docs —
    the reference ships bert-base-uncased's 30522-entry vocab with its
    MiniLM-class encoders (scripts/export_dual_encoder:6); with no HF hub
    here the production-shape vocab is fit on the corpus itself. A few-hundred
    -triple sample (the trainers' default) covers too little of the term tail
    for a 30k vocab; this samples tens of thousands of docs."""
    rng = np.random.default_rng(seed)
    texts = []
    sizes = [(ord_, s.num_docs) for ord_, s in enumerate(index.segments) if s.num_docs > 0]
    total = sum(c for _, c in sizes)
    bounds = np.cumsum([c for _, c in sizes])
    picks = rng.integers(0, total, size=min(n_docs, total))
    for lo in range(0, len(picks), 4096):
        ptrs = []
        for g in picks[lo : lo + 4096]:
            si = int(np.searchsorted(bounds, int(g), side="right"))
            ord_, _ = sizes[si]
            ptrs.append(DocPointer(ord_, int(g) - (int(bounds[si - 1]) if si else 0)))
        for d in index.retrieve(ptrs):
            s = d.get("stored", d)
            texts.append(s.get("title", "") + " " + s.get("clean_text", ""))
    return WordPieceTokenizer.build(texts, vocab_size=vocab_size)


def train_cross_encoder(index_path: str, out_path: str, steps: int = 120,
                        batch: int = 16, max_len: int = 64, n_triples: int = 512,
                        cfg: BertConfig | None = None, seed: int = 0, lr: float = 3e-4,
                        tokenizer: WordPieceTokenizer | None = None,
                        save_max_len: int | None = None,
                        warm_start: str | None = None, distill: bool = False,
                        teacher_scale: float = 5.0, distill_alpha: float = 0.5,
                        log=print) -> list:
    """Pairwise-ranking fine-tune over the (dp, tp, sp, ep) mesh
    (parallel/train.py), saved as a serving checkpoint. → loss curve.

    warm_start: path to a TRAINED dual-encoder checkpoint whose BERT trunk
    seeds the cross encoder (both heads wrap the same BertEncoder under
    "bert"; only the score head stays random). From-scratch pairwise BCE on a
    6-layer trunk either memorizes or flatlines at 0.693 (measured, round 5:
    held-out 0.375-0.578 across three recipes) — one pos/neg pair per example
    is too sparse a signal to learn representations from. InfoNCE's B-way
    contrast trains the same trunk to 0.97 held-out; starting pairwise from
    those representations converges the head instead of fighting the trunk.

    distill (requires warm_start): add per-example regression toward the dual
    teacher's scaled cosines (parallel/train.py make_jitted_distill_step) —
    warm-start alone still memorized the pool (held-out 0.52, train loss
    0.25); the teacher's dense targets carry its generalizing ranking
    function into the cross architecture, and the pairwise term keeps
    ground-truth ordering the primary objective."""
    import jax
    import jax.numpy as jnp

    from ..parallel.mesh import make_mesh
    from ..parallel.train import (
        make_jitted_distill_step, make_jitted_train_step, make_train_state,
    )
    from ..ranking.models.cross_encoder import CrossEncoderModel

    cfg = cfg or BertConfig.tiny()
    index = InvertedIndex(index_path)
    triples = synthesize_triples(index, n_triples, seed=seed)
    tok = tokenizer or _fit_tokenizer(triples, cfg.vocab_size)

    mesh = make_mesh(len(jax.devices()), axes=("dp", "tp", "sp", "ep"))
    rng = np.random.default_rng(seed)
    losses = []
    teacher = None
    with mesh:
        model, params, opt_state, opt, shardings = make_train_state(cfg, mesh, learning_rate=lr)
        if warm_start:
            from ..models.dual_encoder import DualEncoder

            trunk = DualEncoder.load(warm_start)
            if trunk.cfg.hidden_size != cfg.hidden_size or trunk.cfg.num_layers != cfg.num_layers:
                raise ValueError(f"warm-start shape mismatch: {trunk.cfg} vs {cfg}")
            donor = trunk.params["params"]["bert"]
            params = dict(params)
            params["params"] = dict(params["params"])
            params["params"]["bert"] = jax.device_put(
                jax.tree.map(lambda d, s: jnp.asarray(d, s.dtype), donor,
                             params["params"]["bert"]),
                jax.tree.map(lambda s: s.sharding, params["params"]["bert"]))
            opt_state = jax.jit(opt.init)(params)
            tok = trunk.tokenizer  # trunk embeddings are tied to ITS vocab
            teacher = trunk
        t_pos = t_neg = None
        if distill:
            if teacher is None:
                raise ValueError("distill=True requires warm_start (the teacher)")
            # teacher scores over the whole pool ONCE (chunked batched embeds;
            # per-step teacher forwards would triple every step's device time)
            def _emb(texts):
                out = [teacher.embed(texts[lo : lo + 512])
                       for lo in range(0, len(texts), 512)]
                return np.concatenate(out)

            qe = _emb([t[0] for t in triples])
            t_pos = teacher_scale * (qe * _emb([t[1] for t in triples])).sum(1)
            t_neg = teacher_scale * (qe * _emb([t[2] for t in triples])).sum(1)
            log(f"[cross] teacher targets ready (pos μ {t_pos.mean():.2f}, "
                f"neg μ {t_neg.mean():.2f})")
            step = make_jitted_distill_step(model, opt, mesh, shardings,
                                            alpha=distill_alpha)
        else:
            step = make_jitted_train_step(model, opt, mesh, shardings)
        B = max(batch, int(mesh.shape["dp"]))
        for it in range(steps):
            pick = rng.integers(0, len(triples), B)
            qs = [triples[j][0] for j in pick]
            pos = [(q, triples[j][1]) for q, j in zip(qs, pick)]
            neg = [(q, triples[j][2]) for q, j in zip(qs, pick)]
            p_ids, p_mask, p_types = tok.encode_batch(pos, max_len)
            n_ids, n_mask, n_types = tok.encode_batch(neg, max_len)
            feed = {
                "pos_ids": jnp.asarray(p_ids), "pos_mask": jnp.asarray(p_mask),
                "pos_types": jnp.asarray(p_types),
                "neg_ids": jnp.asarray(n_ids), "neg_mask": jnp.asarray(n_mask),
                "neg_types": jnp.asarray(n_types),
            }
            if distill:
                feed["t_pos"] = jnp.asarray(t_pos[pick], jnp.float32)
                feed["t_neg"] = jnp.asarray(t_neg[pick], jnp.float32)
            params, opt_state, loss = step(params, opt_state, feed)
            losses.append(float(loss))
            if it % 20 == 0:
                log(f"[cross] step {it} loss {losses[-1]:.4f}")
    CrossEncoderModel(cfg, jax.device_get(params), tok,
                      max_len=save_max_len or max_len).save(out_path)
    log(f"[cross] saved → {out_path} (loss {losses[0]:.3f} → {losses[-1]:.3f})")
    return losses


def train_dual_encoder(index_path: str, out_path: str, steps: int = 120,
                       batch: int = 32, max_len: int = 48, n_triples: int = 512,
                       cfg: BertConfig | None = None, seed: int = 0, lr: float = 3e-4,
                       temperature: float = 20.0,
                       tokenizer: WordPieceTokenizer | None = None,
                       save_max_len: int | None = None, log=print) -> list:
    """In-batch-negative contrastive fine-tune (InfoNCE over the B×B sim
    matrix — every other doc in the batch is a negative), saved as a serving
    checkpoint usable by both the indexer (embedding columns) and the recall
    stage. → loss curve."""
    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as nn

    from ..models.bert import BertForEmbedding
    from ..models.dual_encoder import DualEncoder

    cfg = cfg or BertConfig.tiny()
    index = InvertedIndex(index_path)
    triples = synthesize_triples(index, n_triples, seed=seed)
    tok = tokenizer or _fit_tokenizer(triples, cfg.vocab_size)

    model = BertForEmbedding(cfg)
    dummy = jnp.zeros((1, 8), dtype=jnp.int32)
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(seed), dummy, jnp.ones((1, 8), jnp.int32)))
    opt = optax.adamw(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, q_ids, q_mask, d_ids, d_mask):
        def loss_fn(p):
            qe = model.apply(p, q_ids, q_mask)   # [B, H] L2-normalized
            de = model.apply(p, d_ids, d_mask)
            logits = (qe @ de.T) * temperature
            labels = jnp.arange(logits.shape[0])
            return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    losses = []
    for it in range(steps):
        pick = rng.integers(0, len(triples), batch)
        q_ids, q_mask, _ = tok.encode_batch([triples[j][0] for j in pick], max_len)
        d_ids, d_mask, _ = tok.encode_batch([triples[j][1] for j in pick], max_len)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(q_ids), jnp.asarray(q_mask),
                                       jnp.asarray(d_ids), jnp.asarray(d_mask))
        losses.append(float(loss))
        if it % 20 == 0:
            log(f"[dual] step {it} loss {losses[-1]:.4f}")
    DualEncoder(cfg, jax.device_get(params), tok,
                max_len=save_max_len or max_len).save(out_path)
    log(f"[dual] saved → {out_path} (loss {losses[0]:.3f} → {losses[-1]:.3f})")
    return losses
