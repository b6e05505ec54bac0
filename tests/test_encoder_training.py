"""Encoder checkpoints + weak-supervision training: the serving pipeline must
run with REAL (trained) weights loaded from config paths (role of reference
config/mod.rs:270-272 → searcher/api/mod.rs:598-614)."""

import numpy as np
import pytest

from conftest import make_doc
from stract_tpu.index import InvertedIndex


@pytest.fixture(scope="module")
def corpus_index(tmp_path_factory):
    """Topically-clustered synthetic corpus: docs draw from one of 6 topic
    vocabularies, so query terms correlate with the doc's whole cluster — a
    learnable co-occurrence structure (a uniform-random word soup leaves only
    exact-match attention, which a 2-layer model can't learn from ~500
    triples; measured held-out stayed at chance)."""
    rng = np.random.default_rng(2)
    topics = [[f"t{t}w{i}" for i in range(8)] for t in range(6)]
    idx = InvertedIndex(str(tmp_path_factory.mktemp("enc-corpus")))
    for i in range(120):
        toks = list(rng.choice(topics[i % 6], size=10)) + list(
            rng.choice(["shared", "common"], size=2))
        rng.shuffle(toks)
        idx.insert(make_doc(f"https://e{i}.com/p", " ".join(toks[:3]), " ".join(toks)))
    idx.commit()
    return idx


def test_dual_encoder_save_load_roundtrip(tmp_path):
    from stract_tpu.models.dual_encoder import DualEncoder

    enc = DualEncoder.random_init(seed=3)
    out = enc.embed(["hello world", "quick brown fox"])
    enc.save(str(tmp_path / "dual"))
    enc2 = DualEncoder.load(str(tmp_path / "dual"))
    out2 = enc2.embed(["hello world", "quick brown fox"])
    np.testing.assert_allclose(out2, out, rtol=1e-5, atol=1e-6)
    assert enc2.max_len == enc.max_len


def test_cross_encoder_save_load_roundtrip(tmp_path):
    from stract_tpu.ranking.models.cross_encoder import CrossEncoderModel

    enc = CrossEncoderModel.random_init(seed=4)
    out = enc.score("query text", ["candidate one", "candidate two"])
    enc.save(str(tmp_path / "cross"))
    enc2 = CrossEncoderModel.load(str(tmp_path / "cross"))
    out2 = enc2.score("query text", ["candidate one", "candidate two"])
    np.testing.assert_allclose(out2, out, rtol=1e-5, atol=1e-6)
    # kind mismatch must fail loudly, not load garbage weights
    from stract_tpu.models.dual_encoder import DualEncoder

    with pytest.raises(ValueError):
        DualEncoder.load(str(tmp_path / "cross"))


def test_synthesize_triples(corpus_index):
    from stract_tpu.entrypoint.train_encoders import synthesize_triples

    triples = synthesize_triples(corpus_index, 40, seed=0)
    assert len(triples) >= 30
    for q, pos, neg in triples:
        assert q and pos and neg and pos != neg
        # query terms come from the positive document
        assert any(t in pos.split() for t in q.split())


def test_train_cross_encoder_learns(corpus_index, tmp_path):
    """Short fine-tune must reduce loss and rank positives above negatives on
    fresh triples; the saved checkpoint serves through CrossEncoderModel."""
    from stract_tpu.entrypoint.train_encoders import synthesize_triples, train_cross_encoder
    from stract_tpu.ranking.models.cross_encoder import CrossEncoderModel

    out = str(tmp_path / "cross")
    losses = train_cross_encoder(corpus_index.path, out, steps=120, batch=16,
                                 max_len=32, n_triples=256, seed=1, lr=3e-3,
                                 log=lambda m: None)
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.2, "loss did not decrease"

    model = CrossEncoderModel.load(out)
    held_out = synthesize_triples(corpus_index, 48, seed=99)
    pi, pm, pt = model.tokenizer.encode_batch([(q, p) for q, p, _ in held_out], 32)
    ni, nm, nt = model.tokenizer.encode_batch([(q, n) for q, _, n in held_out], 32)
    import jax.numpy as jnp

    sp = np.asarray(model.model.apply(model.params, jnp.asarray(pi), jnp.asarray(pm), jnp.asarray(pt)))
    sn = np.asarray(model.model.apply(model.params, jnp.asarray(ni), jnp.asarray(nm), jnp.asarray(nt)))
    wins = int((sp > sn).sum())
    assert wins > len(held_out) * 0.65, f"pos>neg only {wins}/{len(held_out)}"


def test_train_dual_encoder_learns(corpus_index, tmp_path):
    from stract_tpu.entrypoint.train_encoders import synthesize_triples, train_dual_encoder
    from stract_tpu.models.dual_encoder import DualEncoder

    out = str(tmp_path / "dual")
    losses = train_dual_encoder(corpus_index.path, out, steps=80, batch=16,
                                max_len=32, n_triples=256, seed=1, lr=1e-3,
                                log=lambda m: None)
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), "loss did not decrease"

    enc = DualEncoder.load(out)
    held_out = synthesize_triples(corpus_index, 24, seed=98)
    qs = enc.embed([t[0] for t in held_out])
    ps = enc.embed([t[1] for t in held_out])
    ns = enc.embed([t[2] for t in held_out])
    pos_sim = (qs * ps).sum(axis=1)
    neg_sim = (qs * ns).sum(axis=1)
    assert (pos_sim > neg_sim).mean() > 0.6


def test_pipeline_serves_trained_encoders(corpus_index, tmp_path):
    """Full 5-stage pipeline with trained weights through ApiSearcher — the
    dead-config-field gap: dual encoder scores recall, cross encoder scores
    precision, and both signals land in the response."""
    from stract_tpu.entrypoint.train_encoders import train_cross_encoder, train_dual_encoder
    from stract_tpu.models.dual_encoder import DualEncoder
    from stract_tpu.ranking.models.cross_encoder import CrossEncoderModel
    from stract_tpu.ranking.pipeline import PrecisionStage, RankingPipeline, RecallStage
    from stract_tpu.ranking import signals as S
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.searcher.query import SearchQuery

    d_out, c_out = str(tmp_path / "dual"), str(tmp_path / "cross")
    train_dual_encoder(corpus_index.path, d_out, steps=8, batch=8, max_len=32,
                       n_triples=64, seed=2, log=lambda m: None)
    train_cross_encoder(corpus_index.path, c_out, steps=8, batch=8, max_len=32,
                        n_triples=64, seed=2, log=lambda m: None)

    dual = DualEncoder.load(d_out)
    # re-index WITH embeddings so the recall stage has doc-side vectors
    idx = InvertedIndex(str(tmp_path / "emb-idx"), embedding_dim=dual.embedding_dim)
    rng = np.random.default_rng(0)
    from stract_tpu.index.inverted import DocPointer

    stored = corpus_index.retrieve(
        [DocPointer(0, i) for i in range(min(30, corpus_index.num_docs))])
    for d in stored:
        s = d.get("stored", d)
        doc = make_doc(d.get("url", f"https://x{rng.integers(1e9)}.com/p"),
                       s.get("title", "t"), s.get("clean_text", "b"))
        emb = dual.embed([doc["title"]])[0]
        doc["title_embedding"] = emb
        doc["keyword_embedding"] = emb
        idx.insert(doc)
    idx.commit()

    api = ApiSearcher(
        LocalShardedSearcher([LocalSearcher(idx, 0)]),
        pipeline=RankingPipeline(
            RecallStage(dual_encoder=dual),
            PrecisionStage(cross_encoder=CrossEncoderModel.load(c_out)),
        ),
    )
    q = stored[0].get("stored", stored[0]).get("title", "topic").split()[0]
    res = api.search_websites(SearchQuery(query=q, return_ranking_signals=True))
    assert res.webpages, "no results through the neural pipeline"
    sig = res.webpages[0].get("rankingSignals", {})
    assert S.TITLE_EMBEDDING_SIMILARITY.name in sig
    assert S.CROSS_ENCODER_TITLE.name in sig
    assert sig[S.CROSS_ENCODER_SNIPPET.name] != 0.0 or sig[S.CROSS_ENCODER_TITLE.name] != 0.0


def test_batched_stage_apply_matches_sequential(corpus_index, tmp_path):
    """apply_many (one model dispatch per request batch) must produce the
    same signals and ordering as per-query apply — the serving path batches
    every neural stage across the query batch."""
    import copy

    from stract_tpu.entrypoint.train_encoders import train_cross_encoder
    from stract_tpu.index.inverted import DocPointer
    from stract_tpu.ranking.models.cross_encoder import CrossEncoderModel
    from stract_tpu.ranking.pipeline import PrecisionStage
    from stract_tpu.ranking.pipeline.pipeline import RankingPipeline
    from stract_tpu.ranking import signals as S
    from stract_tpu.ranking.computer import QueryContext
    from stract_tpu.ranking.pipeline.candidate import RankedCandidate

    c_out = str(tmp_path / "cross-b")
    train_cross_encoder(corpus_index.path, c_out, steps=6, batch=8, max_len=32,
                        n_triples=48, seed=3, log=lambda m: None)
    cross = CrossEncoderModel.load(c_out)
    stage = PrecisionStage(cross_encoder=cross)

    stored = corpus_index.retrieve(
        [DocPointer(0, i) for i in range(min(8, corpus_index.num_docs))])

    def make_items():
        items = []
        for qi, qtext in enumerate(["alpha beta", "gamma"]):
            ctx = QueryContext(raw=qtext, simple_terms=qtext.split(), current_ts=1e9)
            cands = []
            for j, d in enumerate(stored[qi * 3: qi * 3 + 3]):
                s = d.get("stored", d)
                c = RankedCandidate(shard=0, pointer=DocPointer(0, j),
                                    score=1.0 - 0.1 * j,
                                    signals=np.zeros(S.NUM_SIGNALS, dtype=np.float32))
                c.retrieved = {"title": s.get("title", ""), "snippet": s.get("clean_text", "")[:80]}
                cands.append(c)
            items.append((ctx, cands))
        return items

    seq = [stage.apply(ctx, cands) for ctx, cands in make_items()]
    bat = stage.apply_many(make_items())
    for s_list, b_list in zip(seq, bat):
        assert [c.pointer.doc for c in s_list] == [c.pointer.doc for c in b_list]
        for cs, cb in zip(s_list, b_list):
            np.testing.assert_allclose(cs.signals, cb.signals, rtol=1e-4, atol=1e-5)
            assert cs.score == pytest.approx(cb.score, rel=1e-4)
