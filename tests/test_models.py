import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stract_tpu.models.bert import BertConfig, BertForEmbedding, BertForSequenceScore
from stract_tpu.models.wordpiece import WordPieceTokenizer
from stract_tpu.models.dual_encoder import DualEncoder
from stract_tpu.ranking.models import CrossEncoderModel, LambdaMART, LinearRegression
from stract_tpu.ranking import signals as S


def test_wordpiece_roundtrip():
    tok = WordPieceTokenizer.build(["the quick brown fox jumps", "hello world"], vocab_size=200)
    ids, mask, types = tok.encode("hello quick fox", max_len=16)
    assert ids.shape == (16,)
    assert mask.sum() >= 5  # CLS + 3 words + SEP
    # pair encoding
    ids, mask, types = tok.encode("hello", "world", max_len=16)
    assert types[mask.astype(bool)].max() == 1


def test_dual_encoder_shapes_and_similarity():
    enc = DualEncoder.random_init()
    embs = enc.embed(["hello world", "hello world", "completely different text"])
    assert embs.shape == (3, enc.embedding_dim)
    # identical texts → identical embeddings
    assert np.allclose(embs[0], embs[1], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-3)
    assert embs[0] @ embs[1] > embs[0] @ embs[2]


def test_embed_async_parity():
    """embed_async (phase-1 prefetch — the dispatch rides behind the pass-1
    fan-out) must return bitwise what embed returns."""
    enc = DualEncoder.random_init(seed=7)
    texts = ["rust guide", "alpha beta gamma delta"]
    fetch = enc.embed_async(texts)
    np.testing.assert_array_equal(enc.embed(texts), fetch())


def test_cross_encoder_scores():
    ce = CrossEncoderModel.random_init()
    scores = ce.score("query text", ["doc one", "doc two", "doc three"])
    assert scores.shape == (3,)
    assert np.all((scores >= 0) & (scores <= 1))
    # deterministic
    scores2 = ce.score("query text", ["doc one", "doc two", "doc three"])
    np.testing.assert_allclose(scores, scores2, atol=1e-6)


def test_trim_to_bucket_parity():
    """Length-bucketed forwards (serving pads to the actual-max power-of-2
    bucket, not the 128/256-token truncation cap) must score identically to
    the full-cap pad: trimmed columns are all-PAD/mask-0 and contribute
    nothing to masked attention or masked mean pooling."""
    from stract_tpu.models.wordpiece import trim_to_bucket

    tok = WordPieceTokenizer.build(["alpha beta gamma delta epsilon zeta"], vocab_size=200)
    texts = ["alpha beta", "gamma delta epsilon zeta alpha beta gamma"]
    ids, mask, types = tok.encode_batch(texts, 128)
    t_ids, t_mask, t_types = trim_to_bucket(ids, mask, types)
    assert t_ids.shape[1] == 16  # longest row ≈ 10 pieces → bucket 16
    np.testing.assert_array_equal(t_ids, ids[:, :16])
    assert mask[:, 16:].sum() == 0

    enc = DualEncoder.random_init()
    full = np.asarray(enc.model.apply(enc.params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types)))
    trimmed = np.asarray(enc.model.apply(enc.params, jnp.asarray(t_ids), jnp.asarray(t_mask), jnp.asarray(t_types)))
    np.testing.assert_allclose(full, trimmed, atol=2e-3)

    ce = CrossEncoderModel.random_init()
    s_short = ce.score("alpha", ["beta", "gamma delta"])
    s_again = ce.score("alpha", ["beta", "gamma delta"])
    np.testing.assert_allclose(s_short, s_again, atol=1e-6)


def test_lambdamart_train_predict():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 5)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.float64) * 2.0 + x[:, 1] * 0.5
    m = LambdaMART.train(x, y, num_trees=20, max_depth=3)
    pred = m.predict(x)
    corr = np.corrcoef(pred, y)[0, 1]
    assert corr > 0.9
    # json round-trip
    m2 = LambdaMART.from_json(m.to_json())
    np.testing.assert_allclose(m2.predict(x), pred, atol=1e-5)


def test_lambdamart_bucket_parity():
    """predict() pads K to a power-of-2 bucket to avoid per-shape recompiles;
    padded rows must not perturb real rows beyond float reassociation (1 ULP)
    and must never change rank order (lambdamart.py predict docstring)."""
    import jax.numpy as jnp

    from stract_tpu.ranking.models.lambdamart import _gbdt_forward

    rng = np.random.default_rng(0)
    x = rng.normal(size=(300, 4)).astype(np.float32)
    y = x[:, 0] * 2 + x[:, 2]
    m = LambdaMART.train(x, y, num_trees=30, max_depth=3)
    for k in (1, 7, 100, 255, 256, 257, 511, 1000):
        xq = rng.normal(size=(k, 4)).astype(np.float32)
        unpadded = np.asarray(_gbdt_forward(
            m.feature, m.threshold, m.left, m.right, m.leaf_value,
            jnp.asarray(xq), m.max_depth))
        padded = m.predict(xq)
        assert padded.shape == (k,)
        np.testing.assert_allclose(padded, unpadded, rtol=1e-6, atol=1e-7)
        assert np.array_equal(np.argsort(-padded, kind="stable"),
                              np.argsort(-unpadded, kind="stable"))


def test_lambdamart_lightgbm_parse():
    dump = """tree
version=v4
objective=lambdarank

Tree=0
num_leaves=3
split_feature=0 1
threshold=0.5 1.5
left_child=-1 -2
right_child=1 -3
leaf_value=0.1 0.2 0.3

Tree=1
num_leaves=2
split_feature=1
threshold=2.0
left_child=-1
right_child=-2
leaf_value=-0.05 0.05

end of trees
"""
    m = LambdaMART.parse_lightgbm(dump)
    assert m.num_trees == 2
    x = np.array([[0.0, 0.0], [1.0, 1.0], [1.0, 3.0]], dtype=np.float32)
    # tree0: x0<=0.5 → leaf0 (0.1); else x1<=1.5 → leaf1 (0.2) else leaf2 (0.3)
    # tree1: x1<=2.0 → -0.05 else 0.05
    expected = np.array([0.1 - 0.05, 0.2 - 0.05, 0.3 + 0.05])
    np.testing.assert_allclose(m.predict(x), expected, atol=1e-6)


def test_linear_regression():
    rng = np.random.default_rng(1)
    x = np.zeros((100, S.NUM_SIGNALS), dtype=np.float32)
    x[:, S.BM25_TITLE.id] = rng.normal(size=100)
    x[:, S.HOST_CENTRALITY.id] = rng.normal(size=100)
    y = 2.0 * x[:, S.BM25_TITLE.id] - 1.0 * x[:, S.HOST_CENTRALITY.id] + 0.5
    m = LinearRegression.train(x, y)
    pred = m.predict(x)
    assert np.abs(pred - y).max() < 0.05
    m2 = LinearRegression.from_json(m.to_json())
    np.testing.assert_allclose(m2.predict(x), pred, atol=1e-5)


def test_hf_param_mapping_structure():
    """Init params and check tree structure matches what load_hf_safetensors produces."""
    cfg = BertConfig.tiny()
    model = BertForSequenceScore(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))
    import flax.linen as nn
    p = nn.meta.unbox(params)["params"]
    assert "bert" in p and "score" in p
    assert "word_embeddings" in p["bert"]
    assert "layer_0" in p["bert"]
    assert "query" in p["bert"]["layer_0"]["attention"]


def test_train_checkpoint_roundtrip(tmp_path):
    """orbax save/restore of sharded train state."""
    import numpy as np
    from jax.sharding import Mesh
    from stract_tpu.models.bert import BertConfig
    from stract_tpu.parallel.mesh import make_mesh
    from stract_tpu.parallel.train import (
        make_train_state, make_jitted_train_step, save_checkpoint, restore_checkpoint,
    )

    mesh = make_mesh(4, axes=("dp", "tp"))
    cfg = BertConfig.tiny()
    with mesh:
        model, params, opt_state, opt, _ = make_train_state(cfg, mesh)
        save_checkpoint(str(tmp_path / "ckpt"), params, opt_state, step=1)
        p2, o2 = restore_checkpoint(str(tmp_path / "ckpt"), params, opt_state, step=1)
    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(p2)
    assert all(np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(leaves1, leaves2))
