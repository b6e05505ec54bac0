"""Full dev-deployment integration: configure() builds WARC → webgraph →
centrality → index → spell → autosuggest → entity index, then the whole search
stack answers queries (the reference's `just configure` + run_dev smoke)."""

import pytest


def test_configure_and_search(tmp_path):
    from stract_tpu.entrypoint.configure import run as configure

    paths = configure(str(tmp_path / "data"))

    # centrality flowed into the index: rust-lang.org has inlinks
    from stract_tpu.kv import Db

    hc = Db.open(paths["centrality"])
    rust = hc.get(b"rust-lang.org")
    assert rust and rust["centrality"] > 0

    from stract_tpu.index import InvertedIndex
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.searcher.query import SearchQuery
    from stract_tpu.spell.trainer import load_checker
    from stract_tpu.entity_index import EntityIndex
    from stract_tpu.entity_index.index import SidebarManager
    from stract_tpu.widgets import WidgetManager

    idx = InvertedIndex(paths["index"])
    assert idx.num_docs == 7
    api = ApiSearcher(
        LocalShardedSearcher([LocalSearcher(idx, 0)]),
        spell_checker=load_checker(paths["spell"]),
        widget_manager=WidgetManager(),
        sidebar_manager=SidebarManager(EntityIndex(paths["entity_index"])),
    )

    res = api.search(SearchQuery(query="rust programming"))
    urls = [w["url"] for w in res.webpages]
    assert "https://rust-lang.org/" in urls

    # centrality boost: rust-lang.org (2 inlinks) above crates.io for shared terms
    res = api.search(SearchQuery(query="rust"))
    assert res.webpages[0]["url"] == "https://rust-lang.org/"

    assert api.sidebar_for("rust programming")["type"] == "entity"
    assert api.widget("1+1")["result"] == "2"
    corr = api.spell_correction("pyhon documentation")
    # spell model trained on the corpus should fix 'pyhon'
    assert corr is None or "python" in corr.corrected

    from stract_tpu.autosuggest import Autosuggest

    sug = Autosuggest.load(paths["autosuggest"])
    assert any("rust" in s for s in sug.suggest("rust"))


def test_dense_rerank_op(rng):
    import numpy as np
    import jax.numpy as jnp
    from stract_tpu.ops.dense_rerank import rerank_topk, rerank_topk_batch

    K, H = 64, 32
    emb = rng.normal(size=(K, H)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[7] * 1.0  # query identical to candidate 7
    base = np.zeros(K, dtype=np.float32)
    idx, scores = rerank_topk(jnp.asarray(emb), jnp.asarray(q), jnp.asarray(base), 1.0, 5)
    assert int(np.asarray(idx)[0]) == 7

    # batched
    idx_b, _ = rerank_topk_batch(
        jnp.asarray(np.stack([emb, emb])), jnp.asarray(np.stack([emb[3], emb[9]])),
        jnp.zeros((2, K), jnp.float32), 1.0, 3,
    )
    assert int(np.asarray(idx_b)[0][0]) == 3
    assert int(np.asarray(idx_b)[1][0]) == 9
