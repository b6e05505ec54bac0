"""End-to-end HTTP API test: dev stack served by aiohttp, exercised over real
HTTP (role of the reference's run_dev + Playwright smoke). No pytest-asyncio in
the image, so one async driver runs under asyncio.run."""

import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

from conftest import make_doc


def build_test_app(tmp_path):
    from stract_tpu.api.server import build_app
    from stract_tpu.autosuggest import Autosuggest
    from stract_tpu.entity_index import Entity, EntityIndex
    from stract_tpu.entity_index.index import SidebarManager
    from stract_tpu.index import InvertedIndex
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.spell import SpellChecker, TermFreqs, StupidBackoff
    from stract_tpu.widgets import WidgetManager

    idx = InvertedIndex(str(tmp_path / "api_idx"))
    idx.insert(make_doc("https://rust-lang.org/", "The Rust Programming Language",
                        "rust is a systems programming language fast and safe",
                        host_centrality=0.9))
    idx.insert(make_doc("https://python.org/", "Python", "python is a programming language",
                        host_centrality=0.8))
    idx.commit()

    freqs = TermFreqs()
    lm = StupidBackoff()
    for _ in range(5):
        freqs.observe_text("rust programming language systems")
        lm.observe_text("rust programming language systems")

    ei = EntityIndex(str(tmp_path / "api_ent"))
    ei.insert(Entity("Rust (programming language)", "Rust is a systems programming language."))
    ei.commit()

    api = ApiSearcher(
        LocalShardedSearcher([LocalSearcher(idx, shard_id=0)]),
        spell_checker=SpellChecker(freqs, lm),
        widget_manager=WidgetManager(),
        sidebar_manager=SidebarManager(ei),
    )
    suggest = Autosuggest.from_queries(["rust tutorial", "rust lang"])
    return build_app(api, autosuggest=suggest)


def test_api_end_to_end(tmp_path):
    app = build_test_app(tmp_path)

    async def run():
        async with TestClient(TestServer(app)) as client:
            # search
            resp = await client.post("/beta/api/search", json={"query": "rust programming"})
            assert resp.status == 200
            data = await resp.json()
            assert data["type"] == "websites"
            assert data["webpages"][0]["url"] == "https://rust-lang.org/"
            assert data["numHits"]["value"] >= 1
            assert "snippet" in data["webpages"][0]

            # bang redirect
            data = await (await client.post("/beta/api/search", json={"query": "!g rust"})).json()
            assert data["type"] == "bang" and "google" in data["redirectTo"]

            # bad request
            assert (await client.post("/beta/api/search", json={"query": " "})).status == 400

            # widget / sidebar / spellcheck / autosuggest
            data = await (await client.post("/beta/api/widget", json={"query": "2+2*3"})).json()
            assert data["widget"]["result"] == "8"
            data = await (await client.post("/beta/api/search/sidebar",
                                            json={"query": "rust programming"})).json()
            assert data["sidebar"]["type"] == "entity"
            data = await (await client.post("/beta/api/search/spellcheck",
                                            json={"query": "rust programing"})).json()
            assert data["correction"]["corrected"] == "rust programming"
            data = await (await client.get("/beta/api/autosuggest?q=rust")).json()
            assert {"raw": "rust lang"} in data

            # metrics / health / openapi / UI
            text = await (await client.get("/metrics")).text()
            assert "search_requests_total" in text
            assert (await client.get("/health")).status == 200
            spec = await (await client.get("/beta/api/docs/openapi.json")).json()
            assert "/beta/api/search" in spec["paths"]
            assert "stract_tpu" in await (await client.get("/")).text()

            # ranking signals incl. proximity (slop) from the precision stage
            data = await (await client.post(
                "/beta/api/search", json={"query": "rust", "return_ranking_signals": True}
            )).json()
            sig = data["webpages"][0]["rankingSignals"]
            assert any(k.startswith("bm25") for k in sig)
            assert "min_title_slop" in sig

            # improvement click log
            resp = await client.post("/improvement/click", json={"qid": "q1", "click": "url"})
            assert (await resp.json())["ok"]

    asyncio.run(run())


def test_min_slop():
    from stract_tpu.ranking.proximity import min_slop, slop_score, MAX_SLOP

    assert min_slop(["quick", "fox"], "the quick brown fox jumps") == 1.0
    assert min_slop(["quick", "brown"], "the quick brown fox") == 0.0
    assert min_slop(["quick"], "the quick fox") == 0.0
    assert min_slop(["missing"], "the quick fox") == MAX_SLOP
    # picks the tightest window among repeats
    assert min_slop(["a", "b"], "a x x x b a b") == 0.0
    assert slop_score(0.0) == 1.0
