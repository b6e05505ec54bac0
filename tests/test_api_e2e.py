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

    # tiny host webgraph + page graph + entity image store for the link routes
    from stract_tpu.image_store import ImageStore
    from stract_tpu.ranking.inbound_similarity import InboundSimilarity
    from stract_tpu.webgraph.edge import Edge, RelFlags
    from stract_tpu.webgraph.store import WebgraphBuilder

    hb = WebgraphBuilder(host_graph=True)
    hb.insert(Edge("blog.io", "rust-lang.org", RelFlags.NONE))
    hb.insert(Edge("news.site.com", "rust-lang.org", RelFlags.NOFOLLOW))
    hb.insert(Edge("rust-lang.org", "python.org", RelFlags.NONE))
    hg = hb.build(str(tmp_path / "api_hostgraph"))

    pb = WebgraphBuilder()
    pb.insert(Edge("https://blog.io/post", "https://rust-lang.org/", RelFlags.NONE))
    pg = pb.build(str(tmp_path / "api_pagegraph"))

    store = ImageStore(str(tmp_path / "api_images"))
    store.insert("ent1", b"\x89PNGfake-image-bytes")

    return build_app(
        api,
        autosuggest=suggest,
        similar_hosts=InboundSimilarity(hg),
        page_graph=pg,
        image_store=store,
    )


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

            # improvement click log + store
            resp = await client.post("/improvement/click", json={"qid": "q1", "click": "url"})
            assert (await resp.json())["ok"]
            qid = await (await client.post(
                "/improvement/store",
                json={"query": "rust", "urls": ["https://rust-lang.org/"]},
            )).text()
            assert len(qid) == 32

            # webgraph link browsing (api/webgraph.rs ingoing/outgoing routes)
            edges = await (await client.post(
                "/beta/api/webgraph/host/ingoing?host=rust-lang.org"
            )).json()
            assert {e["from"] for e in edges} == {"blog.io", "news.site.com"}
            assert any("NOFOLLOW" in e["relFlags"] for e in edges)
            edges = await (await client.post(
                "/beta/api/webgraph/host/outgoing", json={"host": "https://rust-lang.org/"}
            )).json()
            assert [e["to"] for e in edges] == ["python.org"]
            edges = await (await client.post(
                "/beta/api/webgraph/page/ingoing?page=https://rust-lang.org/"
            )).json()
            assert [e["from"] for e in edges] == ["https://blog.io/post"]
            edges = await (await client.post(
                "/beta/api/webgraph/page/outgoing?page=https://blog.io/post"
            )).json()
            assert [e["to"] for e in edges] == ["https://rust-lang.org/"]
            assert (await client.post("/beta/api/webgraph/host/ingoing")).status == 400

            # optic exports round-trip through the optics parser
            from stract_tpu.optics.optic import Optic

            text = await (await client.post(
                "/beta/api/hosts/export",
                json={"hostRankings": {"liked": ["a.com"], "disliked": [], "blocked": ["b.com"]}},
            )).text()
            o = Optic.parse(text)
            assert o.host_rankings.liked == ["a.com"] and len(o.rules) == 1
            text = await (await client.post(
                "/beta/api/explore/export",
                json={"chosenHosts": ["rust-lang.org"], "similarHosts": ["crates.io"]},
            )).text()
            o = Optic.parse(text)
            assert o.discard_non_matching and o.host_rankings.liked == ["rust-lang.org"]

            # entity image + browser autosuggest
            resp = await client.get("/beta/api/entity_image?imageId=ent1")
            assert resp.status == 200 and (await resp.read()).startswith(b"\x89PNG")
            assert (await client.get("/beta/api/entity_image?imageId=nope")).status == 404
            data = await (await client.get("/beta/api/autosuggest/browser?q=rust")).json()
            assert data[0] == "rust" and "rust lang" in data[1]

            # missing query key → 400 (not 500)
            assert (await client.post("/beta/api/search", json={"q": 1})).status == 400

            # frontend SPA served on every client-side route + static assets
            for route in ("/", "/search?q=rust", "/explore", "/settings"):
                page = await (await client.get(route)).text()
                assert '<div id="view">' in page or "stract_tpu" in page
            js = await (await client.get("/static/app.js")).text()
            assert "renderSearch" in js and "renderExplore" in js
            css = await client.get("/static/style.css")
            assert css.status == 200 and css.content_type == "text/css"
            assert (await client.get("/static/../conftest.py")).status == 404
            xml = await (await client.get("/static/opensearch.xml")).text()
            assert "OpenSearchDescription" in xml

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
