"""HTML parsing + WARC + indexer-pipeline tests (role of reference webpage/html
tests and entrypoint/indexer/worker.rs:524-668 embedding-rank tests)."""

import numpy as np
import pytest

from stract_tpu.webpage import Html, Region
from stract_tpu.webpage.core import Webpage
from stract_tpu.webpage.safety import SafetyClassifier
from stract_tpu.webgraph.edge import RelFlags
from stract_tpu.warc import WarcReader, WarcWriter
from stract_tpu.keywords import rake_keywords

HTML = """
<html lang="en">
<head>
  <title>Test Page — Rust Systems</title>
  <meta name="description" content="A page about rust systems programming.">
  <script type="application/ld+json">{"@type": "Article", "headline": "Rust rules"}</script>
  <script src="https://google-analytics.com/ga.js"></script>
</head>
<body>
  <nav><a href="/home">home</a> <a href="/about">about</a></nav>
  <h1>Rust Systems Programming</h1>
  <p>Rust is a systems programming language that is fast and memory safe without
     garbage collection. It is loved by the developers that use it every day.</p>
  <p>The borrow checker is the most famous feature of the language and it prevents
     whole classes of bugs that are common in other languages.</p>
  <article itemscope itemtype="https://schema.org/Recipe">
     <span itemprop="name">Ferris Cake</span>
     <span itemprop="recipeIngredient">crab meat</span>
  </article>
  <p><a href="https://external.com/x" rel="nofollow sponsored">a sponsored link</a></p>
  <a href="https://same.example.com/y">internal</a>
  <footer><a href="/privacy">privacy</a></footer>
</body>
</html>
"""


@pytest.fixture(scope="module")
def html():
    return Html.parse(HTML, "https://www.example.com/blog/rust?ref=1")


def test_basic_fields(html):
    assert html.title() == "Test Page — Rust Systems"
    assert html.first_h1() == "Rust Systems Programming"
    assert "rust systems" in html.description().lower()
    assert html.site == "www.example.com"
    assert html.host == "example.com"
    assert html.domain == "example.com"
    assert not html.is_homepage()
    assert html.lang() == "en"
    assert html.region() == Region.US


def test_clean_text_excludes_boilerplate(html):
    clean = html.clean_text()
    assert "borrow checker" in clean
    assert "memory safe" in clean
    # nav/footer links are not main text
    assert "privacy" not in clean.lower()


def test_links_and_flags(html):
    links = html.links()
    by_dest = {l.destination: l for l in links}
    sponsored = by_dest["https://external.com/x"]
    assert sponsored.rel_flags & RelFlags.NOFOLLOW
    assert sponsored.rel_flags & RelFlags.SPONSORED
    internal = by_dest["https://same.example.com/y"]
    assert internal.rel_flags & RelFlags.SAME_ICANN_DOMAIN
    footer = by_dest["https://www.example.com/privacy"]
    assert footer.rel_flags & RelFlags.IS_IN_FOOTER
    nav = by_dest["https://www.example.com/home"]
    assert nav.rel_flags & RelFlags.IS_IN_NAVIGATION
    assert nav.text == "home"


def test_schema_org(html):
    items = html.schema_org()
    types = {i.get("@type") for i in items}
    assert "Article" in types
    assert "Recipe" in types
    from stract_tpu.webpage.schema_org import flatten

    lines = flatten(items)
    assert any(l.startswith("Article.headline=") for l in lines)


def test_trackers_and_prepare(html):
    assert html.trackers() == 1
    doc = html.prepare(fetch_time_ms=42)
    assert doc["likely_has_ads"]
    assert doc["num_path_and_query_digits"] == 1
    assert doc["sim_hash"] != 0
    assert doc["recipe_first_ingredient_tag_id"] == "crab meat"
    assert doc["host_node_id"] != 0


def test_noindex():
    h = Html.parse('<html><head><meta name="robots" content="noindex, nofollow"></head></html>', "https://x.com/")
    assert h.is_no_index()


def test_webpage_document():
    page = Webpage.parse(HTML, "https://example.com/", host_centrality=0.5,
                         backlink_labels=["rust blog", "systems stuff"])
    doc = page.as_document()
    assert doc["host_centrality"] == 0.5
    assert "rust blog" in doc["backlink_text"]
    assert doc["is_homepage"]


def test_warc_roundtrip(tmp_path):
    p = str(tmp_path / "test.warc.gz")
    with WarcWriter.open(p) as w:
        w.write_record("https://a.com/1", "<html><title>One</title></html>")
        w.write_record("https://a.com/2", "<html><title>Two</title></html>")
    recs = list(WarcReader.open(p))
    assert [r.url for r in recs] == ["https://a.com/1", "https://a.com/2"]
    assert "Two" in recs[1].text()


def test_rake_keywords():
    text = ("systems programming language rust is a modern systems programming language "
            "for reliable software and the borrow checker helps with memory safety")
    kws = rake_keywords(text, "en")
    assert any("systems programming language" in k for k in kws)


def test_indexer_end_to_end(tmp_path):
    """WARC → index → search finds the page (role of indexer worker tests)."""
    from stract_tpu.entrypoint.indexer import run, IndexingWorker
    from stract_tpu.kv import Db
    from stract_tpu.ranking.computer import QueryContext

    warc = str(tmp_path / "c.warc.gz")
    with WarcWriter.open(warc) as w:
        w.write_record("https://rust-lang.org/", HTML)
        w.write_record("https://other.org/cook",
                       "<html><title>Cooking</title><body><p>how to cook pasta with cheese "
                       "and eggs for dinner tonight with the family at home</p></body></html>")

    hc = Db.open(str(tmp_path / "hc"))
    hc.insert(b"rust-lang.org", {"centrality": 0.8, "rank": 1})
    hc.commit()

    idx = run([warc], str(tmp_path / "idx"), IndexingWorker(host_centrality=hc))
    assert idx.num_docs == 2
    ctx = QueryContext(raw="borrow checker", simple_terms=["borrow", "checker"], current_ts=1e9)
    ptrs, _ = idx.search_initial(ctx, top_k=5)
    docs = idx.retrieve(ptrs)
    assert docs and docs[0]["url"] == "https://rust-lang.org/"
    seg = idx.segments[0]
    assert float(seg.column("host_centrality")[ptrs[0].doc]) == pytest.approx(0.8)


def test_safety_classifier_integration():
    clf = SafetyClassifier.train(
        ["adult explicit nsfw content xxx", "porn site adult", "cooking recipes dinner",
         "programming tutorial code", "adult nsfw video explicit"],
        ["nsfw", "nsfw", "sfw", "sfw", "nsfw"],
    )
    assert clf.classify_webpage({"title": "explicit adult", "clean_text": "nsfw xxx"}) == "nsfw"
    assert clf.classify_webpage({"title": "pasta", "clean_text": "cooking dinner recipes"}) == "sfw"
