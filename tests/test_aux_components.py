"""Tests for generic queries, external sort, image store, canonical index,
site stats, remote_cp, ZIM reader, ltr eval, leechy."""

import numpy as np
import pytest

from conftest import make_doc


def test_generic_queries(tmp_path):
    from stract_tpu.index import InvertedIndex
    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.generic_query import (
        SizeQuery, GetWebpageQuery, GetHomepageQuery, GetSiteUrlsQuery,
        TopKeyPhrasesQuery, run_generic_query,
    )

    idx1 = InvertedIndex(str(tmp_path / "a"))
    idx1.insert(make_doc("https://site.com/", "Home", "welcome home page", keywords="greeting\nwelcome"))
    idx1.insert(make_doc("https://site.com/about", "About", "about the site", keywords="about"))
    idx1.commit()
    idx2 = InvertedIndex(str(tmp_path / "b"))
    idx2.insert(make_doc("https://other.org/x", "X", "the x page", keywords="greeting"))
    idx2.commit()
    searchers = [LocalSearcher(idx1, 0), LocalSearcher(idx2, 1)]

    assert run_generic_query(SizeQuery(), searchers) == 3
    w = run_generic_query(GetWebpageQuery("https://site.com/about"), searchers)
    assert w["title"] == "About"
    h = run_generic_query(GetHomepageQuery("site.com"), searchers)
    assert h["url"] == "https://site.com/"
    urls = run_generic_query(GetSiteUrlsQuery("site.com"), searchers)
    assert set(urls) == {"https://site.com/", "https://site.com/about"}
    phrases = run_generic_query(TopKeyPhrasesQuery(5), searchers)
    assert phrases.get("greeting") == 2


def test_external_sort():
    from stract_tpu.utils.external_sort import external_sort

    rng = np.random.default_rng(0)
    items = [int(x) for x in rng.integers(0, 100000, 25_000)]
    out = list(external_sort(items, chunk_size=1000))
    assert out == sorted(items)
    assert list(external_sort([], chunk_size=10)) == []
    assert list(external_sort([3, 1, 2], chunk_size=10)) == [1, 2, 3]


def test_image_store(tmp_path):
    from stract_tpu.image_store import ImageStore

    s = ImageStore(str(tmp_path / "img"))
    digest = s.insert("Rust (programming language)", b"\x89PNG fake image data")
    assert s.get("Rust (programming language)") == b"\x89PNG fake image data"
    assert "Rust (programming language)" in s
    assert s.get("missing") is None
    # dedup: same bytes → same blob
    d2 = s.insert("Other", b"\x89PNG fake image data")
    assert d2 == digest


def test_canonical_index(tmp_path):
    from stract_tpu.canon_index import CanonicalIndex

    ci = CanonicalIndex(str(tmp_path / "canon"))
    ci.insert("https://m.site.com/page", "https://site.com/page")
    ci.insert("https://site.com/page?utm=1", "https://site.com/page")
    ci.commit()
    assert ci.canonical_of("https://m.site.com/page") == "https://site.com/page"
    assert ci.canonical_of("https://site.com/page") == "https://site.com/page"
    assert ci.is_canonical("https://site.com/page")
    assert not ci.is_canonical("https://m.site.com/page")


def test_site_stats(tmp_path):
    from stract_tpu.index import InvertedIndex
    from stract_tpu.site_stats import compute_site_stats
    from stract_tpu.kv import Db

    idx = InvertedIndex(str(tmp_path / "i"))
    idx.insert(make_doc("https://a.com/1", "One", "page one"))
    idx.insert(make_doc("https://a.com/2", "Two", "page two"))
    idx.insert(make_doc("https://b.com/1", "B", "page b"))
    idx.commit()
    hc = Db.open(str(tmp_path / "hc"))
    hc.insert(b"a.com", {"centrality": 0.7, "rank": 1})
    hc.commit()
    stats = compute_site_stats(idx, hc)
    assert stats["a.com"]["pages"] == 2
    assert stats["a.com"]["centrality"] == 0.7
    assert stats["b.com"]["pages"] == 1


def test_remote_cp(tmp_path):
    from stract_tpu.distributed.remote_cp import RemoteCpService, download_tree
    from stract_tpu.distributed.sonic import serve_in_thread, RemoteClient

    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.bin").write_bytes(b"x" * (3 << 20))  # 3MB → multiple chunks
    (src / "sub" / "b.txt").write_bytes(b"hello")
    srv = serve_in_thread(RemoteCpService(str(src)))
    try:
        client = RemoteClient(srv.addr)
        dest = tmp_path / "dest"
        n = download_tree(client, str(dest))
        assert n == 2
        assert (dest / "a.bin").read_bytes() == b"x" * (3 << 20)
        assert (dest / "sub" / "b.txt").read_bytes() == b"hello"
        # second run skips identical files
        assert download_tree(client, str(dest)) == 0
    finally:
        srv.stop()


def test_zim_roundtrip(tmp_path):
    from stract_tpu.zim import ZimFile, ZimWriter

    w = ZimWriter()
    w.add_article("Rust", "Rust (programming language)",
                  "<html><body><p>" + "Rust is a systems programming language. " * 3 +
                  "</p><table class='infobox'><tr><th>Designed by</th><td>Graydon Hoare</td></tr>"
                  "<tr><td><img src='rust-logo.png'></td></tr></table></body></html>")
    w.add_article("Python", "Python (programming language)",
                  "<html><body><p>" + "Python is a high level programming language. " * 3 + "</p></body></html>")
    p = str(tmp_path / "test.zim")
    w.write(p)

    z = ZimFile(p)
    arts = list(z.articles())
    assert len(arts) == 2
    assert arts[0].title == "Rust (programming language)"
    assert "systems programming" in arts[0].text()
    z.close()


def test_entity_from_zim(tmp_path):
    from stract_tpu.zim import ZimWriter
    from stract_tpu.entrypoint.entity import build_entity_index

    w = ZimWriter()
    w.add_article("Rust", "Rust (programming language)",
                  "<html><body><p>" + "Rust is a multi paradigm systems programming language focused on safety. " * 2 +
                  "</p><table class='infobox'><tr><th>Designed by</th><td>Graydon Hoare</td></tr></table></body></html>")
    p = str(tmp_path / "t.zim")
    w.write(p)
    idx = build_entity_index(p, str(tmp_path / "ei"))
    assert len(idx) == 1
    hits = idx.search("rust programming")
    assert hits and hits[0].info.get("Designed by") == "Graydon Hoare"


def test_ltr_eval():
    from stract_tpu.ltr.eval import ndcg_at_k, recall_at_k, evaluate_ranking

    assert ndcg_at_k([3, 2, 1], 3) == pytest.approx(1.0)
    assert ndcg_at_k([1, 2, 3], 3) < 1.0
    assert ndcg_at_k([0, 0, 0], 3) == 0.0
    assert recall_at_k(["a", "b", "c"], {"a", "z"}, 3) == 0.5

    golden = {"q1": {"u1": 3.0, "u2": 1.0}}
    metrics = evaluate_ranking(lambda q: ["u1", "u2", "u3"], golden)
    assert metrics["ndcg@2"] == pytest.approx(1.0)
    assert metrics["recall@2"] == pytest.approx(1.0)


def test_leechy():
    from stract_tpu.leechy import Leechy, Engine

    SERP = """<html><body>
      <a class="result__a" href="https://one.com/x">One</a>
      <a class="result__a" href="https://two.com/y">Two</a>
      <a class="other" href="https://nope.com">skip</a>
    </body></html>"""

    def fetch(url):
        return 200, SERP, 5

    l = Leechy(fetch, [Engine("test", "https://t.com/?q={query}", "//a[contains(@class,'result__a')]")])
    assert l.results("anything") == ["https://one.com/x", "https://two.com/y"]
    ann = l.annotate(["q"])
    assert ann["q"]["https://one.com/x"] > ann["q"]["https://two.com/y"]
