"""Spell / autosuggest / widgets / entity / optics / summarizer tests."""

import numpy as np
import pytest

from stract_tpu.spell import TermFreqs, StupidBackoff, SpellChecker
from stract_tpu.autosuggest import Autosuggest
from stract_tpu.widgets import Calculator, Thesaurus, WidgetManager
from stract_tpu.entity_index import Entity, EntityIndex
from stract_tpu.optics import Optic, HostRankings
from stract_tpu.bangs import Bangs
from stract_tpu.query import Query


# ---- spell -------------------------------------------------------------------

@pytest.fixture(scope="module")
def checker():
    freqs = TermFreqs()
    lm = StupidBackoff()
    corpus = ("the quick brown fox jumps over the lazy dog . "
              "rust programming language is fast . python programming language is easy . "
              "the programming language ecosystem keeps growing . ") * 5
    freqs.observe_text(corpus)
    lm.observe_text(corpus)
    return SpellChecker(freqs, lm)


def test_spell_correction(checker):
    c = checker.correct("rust programing language")
    assert c is not None
    assert c.corrected == "rust programming language"
    assert [t for t, corrected in c.terms if corrected] == ["programming"]


def test_spell_no_correction_needed(checker):
    assert checker.correct("rust programming") is None


def test_spell_roundtrip(tmp_path, checker):
    checker.freqs.save(str(tmp_path / "f.bin"))
    checker.lm.save(str(tmp_path / "lm.bin"))
    f2 = TermFreqs.load(str(tmp_path / "f.bin"))
    lm2 = StupidBackoff.load(str(tmp_path / "lm.bin"))
    c = SpellChecker(f2, lm2).correct("pythn programming")
    assert c and c.corrected == "python programming"


# ---- autosuggest -----------------------------------------------------------------

def test_autosuggest(tmp_path):
    a = Autosuggest.from_queries(["rust tutorial", "rust tutorial", "rust lang", "python"])
    assert a.suggest("rust") == ["rust tutorial", "rust lang"]
    assert a.suggest("py") == ["python"]
    assert a.suggest("zz") == []
    a.save(str(tmp_path / "a.bin"))
    assert Autosuggest.load(str(tmp_path / "a.bin")).suggest("rust")[0] == "rust tutorial"


# ---- widgets ---------------------------------------------------------------------

def test_calculator():
    c = Calculator()
    assert c.try_calculate("2+2")["result"] == "4"
    assert c.try_calculate("3 * (4 + 5)")["result"] == "27"
    assert c.try_calculate("2^10")["result"] == "1024"
    assert c.try_calculate("sqrt(144)")["result"] == "12"
    assert c.try_calculate("10 % 3")["result"] == "1"
    assert abs(float(c.try_calculate("2*pi")["result"]) - 6.2831853) < 1e-5
    assert c.try_calculate("rust tutorial") is None
    assert c.try_calculate("1/0") is None


def test_thesaurus():
    t = Thesaurus()
    w = t.try_define("define happy")
    assert w and w["meanings"][0]["synonyms"]
    assert t.try_define("happy definition")
    assert t.try_define("define qzxqzx") is None


def test_widget_manager():
    m = WidgetManager()
    assert m.widget("5*5")["type"] == "calculator"
    assert m.widget("define fast")["type"] == "thesaurus"
    assert m.widget("regular query") is None


# ---- entity sidebar -----------------------------------------------------------------

def test_entity_index(tmp_path):
    ei = EntityIndex(str(tmp_path / "e"))
    ei.insert(Entity("Rust (programming language)", "Rust is a systems programming language.",
                     info={"Designed by": "Graydon Hoare"}))
    ei.insert(Entity("Python (programming language)", "Python is a high-level language."))
    ei.commit()
    hits = ei.search("rust programming")
    assert hits and "Rust" in hits[0].title
    # exact title
    hits = ei.search("python (programming language)")
    assert hits[0].title.startswith("Python")
    # reload from disk
    ei2 = EntityIndex(str(tmp_path / "e"))
    assert len(ei2) == 2
    assert ei2.search("rust systems")[0].info["Designed by"] == "Graydon Hoare"

    from stract_tpu.entity_index.index import SidebarManager
    sm = SidebarManager(ei2)
    s = sm.sidebar("rust programming")
    assert s and s["type"] == "entity"
    assert sm.sidebar("qqqq zzzz") is None


# ---- optics -------------------------------------------------------------------------

def test_optic_parse_and_apply():
    src = '''
    // test optic
    DiscardNonMatching;
    Rule {
        Matches { Site("example.com") },
        Action(Boost(3))
    };
    Rule {
        Matches { Url("*spam*") },
        Action(Discard)
    };
    Like(Site("good.com"));
    Dislike(Site("bad.com"));
    '''
    o = Optic.parse(src)
    assert o.discard_non_matching
    assert len(o.rules) == 2
    assert o.host_rankings.liked == ["good.com"]
    assert o.host_rankings.disliked == ["bad.com"]

    class C:
        def __init__(self, site, url, score=1.0):
            self.site, self.url, self.score = site, url, score

    cands = [C("example.com", "https://example.com/a"),
             C("example.com", "https://example.com/spam/x"),
             C("other.com", "https://other.com/b")]
    out = o.apply(cands, lambda c: {"site": c.site, "url": c.url})
    urls = [c.url for c in out]
    assert "https://example.com/a" in urls          # matched, boosted
    assert "https://example.com/spam/x" not in urls  # discarded by rule
    assert "https://other.com/b" not in urls         # discard non-matching


def test_optic_patterns():
    o = Optic.parse('Rule { Matches { Title("|exact*end|") } };')
    m = o.rules[0].match_blocks[0][0]
    assert m.matches("exact something end")
    assert not m.matches("prefix exact something end suffix")


def test_optic_anchored_matching_in_query():
    q = Query.parse("hello", optic=Optic.parse('Like(Site("liked.com"));'))
    assert q.host_rankings.liked == ["liked.com"]


# ---- bangs -----------------------------------------------------------------------------

def test_bangs():
    b = Bangs.builtin()
    q = Query.parse("!gh rust lang")
    hit = b.get(q)
    assert hit and "github.com" in hit.redirect_to
    assert "rust+lang" in hit.redirect_to
    assert b.get(Query.parse("no bang here")) is None


# ---- summarizer -------------------------------------------------------------------------

def test_summarizer():
    from stract_tpu.summarizer import Summarizer, split_passages
    from stract_tpu.models.dual_encoder import DualEncoder

    text = " ".join(f"word{i}" for i in range(400))
    assert len(split_passages(text)) == 7
    enc = DualEncoder.random_init()
    s = Summarizer(enc)
    out = s.summarize("query", text, top_k=2)
    assert 0 < len(out.split()) <= 128
    assert all(w.startswith("word") for w in out.split())
