from stract_tpu.query import parse_terms, Term, TermKind, Query, MAX_TERMS_PER_QUERY


def test_simple_terms():
    ts = parse_terms("rust tutorial")
    assert [t.kind for t in ts] == [TermKind.SIMPLE] * 2
    assert [t.text for t in ts] == ["rust", "tutorial"]


def test_phrase():
    ts = parse_terms('hello "exact phrase" world')
    assert ts[1].kind == TermKind.PHRASE
    assert ts[1].sub == ["exact", "phrase"]


def test_field_terms():
    ts = parse_terms("site:example.com intitle:rust inbody:fast inurl:docs exacturl:https://x.com/y")
    assert [t.kind for t in ts] == [
        TermKind.SITE, TermKind.TITLE, TermKind.BODY, TermKind.URL, TermKind.EXACT_URL,
    ]
    assert ts[0].text == "example.com"
    assert ts[4].text == "https://x.com/y"


def test_exclusion():
    ts = parse_terms("rust -spam")
    assert ts[1].kind == TermKind.NOT
    assert ts[1].sub[0].text == "spam"


def test_bangs():
    ts = parse_terms("!g rust")
    assert ts[0].kind == TermKind.BANG
    assert ts[0].text == "g"
    ts = parse_terms("!!w wiki")
    assert ts[0].kind == TermKind.BANG


def test_or_pattern():
    ts = parse_terms("cat || dog food")
    assert ts[0].kind == TermKind.OR
    assert [s.text for s in ts[0].sub] == ["cat", "dog"]
    assert ts[1].text == "food"


def test_term_cap():
    ts = parse_terms(" ".join(f"t{i}" for i in range(100)))
    assert len(ts) == MAX_TERMS_PER_QUERY


def test_dash_alone_ignored():
    ts = parse_terms("a - b")
    assert [t.text for t in ts if t.kind == TermKind.SIMPLE] == ["a", "b"]


def test_query_planning():
    q = Query.parse('rust site:docs.rs -spam "memory safety"')
    assert "rust" in q.simple_terms
    assert "memory" in q.simple_terms and "safety" in q.simple_terms
    assert "spam" not in q.simple_terms
    kinds = [(g.required, g.excluded, g.scoring) for g in q.groups]
    # rust(req), site(req non-scoring), spam(excl), memory(req), safety(req)
    assert (True, False, False) in kinds  # site filter
    assert any(g.excluded for g in q.groups)
    assert not q.is_empty()


def test_query_bang_extraction():
    q = Query.parse("!g rust tutorial")
    assert q.bangs == ["g"]
    assert q.simple_terms == ["rust", "tutorial"]
