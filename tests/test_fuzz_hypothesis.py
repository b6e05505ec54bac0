"""Hypothesis-driven fuzzing of every untrusted-input parser (role of the
reference's cargo-fuzz targets: fuzz/fuzz_targets/{query_parser,robotstxt,
rss,atom}.rs and its proptest suites).

Property under test is uniform: arbitrary input NEVER crashes/hangs the
parser, and structured round-trips preserve meaning. `tools/fuzz.py` runs the
same corpus generators for longer, coverage-hungry sessions."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

fuzz_settings = settings(
    max_examples=300, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much],
)


# ---- query parser (fuzz_targets/query_parser.rs) ------------------------------

query_fragments = st.one_of(
    st.text(max_size=20),
    st.sampled_from([
        "site:", "intitle:", "inbody:", "inurl:", "exacturl:", "-", "!", "!!",
        '"', "||", ":", "  ", "\t", "\x00", "site:a.com", '"unterminated',
        "a||b||", "||", "-site:", "!g", "🦀", "\\", "((", "a" * 300,
    ]),
)


@fuzz_settings
@given(st.lists(query_fragments, max_size=8).map(" ".join))
def test_query_parser_never_crashes(q):
    from stract_tpu.query import Query
    from stract_tpu.query.parser import parse_terms

    parse_terms(q)
    query = Query.parse(q)
    query.context()  # group planning must also hold


@fuzz_settings
@given(st.text(max_size=200))
def test_query_parser_arbitrary_text(q):
    from stract_tpu.query import Query

    Query.parse(q).context()


# ---- optics DSL (reference optics parser + query/optic.rs compilation) --------

optic_fragments = st.one_of(
    st.text(max_size=12),
    st.sampled_from([
        "Rule", "{", "}", "Matches", "Action", "(", ")", ";", ",",
        'Site("a")', 'Site("|a|")', "Boost(1)", "Downrank(2)", "Discard",
        'Like(Site("x.com"));', "DiscardNonMatching;", '"', "//", "/*",
        'Url("*")', 'Content("x")',
    ]),
)


@fuzz_settings
@given(st.lists(optic_fragments, max_size=12).map(" ".join))
def test_optic_parser_never_crashes(src):
    from stract_tpu.optics import Optic
    from stract_tpu.optics.optic import OpticError

    try:
        o = Optic.parse(src)
    except OpticError:
        return
    # parsed optics must compile + serialize + re-parse
    o.compile_groups()
    Optic.parse(o.to_string())


@fuzz_settings
@given(st.data())
def test_optic_roundtrip(data):
    """Structured optics round-trip through to_string → parse."""
    from stract_tpu.optics.optic import Action, HostRankings, Matching, MatchLocation, Optic, Rule

    locs = list(MatchLocation)
    pattern = st.text(
        alphabet=st.characters(blacklist_characters='"\\', blacklist_categories=("Cs",)),
        max_size=12,
    )
    n_rules = data.draw(st.integers(0, 3))
    rules = []
    for _ in range(n_rules):
        blocks = [
            [Matching(data.draw(st.sampled_from(locs)), data.draw(pattern))]
            for _ in range(data.draw(st.integers(1, 2)))
        ]
        kind = data.draw(st.sampled_from(["boost", "downrank", "discard"]))
        rules.append(Rule(blocks, Action(kind, data.draw(st.integers(0, 9)))))
    o = Optic(
        rules=rules,
        host_rankings=HostRankings(liked=data.draw(st.lists(st.sampled_from(["a.com", "b.org"]), max_size=2))),
        discard_non_matching=data.draw(st.booleans()),
    )
    o2 = Optic.parse(o.to_string())
    assert o2.discard_non_matching == o.discard_non_matching
    assert len(o2.rules) == len(o.rules)  # (blocked=[] here, no extra rules)
    assert o2.host_rankings.liked == o.host_rankings.liked


# ---- robots.txt (fuzz_targets/robotstxt.rs; RFC 9309) --------------------------

robots_lines = st.one_of(
    st.text(max_size=30),
    st.builds(
        lambda k, v: f"{k}: {v}",
        st.sampled_from(["User-agent", "Allow", "Disallow", "Crawl-delay", "Sitemap",
                         "user-AGENT", "disallow", "#comment", ""]),
        st.text(max_size=20),
    ),
)


@fuzz_settings
@given(st.lists(robots_lines, max_size=20).map("\n".join),
       st.text(max_size=10), st.text(max_size=30))
def test_robots_never_crashes(content, agent, path):
    from stract_tpu.crawler.robots import Robots

    r = Robots.parse(content)
    assert r.is_allowed(agent, path) in (True, False)
    r.crawl_delay(agent)


# ---- feeds (fuzz_targets/{rss,atom}.rs) ----------------------------------------

xml_fragments = st.one_of(
    st.text(max_size=30),
    st.sampled_from([
        "<rss>", "</rss>", "<channel>", "<item>", "<title>t</title>",
        "<link>h</link>", "<feed xmlns='http://www.w3.org/2005/Atom'>",
        "<entry>", "<?xml version='1.0'?>", "<![CDATA[x]]>", "&amp;", "&bogus;",
        "<a", "</", "<!DOCTYPE", "\x00", "<item><title>", "<guid isPermaLink",
    ]),
)


@fuzz_settings
@given(st.lists(xml_fragments, max_size=16).map("".join))
def test_feed_parser_never_crashes(content):
    from stract_tpu.feed import parse_feed

    try:
        feed = parse_feed(content)
    except ValueError:
        return
    for e in feed.items:
        assert isinstance(e.url, str)


@fuzz_settings
@given(st.binary(max_size=200))
def test_feed_parser_binary(content):
    from stract_tpu.feed import parse_feed

    try:
        parse_feed(content)
    except (ValueError, UnicodeDecodeError):
        pass


# ---- ZIM reader (zimba fuzz surface) --------------------------------------------

@fuzz_settings
@given(st.binary(max_size=300))
def test_zim_reader_garbage(tmp_path_factory, data):
    import os

    from stract_tpu.zim import ZimFile

    p = str(tmp_path_factory.mktemp("zim") / "f.zim")
    with open(p, "wb") as fh:
        fh.write(data)
    try:
        z = ZimFile(p)
        for i, _ in zip(range(3), z.articles()):
            pass
    except (ValueError, EOFError, OSError, KeyError, IndexError):
        pass
    finally:
        os.unlink(p)


# ---- WARC reader ------------------------------------------------------------------

@fuzz_settings
@given(st.binary(max_size=300))
def test_warc_reader_garbage(tmp_path_factory, data):
    import gzip
    import os

    from stract_tpu.warc import WarcReader

    p = str(tmp_path_factory.mktemp("warc") / "f.warc.gz")
    with open(p, "wb") as fh:
        fh.write(gzip.compress(data) if data and data[0] % 2 else data)
    try:
        for _ in WarcReader.open(p):
            pass
    except (ValueError, EOFError, OSError, gzip.BadGzipFile, UnicodeDecodeError):
        pass
    finally:
        os.unlink(p)


@fuzz_settings
@given(st.dictionaries(st.binary(min_size=1, max_size=40),
                       st.binary(max_size=200), min_size=0, max_size=40),
       st.lists(st.binary(min_size=1, max_size=40), max_size=10))
def test_kv_db_roundtrip_props(tmp_path_factory, items, probes):
    """speedy-kv role property: any byte keys/values round-trip through
    write→reopen→get; absent keys return None; iteration yields exactly the
    inserted set (reference speedy-kv proptests)."""
    import shutil

    from stract_tpu.kv import Db

    path = str(tmp_path_factory.mktemp("kvp"))
    db = Db.open(path)
    for k, v in items.items():
        db.insert_raw(k, v)
    db.commit()

    reopened = Db.open(path)
    assert len(reopened) == len(items)
    for k, v in items.items():
        assert reopened.get_raw(k) == v
    for p in probes:
        if p not in items:
            assert reopened.get_raw(p) is None
    assert {bytes(k) for k, _ in reopened.items_raw()} == set(items)
    shutil.rmtree(path, ignore_errors=True)


@fuzz_settings
@given(st.dictionaries(st.binary(min_size=1, max_size=20),
                       st.binary(max_size=50), min_size=1, max_size=15),
       st.dictionaries(st.binary(min_size=1, max_size=20),
                       st.binary(max_size=50), min_size=1, max_size=15))
def test_kv_db_overwrite_across_commits(tmp_path_factory, first, second):
    """Later commits shadow earlier values for the same key (segment order)."""
    import shutil

    from stract_tpu.kv import Db

    path = str(tmp_path_factory.mktemp("kvo"))
    db = Db.open(path)
    for k, v in first.items():
        db.insert_raw(k, v)
    db.commit()
    for k, v in second.items():
        db.insert_raw(k, v)
    db.commit()

    reopened = Db.open(path)
    expect = {**first, **second}
    for k, v in expect.items():
        assert reopened.get_raw(k) == v, k
    shutil.rmtree(path, ignore_errors=True)
