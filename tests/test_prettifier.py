"""Rich snippets (role of reference search_prettifier/stack_overflow.rs tests):
QAPage schema.org → StackOverflowQA blocks, end-to-end through retrieve +
serialization."""

import json

from stract_tpu.prettifier import rich_snippet, stackoverflow_qa


def so_schema():
    return [{
        "@type": "QAPage",
        "mainEntity": {
            "@type": "Question",
            "text": ["How do I frobnicate?", {"@type": "Code", "text": "frob(x)"}],
            "acceptedAnswer": {
                "@type": "Answer",
                "text": ["Use the builtin.", {"@type": "Code", "text": "frob2(x)"}],
                "dateCreated": "2020-01-02T10:00:00",
                "upvoteCount": "42",
                "url": "https://stackoverflow.com/a/1",
            },
            "suggestedAnswer": [
                {"@type": "Answer", "text": "Alternative way.",
                 "dateCreated": "2021-03-04T11:00:00", "upvoteCount": "7",
                 "url": "https://stackoverflow.com/a/2"},
                {"@type": "Answer", "text": "Missing fields answer"},
            ],
        },
    }]


def test_stackoverflow_qa_extraction():
    qa = stackoverflow_qa(so_schema())
    assert qa["type"] == "stackOverflowQA"
    assert qa["question"]["body"][0] == {"kind": "text", "value": "How do I frobnicate?"}
    assert qa["question"]["body"][1] == {"kind": "code", "value": "frob(x)"}
    assert len(qa["answers"]) == 2  # malformed suggestedAnswer dropped
    acc = qa["answers"][0]
    assert acc["accepted"] and acc["upvotes"] == 42 and acc["date"] == "2020-01-02"
    assert acc["body"][1]["kind"] == "code"
    assert not qa["answers"][1]["accepted"]


def test_rich_snippet_requires_stackoverflow_root_domain():
    """Gate is registrable-domain equality on the result URL
    (search_prettifier/mod.rs:170) — substring matches must NOT pass."""
    w = {"url": "https://example.com/q", "domain": "example.com",
         "schema_org_json": json.dumps(so_schema())}
    assert rich_snippet(w) is None
    # substring-containing hosts/paths are attacker-controllable
    for url in ("https://attacker.io/stackoverflow.com",
                "https://notstackoverflow.com/q",
                "https://stackoverflow.com.evil.io/q"):
        assert rich_snippet({**w, "url": url}) is None
    for url in ("https://stackoverflow.com/q/1",
                "https://es.stackoverflow.com/q/1"):
        assert rich_snippet({**w, "url": url}) is not None


def test_rich_snippet_rejects_non_http_answer_url():
    items = so_schema()
    items[0]["mainEntity"]["acceptedAnswer"]["url"] = "javascript:alert(1)"
    w = {"url": "https://stackoverflow.com/q/1",
         "schema_org_json": json.dumps(items)}
    snip = rich_snippet(w)
    assert snip is not None
    assert all(not a["accepted"] for a in snip["answers"])


def test_rich_snippet_none_on_non_qa_schema():
    w = {"url": "https://stackoverflow.com/q/1", "domain": "stackoverflow.com",
         "schema_org_json": json.dumps([{"@type": "WebSite"}])}
    assert rich_snippet(w) is None


def test_serialized_through_api(tmp_path):
    """A stackoverflow QAPage doc surfaces richSnippet in the HTTP-shape
    response dict via ApiSearcher._serialize_page."""
    import sys
    sys.path.insert(0, "tests")
    from conftest import make_doc

    from stract_tpu.index import InvertedIndex
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher
    from stract_tpu.searcher.query import SearchQuery

    idx = InvertedIndex(str(tmp_path))
    doc = make_doc(url="https://stackoverflow.com/questions/1/frobnicate",
                   title="How do I frobnicate",
                   body="How do I frobnicate a thing in python")
    doc["schema_org_json"] = json.dumps(so_schema())
    idx.insert(doc)
    idx.commit()
    api = ApiSearcher(LocalShardedSearcher([LocalSearcher(idx, 0)]))
    res = api.search_websites(SearchQuery(query="frobnicate"))
    assert res.webpages
    qa = res.webpages[0].get("richSnippet")
    assert qa and qa["type"] == "stackOverflowQA"
    assert qa["answers"][0]["upvotes"] == 42


def test_microdata_repeated_props_collect():
    """Repeated itemprops become lists; nested scopes keep their properties
    (QAPage markup has several suggestedAnswer scopes)."""
    from lxml import html as lhtml

    from stract_tpu.webpage.schema_org import parse_microdata

    doc = lhtml.fromstring("""
    <div itemscope itemtype="https://schema.org/Question">
      <span itemprop="name">Q</span>
      <div itemprop="suggestedAnswer" itemscope itemtype="https://schema.org/Answer">
        <span itemprop="text">a1</span></div>
      <div itemprop="suggestedAnswer" itemscope itemtype="https://schema.org/Answer">
        <span itemprop="text">a2</span></div>
    </div>""")
    items = parse_microdata(doc)
    assert len(items) == 1
    q = items[0]
    assert q["name"] == "Q"
    assert isinstance(q["suggestedAnswer"], list) and len(q["suggestedAnswer"]) == 2
    assert q["suggestedAnswer"][0]["text"] == "a1"
    assert "text" not in q  # nested answer text must not leak to the parent


def test_stackoverflow_sidebar_end_to_end(tmp_path):
    """sidebar_for falls through to the stackoverflow-optic search when no
    entity matches: Domain+Schema optic filter, threshold gate, accepted
    answer extracted (reference searcher/api/sidebar.rs:109-173)."""
    import sys
    sys.path.insert(0, "tests")
    from conftest import make_doc

    from stract_tpu.index import InvertedIndex
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher

    idx = InvertedIndex(str(tmp_path))
    so = make_doc(url="https://stackoverflow.com/questions/1/frobnicate",
                  title="How do I frobnicate",
                  body="How do I frobnicate a thing in python",
                  host_centrality=0.9)
    schema = so_schema()
    schema[0]["mainEntity"]["name"] = "How do I frobnicate"
    so["schema_org_json"] = json.dumps(schema)
    idx.insert(so)
    # a non-SO doc that also matches the query must be filtered by the optic
    idx.insert(make_doc(url="https://blog.example.com/frobnicate",
                        title="frobnicate thoughts", body="frobnicate musings python",
                        host_centrality=0.95))
    idx.commit()
    api = ApiSearcher(LocalShardedSearcher([LocalSearcher(idx, 0)]))
    sb = api.sidebar_for("frobnicate python")
    assert sb is not None and sb["type"] == "stackOverflow"
    assert sb["title"] == "How do I frobnicate"
    assert sb["answer"]["accepted"] and sb["answer"]["upvotes"] == 42

    # no QAPage anywhere → no sidebar
    assert api.sidebar_for("musings") is None

    # threshold gate is NORMALIZED title coverage, not the raw fused score: a
    # QAPage matching only in the body (0 of the query's terms in its title)
    # stays below the 0.5 gate even though its fused score is far above it
    assert api.sidebar_for("python thing") is None
