"""Snippet generation — passage-BM25 selection + highlighting (shared cases
with reference snippet.rs tests: snippet_during_search, stemmed highlight,
empty query/text, fuzz no-crash)."""

import pytest

from stract_tpu.snippet import (
    DESIRED_NUM_CHARS,
    DELTA_NUM_CHARS,
    TextSnippet,
    generate,
    sentence_passages,
)


def test_best_passage_selected_not_prefix():
    """The highest-BM25 sentence wins even when it is deep in the document
    (the old implementation's fixed word window preferred early text)."""
    filler = "This sentence talks about completely unrelated filler topics. " * 5
    hit = "The migratory patterns of arctic terns are remarkable across hemispheres."
    text = filler + hit + " More filler trails the relevant sentence afterwards."
    snip = generate(["arctic", "terns"], text)
    assert "arctic" in snip.text()
    assert "<b>" in snip.html()


def test_multi_fragment_extension_to_desired_length():
    """A short best passage is extended with the FOLLOWING passages until the
    desired window (reference snippet.rs:276-287)."""
    text = ("Cats sleep a lot. " * 2
            + "Dogs bark loudly at night. "
            + "Another sentence follows here with more detail about the dogs. "
            + "And yet another sentence that pads the document further along. "
            + "Final thoughts conclude the article with a summary of everything.")
    snip = generate(["dogs"], text)
    out = snip.text()
    assert "Dogs bark loudly" in out
    # extended beyond the single best sentence
    assert len(out) >= DESIRED_NUM_CHARS - DELTA_NUM_CHARS or "Final" in out
    assert len(out) <= DESIRED_NUM_CHARS + DELTA_NUM_CHARS + 2  # + ellipsis


def test_highlight_marks_query_terms_only():
    snip = generate(["rust"], "The rust programming language is fast. " * 3)
    for t, hl in snip.fragments:
        if hl:
            assert "rust" in t.lower()
    assert any(hl for _, hl in snip.fragments)


def test_stemmed_fallback_highlight():
    """No exact token match → the stemmed pass highlights (snippet.rs:295)."""
    snip = generate(["running"], "She runs marathons every single weekend in town.")
    assert any(hl for _, hl in snip.fragments), snip.fragments


def test_empty_query_returns_leading_words():
    text = "word " * 100
    snip = generate([], text)
    assert snip.text().startswith("word")
    assert len(snip.text().split()) <= 51


def test_empty_text():
    assert generate(["q"], "").text() == ""


def test_description_fallback():
    snip = generate(["banana"], "", description="A banana is a yellow fruit enjoyed worldwide.")
    assert "banana" in snip.text()


def test_sentence_passages_skips_abbreviations():
    parts = sentence_passages("Dr. Smith went to town yesterday. He bought groceries and supplies.")
    assert parts[0].startswith("Dr. Smith")
    assert len(parts) == 2


def test_length_window_on_long_passage():
    text = "word " * 300  # one giant passage (no sentence breaks)
    snip = generate(["word"], text)
    body = snip.text().rstrip("…")
    assert len(body) <= DESIRED_NUM_CHARS + DELTA_NUM_CHARS + 1


@pytest.mark.parametrize("text,query", [
    ("", ""),
    (".", "."),
    ("a" * 5000, "a"),
    ("?! ?! ?!", "x y z"),
    ("Mr. mr. MR. dr. ms.", "mr"),
    ("\n\n\n", "\n"),
    ("🦀 rust 🦀. crab language.", "rust"),
])
def test_fuzz_no_crash(text, query):
    snip = generate(query.split(), text)
    assert isinstance(snip, TextSnippet)
    snip.html()
