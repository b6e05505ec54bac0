"""Snippet generation (role of reference snippet.rs, 598 LoC).

Host-side, string-heavy by nature: picks the best window of the stored clean
text around query-term matches and marks match spans. Capped at
max_considered_words (reference configs/search_server.toml:13 uses 10_000).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .tokenizer import tokenize

MAX_CONSIDERED_WORDS = 10_000
SNIPPET_WORDS = 40


@dataclass
class TextSnippet:
    fragments: list = field(default_factory=list)  # [(text, is_highlighted)]

    def text(self) -> str:
        return "".join(t for t, _ in self.fragments)

    def html(self) -> str:
        out = []
        for t, hl in self.fragments:
            esc = t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            out.append(f"<b>{esc}</b>" if hl else esc)
        return "".join(out)


def generate(query_terms: list[str], text: str, description: str = "", dirty_text: str = "") -> TextSnippet:
    body = text or description or dirty_text
    if not body:
        return TextSnippet([("", False)])

    words = body.split()[:MAX_CONSIDERED_WORDS]
    if not words:
        return TextSnippet([("", False)])

    qset = {t.lower() for t in query_terms}
    stemmed_q = set()
    try:
        from .tokenizer.stemmer import stem

        stemmed_q = {stem(t) for t in qset}
    except Exception:
        pass

    cache: dict = {}

    def is_match(w: str) -> bool:
        # memoized per call: body words repeat heavily and each miss costs a
        # regex tokenizer pass
        v = cache.get(w)
        if v is None:
            toks = tokenize(w)
            v = any(t in qset or t in stemmed_q for t in toks)
            cache[w] = v
        return v

    match_flags = [is_match(w) for w in words]

    # Best window of SNIPPET_WORDS by number of matches (first window wins ties,
    # preferring early text like the reference).
    best_start, best_score = 0, -1
    window = SNIPPET_WORDS
    score = sum(match_flags[:window])
    best_score = score
    for i in range(1, max(len(words) - window + 1, 1)):
        score += (match_flags[i + window - 1] if i + window - 1 < len(words) else 0) - match_flags[i - 1]
        if score > best_score:
            best_score, best_start = score, i

    frag_words = words[best_start : best_start + window]
    frag_flags = match_flags[best_start : best_start + window]
    fragments = []
    buf: list[str] = []
    cur_hl = False
    for w, hl in zip(frag_words, frag_flags):
        if hl != cur_hl and buf:
            fragments.append((" ".join(buf) + " ", cur_hl))
            buf = []
        cur_hl = hl
        buf.append(w)
    if buf:
        fragments.append((" ".join(buf), cur_hl))
    if best_start + window < len(words):
        fragments.append(("…", False))
    return TextSnippet(fragments)
