"""Spell checker (role of reference crates/web-spell/src/lib.rs SpellChecker +
error_model.rs): unknown/rare terms get edit-distance candidates from the
corpus vocabulary, scored by error probability × stupid-backoff LM context."""

from __future__ import annotations

from dataclasses import dataclass, field

from ..tokenizer import tokenize
from .stupid_backoff import StupidBackoff
from .term_freqs import TermFreqs

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"
RARE_THRESHOLD = 2           # terms seen fewer times are correction candidates
CORRECTION_GAIN = 50.0       # candidate must be this much more likely


@dataclass
class Correction:
    original: str
    corrected: str
    terms: list = field(default_factory=list)  # [(text, corrected: bool)]

    def to_json(self):
        return {
            "original": self.original,
            "corrected": self.corrected,
            "highlighted": [
                {"text": t, "corrected": c} for t, c in self.terms
            ],
        }


def _edits1(word: str):
    splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
    deletes = (l + r[1:] for l, r in splits if r)
    transposes = (l + r[1] + r[0] + r[2:] for l, r in splits if len(r) > 1)
    replaces = (l + c + r[1:] for l, r in splits if r for c in _ALPHABET)
    inserts = (l + c + r for l, r in splits for c in _ALPHABET)
    return set(deletes) | set(transposes) | set(replaces) | set(inserts)


class SpellChecker:
    def __init__(self, term_freqs: TermFreqs, lm: StupidBackoff | None = None):
        self.freqs = term_freqs
        self.lm = lm

    def _candidates(self, word: str) -> set[str]:
        e1 = {w for w in _edits1(word) if self.freqs.freq(w) > RARE_THRESHOLD}
        if e1:
            return e1
        # distance-2 only when nothing at distance 1 (error model: closer is likelier)
        out = set()
        for e in _edits1(word):
            out |= {w for w in _edits1(e) if self.freqs.freq(w) > RARE_THRESHOLD}
            if len(out) > 2000:
                break
        return out

    def _score(self, word: str, context: tuple) -> float:
        if self.lm is not None:
            return self.lm.score(word, context)
        return self.freqs.prob(word)

    def correct_term(self, word: str, context: tuple = ()) -> str | None:
        if self.freqs.freq(word) > RARE_THRESHOLD:
            return None
        best, best_score = None, self._score(word, context) * CORRECTION_GAIN
        for cand in self._candidates(word):
            s = self._score(cand, context)
            if s > best_score:
                best, best_score = cand, s
        return best

    def correct(self, query: str) -> Correction | None:
        """(role of SpellChecker::correct; used by ApiSearcher spell check :340)"""
        terms = tokenize(query)
        if not terms:
            return None
        out_terms = []
        changed = False
        corrected_terms = []
        for i, t in enumerate(terms):
            ctx = tuple(corrected_terms[-2:])
            c = self.correct_term(t, ctx)
            if c is not None and c != t:
                out_terms.append((c, True))
                corrected_terms.append(c)
                changed = True
            else:
                out_terms.append((t, False))
                corrected_terms.append(t)
        if not changed:
            return None
        return Correction(query, " ".join(t for t, _ in out_terms), out_terms)
