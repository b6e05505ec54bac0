"""Spell-model training from web text (role of reference web-spell
FirstTrainer/SecondTrainer + entrypoint/web_spell.rs: first pass counts term
freqs per chunk, second pass merges + builds the LM)."""

from __future__ import annotations

import os

from .stupid_backoff import StupidBackoff
from .term_freqs import TermFreqs


class FirstTrainer:
    """Per-chunk pass: term freqs + n-grams from page text."""

    def __init__(self):
        self.freqs = TermFreqs()
        self.lm = StupidBackoff()

    def observe(self, text: str) -> None:
        self.freqs.observe_text(text)
        self.lm.observe_text(text)

    def save(self, dir_path: str, chunk: int) -> None:
        self.freqs.save(os.path.join(dir_path, f"freqs_{chunk:04d}.bin"))
        self.lm.save(os.path.join(dir_path, f"lm_{chunk:04d}.bin"))


class SecondTrainer:
    """Merge pass → final checker artifacts."""

    @staticmethod
    def merge(dir_path: str, out_dir: str) -> None:
        freqs = TermFreqs()
        lm = StupidBackoff()
        for name in sorted(os.listdir(dir_path)):
            p = os.path.join(dir_path, name)
            if name.startswith("freqs_"):
                freqs.merge(TermFreqs.load(p))
            elif name.startswith("lm_"):
                lm.merge(StupidBackoff.load(p))
        os.makedirs(out_dir, exist_ok=True)
        freqs.save(os.path.join(out_dir, "term_freqs.bin"))
        lm.save(os.path.join(out_dir, "lm.bin"))


def train_from_index(index, out_dir: str) -> None:
    """Build spell artifacts from an index's stored docs (role of
    entrypoint/web_spell.rs run)."""
    t = FirstTrainer()
    for seg in index.segments:
        for doc_id in range(seg.num_docs):
            stored = seg.stored_doc(doc_id)
            t.observe(stored.get("title", "") + "\n" + stored.get("clean_text", ""))
    os.makedirs(out_dir, exist_ok=True)
    t.freqs.save(os.path.join(out_dir, "term_freqs.bin"))
    t.lm.save(os.path.join(out_dir, "lm.bin"))


def load_checker(dir_path: str):
    from .checker import SpellChecker

    return SpellChecker(
        TermFreqs.load(os.path.join(dir_path, "term_freqs.bin")),
        StupidBackoff.load(os.path.join(dir_path, "lm.bin")),
    )
