"""Trained spelling error model (reference web-spell/src/error_model.rs +
spell_checker.rs:78-170): edit-sequence probabilities learned from corpus-
harvested (misspelling → correction) pairs, used in candidate scoring."""

from stract_tpu.spell.error_model import ErrorModel, possible_errors
from stract_tpu.spell.trainer import FirstTrainer, train_error_model
from stract_tpu.spell.checker import SpellChecker


def test_possible_errors_reference_semantics():
    assert possible_errors("hello", "hello") is None
    assert possible_errors("helo", "hello") == (("ins", "l"),)
    assert possible_errors("helllo", "hello") == (("del", "l"),)
    assert possible_errors("leff", "left") == (("sub", "f", "t"),)
    # transposition surfaces as two substitutions under plain Levenshtein,
    # exactly as the reference's backtrace produces (error_model.rs:42-115)
    assert possible_errors("teh", "the") == (("sub", "h", "e"), ("sub", "e", "h"))


def test_error_model_log_prob_smoothing():
    em = ErrorModel()
    em.add("leff", "left")
    em.add("shiff", "shift")
    em.add("laff", "last")  # different sequence
    seen = em.log_prob((("sub", "f", "t"),))
    unseen = em.log_prob((("sub", "f", "z"),))
    assert seen > unseen
    # seen twice → log2(2) − log2(total+1); unseen → −log2(total+1)
    assert abs((seen - unseen) - 1.0) < 1e-9


def test_error_model_roundtrip(tmp_path):
    em = ErrorModel()
    em.add("leff", "left")
    em.add("teh", "the")
    p = str(tmp_path / "error_model.json")
    em.save(p)
    back = ErrorModel.load(p)
    assert back.total == em.total
    assert back.log_prob((("sub", "f", "t"),)) == em.log_prob((("sub", "f", "t"),))


class FakeIndex:
    """Minimal stored-doc iterable for the trainer."""

    class Seg:
        def __init__(self, texts):
            self.texts = texts
            self.num_docs = len(texts)

        def stored_doc(self, d):
            return {"title": "", "clean_text": self.texts[d]}

    def __init__(self, texts):
        self.segments = [self.Seg(texts)]


def corpus_texts():
    texts = []
    # frequent vocabulary with contexts
    for i in range(30):
        texts.append("please turn left at the corner")
        texts.append("press shift and type fast")
        texts.append("the cat sleeps on the mat")
    # make 'car' a bit more frequent than 'cat' (the uniform baseline will
    # prefer it for the ambiguous misspelling below)
    for i in range(40):
        texts.append("the car sleeps in the garage")
    for i in range(10):
        texts.append("a craft beer and a soft gift for the raft loft")
    # planted real-world misspellings: f→t substitutions the corpus exhibits
    texts.append("please turn leff at the corner")
    texts.append("press shiff and type fast")
    texts.append("please turn leff at the corner now")
    texts.append("a craff beer today")
    texts.append("a soff gift basket")
    texts.append("a giff for the party")
    texts.append("the raff floats and the loff is high")
    return texts


def build_checkers():
    idx = FakeIndex(corpus_texts())
    t = FirstTrainer()
    for seg in idx.segments:
        for d in range(seg.num_docs):
            t.observe(seg.stored_doc(d)["clean_text"])
    em = train_error_model(idx, t.freqs, t.lm, min_correction_freq=5)
    uniform = SpellChecker(t.freqs, t.lm)
    trained = SpellChecker(t.freqs, t.lm, error_model=em)
    return uniform, trained, em


def test_harvest_finds_planted_pairs():
    _, _, em = build_checkers()
    assert em.errors.get((("sub", "f", "t"),), 0) >= 2  # leff→left, shiff→shift


def test_trained_model_beats_uniform_on_learned_edit():
    """'caf' between equally-plausible cat/car: the corpus taught the model
    that f→t substitutions happen (leff→left, shiff→shift), so the trained
    checker picks 'cat' while the uniform baseline follows raw frequency to
    'car'."""
    uniform, trained, em = build_checkers()
    # both candidates reachable at distance 1; car is more frequent
    u = uniform.correct_term("caf", ("the",))
    t = trained.correct_term("caf", ("the",))
    assert u == "car"  # frequency-only baseline goes wrong
    assert t == "cat"  # learned edit statistics pick the plausible edit


def test_ab_on_misspelling_set():
    """Accuracy A/B on a misspelling set generated with the corpus's own
    error pattern (f→t): trained ≥ uniform, strictly better overall."""
    uniform, trained, _ = build_checkers()
    cases = [("leff", "left"), ("shiff", "shift"), ("caf", "cat"),
             ("lefx", "left"), ("maf", "mat")]
    score = lambda ch: sum(
        1 for bad, good in cases if ch.correct_term(bad, ()) == good)
    assert score(trained) > score(uniform)
