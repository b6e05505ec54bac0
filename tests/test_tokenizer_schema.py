from stract_tpu.tokenizer import tokenize
from stract_tpu.schema import TEXT_FIELDS, NUMERICAL_FIELDS, text_field, numerical_field
from stract_tpu.ranking import SIGNALS, NUM_SIGNALS, signal


def test_default_tokenizer():
    assert tokenize("Hello, World! 123") == ["hello", "world", "123"]
    assert tokenize("") == []
    assert tokenize("ÆbleGrød") == ["æblegrød"]


def test_stemmed_tokenizer():
    assert tokenize("running quickly", "stemmed") == ["run", "quick"]


def test_identity_tokenizer():
    assert tokenize(" Hello World ", "identity") == ["hello world"]
    assert tokenize("", "identity") == []


def test_bigram_trigram():
    assert tokenize("a b c", "bigram") == ["ab", "bc"]
    assert tokenize("a b c d", "trigram") == ["abc", "bcd"]
    assert tokenize("a", "bigram") == []


def test_url_tokenizer():
    assert tokenize("https://Sub.Example.com/a/b-c?q=1", "url") == [
        "sub", "example", "com", "a", "b", "c", "q", "1",
    ]


def test_newline_tokenizer():
    assert tokenize("Rust\nSearch Engine\n", "newline") == ["rust", "search engine"]


def test_json_tokenizer():
    toks = tokenize("Recipe.name=Pasta Carbonara", "json")
    assert "recipe.name" in toks
    assert "pasta" in toks


def test_schema_counts_match_reference():
    # reference has 47 text fields (schema/text_field.rs:161-215)
    assert len(TEXT_FIELDS) == 47
    # and 40 numerical fields (schema/numerical_field.rs:134-175)
    assert len(NUMERICAL_FIELDS) == 40
    assert len(SIGNALS) == 46  # SignalEnum variants (signals/mod.rs:108-155)


def test_field_ids_stable():
    assert text_field("title").id == 0
    assert text_field("clean_body").id == 1
    assert numerical_field("is_homepage").id == 0
    assert text_field(0).name == "title"


def test_signal_ids_match_reference_order():
    assert signal(0).name == "bm25_f"
    assert signal("lambda_mart").default_coefficient == 10.0
    assert signal("host_centrality").default_coefficient == 2.0
    assert not signal("cross_encoder_snippet").core
