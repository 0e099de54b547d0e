"""T5/T6 Unicode normalization + tokenizer vs the REFERENCE functions
executed directly (normalize_text.py, compute_metrics.py — loaded standalone,
no reference code committed), plus JVM-column ↔ Python-twin identity."""

import importlib.util
import random
import unicodedata

import pytest

from flagembedding_spark.functions.unicode_norm import (
    has_answer_py,
    normalize_chars,
    normalize_chars_py,
    simple_tokens_py,
    simple_word_tokens,
)

REF_DIR = "/root/reference/FlagEmbedding/evaluation/mkqa/utils"


def _load_ref(name):
    spec = importlib.util.spec_from_file_location(f"ref_{name}", f"{REF_DIR}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SAMPLES = [
    "Le Café de Flore",
    "Le Café de Flore",   # decomposed
    "Zürich’s finest — truly",
    "ANSWER: QUICK-FOX jumps",
    "watch x … y run",
    "a ″prime″ and ⁗more⁗",
    "odd . . . dots . . . here",
    "slash⁄styles∕vary",
    "العربية text 42 m²!",
    "",
]


@pytest.fixture(scope="module")
def ref_norm():
    return _load_ref("normalize_text").normalize_text


@pytest.fixture(scope="module")
def ref_metrics():
    return _load_ref("compute_metrics")


def test_normalize_chars_py_matches_reference(ref_norm):
    pool = list(
        "abc XYZ 123 ‐‑⁃‒–—―−－⁻“”„‟‘’‚‛՚Ꞌꞌ＇`´′‵″‶‴‷⁗…/⁄∕­ . "
    )
    rng = random.Random(7)
    cases = SAMPLES + [
        "".join(rng.choice(pool) for _ in range(rng.randint(0, 80)))
        for _ in range(300)
    ]
    for t in cases:
        assert normalize_chars_py(t) == ref_norm(t), repr(t)


def test_simple_tokens_match_reference_tokenizer(ref_metrics):
    tok = ref_metrics.SimpleTokenizer()
    for t in SAMPLES:
        for text in (t, unicodedata.normalize("NFD", t)):
            assert simple_tokens_py(text) == tok.tokenize(text, uncased=True), repr(text)


def test_has_answer_matches_reference(ref_metrics):
    tok = ref_metrics.SimpleTokenizer()
    cases = [
        (["café"], "Le Café de Flore"),
        (["café"], "Le Café de Flore"),        # decomposed text
        (["cafe"], "Le Café de Flore"),         # no hit: e != é even NFD
        (["quick-fox"], "ANSWER: QUICK-FOX jumps"),
        (["zzz", "x … y"], "watch x … y run"),
        ([""], "anything"),                      # empty answer skipped
        (["de flore"], "Le Café de Flore"),
    ]
    for answers, text in cases:
        assert has_answer_py(answers, text) == ref_metrics.has_answer(
            answers, text, tok
        ), (answers, text)


def test_jvm_twins_match_python(spark):
    df = spark.createDataFrame([(t,) for t in SAMPLES], ["text"])
    from pyspark.sql import functions as F

    rows = df.select(
        "text",
        normalize_chars("text").alias("norm"),
        simple_word_tokens("text").alias("toks"),
    ).collect()
    for r in rows:
        assert r["norm"] == normalize_chars_py(r["text"]), repr(r["text"])
        assert r["toks"] == simple_tokens_py(r["text"]), repr(r["text"])


def test_containment_entry_expected_hits(spark):
    """The oracle-fixture entry produces exactly the planted hits."""
    from flagembedding_spark.entries_pipeline import q_qa_containment_unicode

    rows = q_qa_containment_unicode(spark, "unused").collect()
    got = {(r["qid"], r["docid"]): r["contains"] for r in rows}
    want_hits = {("u1", 1), ("u1", 2), ("u2", 3), ("u3", 5), ("u4", 6)}
    assert {k for k, v in got.items() if v == 1} == want_hits
    assert len(got) == 30
