"""Corpus-curation operators: deterministic stratified sampling and the
composed cleaning pass (dedup keep-list + lang + quality)."""

import hashlib

from flagembedding_spark.operators.curation import (
    SAMPLE_RESOLUTION,
    clean_corpus,
    stratified_sample,
)

RATES = {"en": 0.5, "zh": 1.0, "de": 0.0}


def _u(doc_id: int, seed: int = 7) -> float:
    h = int(hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15], 16)
    return (h % SAMPLE_RESOLUTION) / SAMPLE_RESOLUTION


def _fixture(spark):
    rows = [
        (i, f"doc {i} with the and of some words here now", ["en", "zh", "de", "fr"][i % 4])
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_stratified_sample_matches_hash_rule(spark):
    df = _fixture(spark)
    got = {
        r["doc_id"] for r in stratified_sample(
            df, RATES, strata_col="lang", seed=7, default_rate=0.25
        ).collect()
    }
    want = set()
    for i in range(400):
        rate = RATES.get(["en", "zh", "de", "fr"][i % 4], 0.25)
        if _u(i) < rate:
            want.add(i)
    assert got == want
    # semantic anchors: zh fully kept, de fully dropped
    assert {i for i in range(400) if i % 4 == 1} <= got
    assert not any(i % 4 == 2 for i in got)


def test_stratified_sample_partitioning_invariant(spark):
    """Same rows kept regardless of input partitioning — the property an
    RNG-based sample does NOT have."""
    df = _fixture(spark)
    a = {r["doc_id"] for r in stratified_sample(df, RATES, "lang").collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(df.repartition(13), RATES, "lang").collect()
    }
    assert a == b


def test_stratified_sample_rate_is_roughly_honored(spark):
    df = _fixture(spark)
    kept = stratified_sample(df, {"en": 0.5}, "lang", default_rate=0.0).count()
    assert 30 <= kept <= 70  # 100 en docs at rate 0.5


def test_clean_corpus_dedups_and_thresholds(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today", "x"),
        (2, "the quick brown fox jumps over the lazy dog again and again today", "x"),
        (3, "zz zz zz zz zz zz zz", "x"),  # repetitive, low quality
        (4, "a different sentence with the usual english words in it for quality", "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {r["doc_id"]: r for r in clean_corpus(df, min_quality=0.5).collect()}
    assert 1 in out and 4 in out
    assert 2 not in out  # exact dup of 1 — keep-min-id
    assert 3 not in out  # below quality threshold
    assert out[1]["lang_pred"] == "en"


def test_clean_corpus_lang_filter(spark):
    rows = [
        (1, "the cat and the dog are in the house with all of them", "x"),
        (2, "el perro y el gato de la casa los que son una y una mas", "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    langs = {
        r["doc_id"]: r["lang_pred"]
        for r in clean_corpus(df, min_quality=0.0).collect()
    }
    assert langs[1] == "en" and langs[2] == "es"
    only_en = clean_corpus(df, min_quality=0.0, keep_langs=("en",))
    assert [r["doc_id"] for r in only_en.collect()] == [1]


def test_redact_pii_hand_checked(spark):
    from flagembedding_spark.operators.curation import redact_pii

    rows = [
        (0, "mail a.b-c_9@sub.example.io now"),
        (1, "ip 10.0.0.1 and card 4111111111111111"),
        (2, "12345678 is short, 123456789 is long"),
        (3, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[0]["redacted"] == "mail <EMAIL> now"
    assert out[1]["redacted"] == "ip <IP> and card <NUM>"
    assert out[2]["redacted"] == "12345678 is short, <NUM> is long"
    assert out[3]["redacted"] == "nothing here"
    assert [out[i]["n_redactions"] for i in range(4)] == [1, 2, 1, 0]


def test_dedup_segments_keeps_first_occurrence_order(spark):
    from flagembedding_spark.operators.curation import (
        dedup_segments_within_doc,
    )

    rows = [
        (0, "b\na\nb\nc\na"),
        (1, "x\nx\nx"),
        (2, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["cleaned"], r["n_dropped"])
        for r in dedup_segments_within_doc(df).collect()
    }
    assert out[0] == ("b\na\nc", 2)
    assert out[1] == ("x", 2)
    assert out[2] == ("solo", 0)


# ---------------------------------------------------------------------------
# round 4: decontamination + repetition stats
# ---------------------------------------------------------------------------

def test_decontaminate_hand_checked(spark):
    from pyspark.sql import functions as F

    from flagembedding_spark.operators.curation import decontaminate

    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),    # shares 'the quick brown'
            (1, "totally unrelated text here"),
            (2, "quick brown fox again quick brown fox"),  # 2 distinct matches
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox runs")], "doc_id long, text string"
    )
    got = {
        int(r["doc_id"]): int(r["n_matched_grams"])
        for r in decontaminate(train, ev, n=3).collect()
    }
    # doc0 shares 'the quick brown' + 'quick brown fox' = 2 distinct;
    # doc2 shares 'quick brown fox' = 1 (distinct shingles, repeats don't
    # double-count); doc1 clean
    assert got == {0: 2, 2: 1}


def test_repetition_stats_hand_checked(spark):
    from flagembedding_spark.operators.curation import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "a b a b a b"),     # bigrams: ab ba ab ba ab → 5 total, 2 distinct, top 3
            (1, "w x y z"),         # 3 bigrams, all distinct, top 1
            (2, "solo"),            # < 2 tokens → absent
        ],
        "doc_id long, text string",
    )
    got = {
        int(r["doc_id"]): (
            int(r["n_bigrams"]),
            float(r["dup_bigram_frac"]),
            float(r["top_bigram_frac"]),
        )
        for r in repetition_stats(docs).collect()
    }
    assert set(got) == {0, 1}
    assert got[0] == (5, round(1 - 2 / 5, 6), round(3 / 5, 6))
    assert got[1] == (3, 0.0, round(1 / 3, 6))
