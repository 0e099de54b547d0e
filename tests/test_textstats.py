from flagembedding_spark.functions.hashing import (
    MERSENNE_P,
    md5_prefix_long_py,
)
from flagembedding_spark.operators.textstats import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_counts,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b  c d"), (2, "x")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: (r["n_tokens_ws"], r["n_words"], r["n_tokens_distinct"])
           for r in token_counts(df).collect()}
    assert got[1] == (5, 4, 5)  # double space yields an empty token (T1 semantics)
    assert got[2] == (1, 1, 1)


def test_quality_score_ranges(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog of it is in a nice spot "
                "with many other words here to make it long enough for credit"),
            (2, "$$$ ### !!! ***"),
            (3, "word word word word word word word word word word"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in quality_score(df).collect()}
    assert got[1]["quality"] > got[2]["quality"]
    assert 0.0 <= got[2]["quality"] <= 1.0
    assert got[3]["distinct_ratio"] == 0.1
    assert got[2]["stopword_ratio"] == 0.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of it"),
            (2, "el gato y la casa de los perros en un lugar"),
            (3, "der hund und die katze ist nicht da"),
            (4, "le chat et les chiens est une idee"),
            (5, "xyzzy plugh foobar"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "und"}


def test_doc_fingerprint_matches_brute(spark):
    df = spark.createDataFrame(
        [(1, "  Foo   BAR baz "), (2, "foo bar baz"), (3, "baz bar foo")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["fp_md5"], r["fp_roll"]) for r in doc_fingerprint(df).collect()}
    # normalization collapses case/whitespace → 1 and 2 identical
    assert got[1] == got[2]
    # rolling hash is order-sensitive → 3 differs
    assert got[3][1] != got[2][1]

    def brute_roll(text):
        toks = " ".join(text.lower().split()).split(" ")
        acc = 0
        for t in toks:
            acc = (acc * 1_000_003 + md5_prefix_long_py(t) % MERSENNE_P) % MERSENNE_P
        return acc

    assert got[2][1] == brute_roll("foo bar baz")
    assert got[3][1] == brute_roll("baz bar foo")


def test_positional_postings_and_phrase_match(spark):
    """Positions and phrase occurrence counts vs brute-force Python."""
    from flagembedding_spark.operators.positions import (
        phrase_match_batch,
        phrase_occurrences,
        positional_postings,
    )

    docs = [
        (0, "a b a b a"),
        (1, "a a a"),
        (2, "b b b a b"),
        (3, "c"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pos = positional_postings(df).cache()

    got = {(r["docid"], r["term"]): (r["tf"], r["positions"]) for r in pos.collect()}
    for i, t in docs:
        toks = t.split(" ")
        for term in set(toks):
            want = [p for p, x in enumerate(toks) if x == term]
            assert got[(i, term)] == (len(want), want), (i, term)

    def brute(phrase):
        pt = phrase.split(" ")
        out = {}
        for i, t in docs:
            toks = t.split(" ")
            n = sum(
                1
                for s in range(len(toks) - len(pt) + 1)
                if toks[s:s + len(pt)] == pt
            )
            if n:
                out[i] = n
        return out

    for phrase in ("a b", "a b a", "b b", "a", "c", "z q"):
        got_p = {r["docid"]: r["n_occ"]
                 for r in phrase_occurrences(pos, phrase).collect()}
        assert got_p == brute(phrase), phrase

    batch = phrase_match_batch(pos, [("q1", "a b"), ("q2", "b b")]).collect()
    got_b = {(r["qid"], r["docid"]): r["n_occ"] for r in batch}
    assert got_b == {("q1", 0): 2, ("q1", 2): 1, ("q2", 2): 2}


def test_lang_id_multilingual(spark):
    """Script-range + stopword two-stage rule labels every fixture language
    correctly (the oracle only proves Spark==DuckDB; this pins the truth)."""
    from flagembedding_spark.entries_pipeline import LANG_FIXTURE
    from flagembedding_spark.operators.textstats import lang_id

    df = spark.createDataFrame(LANG_FIXTURE, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    want = {1: "en", 2: "es", 3: "de", 4: "fr", 5: "it", 6: "pt", 7: "nl",
            8: "ru", 9: "zh", 10: "ja", 11: "ko", 12: "ar", 13: "hi",
            14: "el", 15: "und"}
    assert got == want
