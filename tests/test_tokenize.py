from pyspark.sql import functions as F

from flagembedding_spark.functions.tokenize import (
    code_tokens,
    normalize_text,
    sanitize_queries,
    stop_filter,
    whitespace_tokens,
)


def test_whitespace_split_matches_python(spark):
    """T1: must equal Python's str.split(' ') — including empty tokens from
    space runs and trailing spaces (modeling_bm25.py:164-165)."""
    samples = ["a b c", "a  b", " lead", "trail ", "", "a\nb c", "x   ", "a\tb"]
    df = spark.createDataFrame([(s,) for s in samples], ["t"])
    got = [r[0] for r in df.select(whitespace_tokens("t")).collect()]
    assert got == [s.split(" ") for s in samples]


def test_code_tokens_basic(spark):
    df = spark.createDataFrame([("def foo_bar(x1, y):\n  return x1==y",)], ["t"])
    toks = df.select(code_tokens("t")).first()[0]
    assert toks == ["def", "foo_bar", "(", "x1", ",", "y", ")", ":",
                    "return", "x1", "=", "=", "y"]


def test_code_tokens_split_identifiers(spark):
    df = spark.createDataFrame([("getFooBar snake_case_id HTTPServer",)], ["t"])
    toks = df.select(code_tokens("t", split_identifiers=True)).first()[0]
    assert "get" in toks and "foo" in toks and "bar" in toks
    assert "snake" in toks and "case" in toks and "id" in toks


def test_stop_filter_keeps_doclen_semantics(spark):
    """T3: stop tokens leave tf/df but doclen counts unfiltered tokens."""
    df = spark.createDataFrame([("the cat the dog",)], ["t"])
    out = df.select(
        F.size(whitespace_tokens("t")).alias("dl"),
        stop_filter(whitespace_tokens("t"), {"the"}).alias("toks"),
    ).first()
    assert out["dl"] == 4
    assert out["toks"] == ["cat", "dog"]


def test_sanitize_queries(spark):
    df = spark.createDataFrame(
        [("q1", "hello\nworld"), ("q2", "  \n "), ("q3", "ok")],
        ["query_id", "query"],
    )
    out = sanitize_queries(df).collect()
    got = {r["query_id"]: r["query"] for r in out}
    assert set(got) == {"q1", "q3"}
    assert got["q1"] == "hello world"


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Foo   BAR\tbaz ",)], ["t"])
    assert df.select(normalize_text("t")).first()[0] == "foo bar baz"


def test_xxhash64_py_parity(spark):
    """Driver-side xxhash64 twin must be bit-identical to Spark's xxhash64
    for strings (every length class: <4, 4-7, 8-31, >=32 bytes; unicode),
    and the pmod composition must match pmod(xxhash64(term), n) — the plan
    construction fast path (wand.candidate_block_plan bucket pruning)
    depends on it."""
    from pyspark.sql import functions as F

    from flagembedding_spark.functions.hashing import (
        pmod_xxhash64_py,
        xxhash64_py,
    )

    cases = (
        ["", "a", "ab", "abc", "abcd", "def", "return", "self", "("]
        + ["x" * n for n in (5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 100)]
        + ["héllo wörld", "日本語のテスト文字列です少し長めに", "needle_0",
           "get_er_0", "a b", "term^2"]
    )
    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    rows = df.select(
        "s",
        F.xxhash64("s").alias("h"),
        F.pmod(F.xxhash64("s"), F.lit(64)).cast("int").alias("b64"),
        F.pmod(F.xxhash64("s"), F.lit(17)).cast("int").alias("b17"),
    ).collect()
    for r in rows:
        assert xxhash64_py(r["s"]) == r["h"], r["s"]
        assert pmod_xxhash64_py(r["s"], 64) == r["b64"], r["s"]
        assert pmod_xxhash64_py(r["s"], 17) == r["b17"], r["s"]


def test_query_terms_driver_local_parity(spark):
    """query_terms' driver-side fast path (LogicalRDD/LocalRelation inputs)
    must produce exactly the explode->groupBy plan's rows — including NULL
    queries (no rows), NULL qids (grouped as-is), duplicate tokens (qtf>1)
    and empty-string tokens from double spaces."""
    from flagembedding_spark.operators.query import (
        driver_local_rows,
        query_terms,
    )

    df = spark.createDataFrame(
        [("q1", "a b a"), ("q2", "c  d"), ("q3", None), (None, "x"),
         ("q4", ""), ("q1", "a")],
        ["query_id", "query"],
    )
    key = lambda t: (t[0] or "", t[1], t[2])  # noqa: E731
    fast = sorted(
        ((r["qid"], r["term"], r["qtf"]) for r in query_terms(df).collect()),
        key=key,
    )
    assert driver_local_rows(df) is not None          # fast path engaged
    dist = df.repartition(2)
    assert driver_local_rows(dist) is None            # fallback engaged
    slow = sorted(
        ((r["qid"], r["term"], r["qtf"])
         for r in query_terms(dist).collect()),
        key=key,
    )
    assert fast == slow
    assert query_terms(df).schema.simpleString() == \
        query_terms(dist).schema.simpleString()
