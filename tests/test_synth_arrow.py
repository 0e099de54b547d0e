"""Parity of the Arrow-vectorized synthetic-corpus generator against the
JVM expression reference form — the optimization is only admissible if the
fixture is bit-identical (same content → same index work), so every column
of every row is compared, across partition layouts, plus the skewed
composition and the vocab-index LUT for its full input domain."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_synth_vocab_lut_parity(spark):
    """_VOCAB_POW_LUT must equal cast(pow(k/1000.0, 2.0)*511 as int) for
    EVERY reachable k (0..999) — pins the Math.pow-vs-Python rounding
    question exhaustively."""
    from flagembedding_spark.schemas import _VOCAB_POW_LUT

    got = [
        r["v"]
        for r in spark.range(1000)
        .select(F.expr("cast(pow(id/1000.0, 2.0)*511 as int)").alias("v"))
        .collect()
    ]
    assert got == _VOCAB_POW_LUT


def test_xxhash64_np_fold_parity(spark):
    """The numpy fold steps must reproduce Spark's multi-column xxhash64
    fold — checked against F.xxhash64 for the exact column-type chains the
    generator uses (long; long,int; with short string literal tags)."""
    import numpy as np

    from flagembedding_spark.functions.hashing import (
        java_abs_np,
        xxh64_fold_bytes_np,
        xxh64_fold_int_np,
        xxh64_fold_long_np,
    )

    vals = [0, 1, -1, 42, 2**31, -(2**31) - 7, 2**62, -(2**63), 987654321]
    df = spark.createDataFrame([(v, v % 401) for v in vals], ["i", "p"])
    rows = df.select(
        "i",
        "p",
        F.xxhash64("i").alias("h1"),
        F.xxhash64("i", F.lit("len"), F.lit(42)).alias("h2"),
        F.abs(
            F.xxhash64("i", F.col("p").cast("int"), F.lit("hot"), F.lit(42))
        ).alias("h3"),
        F.xxhash64("i", F.lit("lang"), F.lit(42)).alias("h4"),
    ).collect()
    i = np.array([r["i"] for r in rows], dtype=np.int64)
    p = np.array([r["p"] for r in rows], dtype=np.int64)
    st = xxh64_fold_long_np(i, np.uint64(42))
    assert [int(x) for x in st.view(np.int64)] == [r["h1"] for r in rows]
    h2 = xxh64_fold_int_np(
        np.int64(42), xxh64_fold_bytes_np(b"len", st)
    ).view(np.int64)
    assert [int(x) for x in h2] == [r["h2"] for r in rows]
    h3 = java_abs_np(
        xxh64_fold_int_np(
            np.int64(42),
            xxh64_fold_bytes_np(b"hot", xxh64_fold_int_np(p, st)),
        )
    )
    assert [int(x) for x in h3] == [r["h3"] for r in rows]
    h4 = xxh64_fold_int_np(
        np.int64(42), xxh64_fold_bytes_np(b"lang", st)
    ).view(np.int64)
    assert [int(x) for x in h4] == [r["h4"] for r in rows]


def test_synth_corpus_arrow_parity(spark):
    """Full-row bit-identity of the Arrow kernel vs the expression form,
    across partition layouts (incl. partitions > rows)."""
    from flagembedding_spark.schemas import (
        distributed_synth_corpus,
        distributed_synth_corpus_expr,
    )

    for n, parts in ((1000, 7), (257, 16), (123, 200)):
        a = distributed_synth_corpus(spark, n, partitions=parts)
        b = distributed_synth_corpus_expr(spark, n, partitions=parts)
        ra, rb = _rows(a), _rows(b)
        assert len(ra) == n
        assert ra == rb, (n, parts)


def test_synth_corpus_skewed_arrow_parity(spark):
    """The skewed wrapper composes over the Arrow base identically to the
    expression base (needle planting keys off path/content, both already
    proven identical — this pins the composition end to end)."""
    import flagembedding_spark.schemas as S

    base_expr = S.distributed_synth_corpus_expr(spark, 1500, partitions=5)
    i = F.xxhash64("path")
    needle = F.concat(
        F.lit("needle_"), (F.abs(i) % S.N_NEEDLES).cast("string")
    )
    want = base_expr.withColumn(
        "content",
        F.when(
            F.abs(F.xxhash64("path", F.lit("plant"))) % S.NEEDLE_EVERY == 0,
            F.concat(F.col("content"), F.lit(" "), needle),
        ).otherwise(F.col("content")),
    )
    got = S.distributed_synth_corpus_skewed(spark, 1500, partitions=5)
    assert _rows(got) == _rows(want)


def test_term_hash_probe_identity(spark, tmp_path):
    """Persisted stream indexes carry term_hash and bm25 probes on the
    int64 key with a residual exact-string check (query.py) — results must
    be bit-identical to the string-key join, and the physical join key must
    stay hash-only (a plain equality would re-extract the string as a
    second equi key, re-paying the string hashing the path removes)."""
    from flagembedding_spark.config import BM25Config
    from flagembedding_spark.operators.query import bm25_topk
    from flagembedding_spark.schemas import distributed_synth_corpus
    from flagembedding_spark.sources.index_store import build_and_save_index

    corpus = distributed_synth_corpus(spark, 500, partitions=4)
    idx = build_and_save_index(corpus, str(tmp_path / "idx"), BM25Config())
    assert "term_hash" in idx.postings.columns
    qs = spark.createDataFrame(
        [("q1", "def return get_er_0"), ("q2", "zz_oov def def"),
         ("q3", "zz_all_oov")],
        ["query_id", "query"],
    )
    res = bm25_topk(idx, qs, k=7)
    plan = res._jdf.queryExecution().executedPlan().toString()
    import re

    bhj_keys = re.findall(r"BroadcastHashJoin \[([^\]]*)\]", plan)
    assert any(
        k.startswith("term_hash") and "," not in k for k in bhj_keys
    ), bhj_keys  # single numeric key, no second (string) equi-key
    idx_str = type(idx)(
        postings=idx.postings.drop("term_hash"),
        doc_stats=idx.doc_stats,
        dictionary=idx.dictionary,
        stats=idx.stats,
        config=idx.config,
    )
    want = bm25_topk(idx_str, qs, k=7)
    assert sorted(map(tuple, res.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_stream_term_hash_parity(spark, tmp_path):
    """The kernel-computed term_hash column (dictionary-encode + scalar
    xxhash64_py per distinct term) must be bit-identical to a JVM
    F.xxhash64(term) projection over the same stream — incl. the NULL-term
    doc-stats rows (seed 42)."""
    from flagembedding_spark.config import BM25Config
    from flagembedding_spark.schemas import distributed_synth_corpus
    from flagembedding_spark.sources.index_store import build_and_save_index

    corpus = distributed_synth_corpus(spark, 300, partitions=3)
    build_and_save_index(corpus, str(tmp_path / "s"), BM25Config())
    stream = spark.read.parquet(str(tmp_path / "s" / "stream"))
    want = F.shiftright(F.shiftleft(F.xxhash64("term"), 32), 32)
    bad = stream.filter(
        ~F.col("term_hash").cast("long").eqNullSafe(want)
    ).count()
    assert bad == 0
    assert stream.filter(F.col("term_hash").isNull()).count() == 0
    assert dict(stream.dtypes)["term_hash"] == "int"


def test_rowclass_store_equivalence(spark, tmp_path):
    """The rowclass-partitioned store (postings / doc-stats / dictionary
    partials split by file, dictionary derived from map-side partial dfs)
    must load back EXACTLY what the in-memory build computes: postings,
    doc_stats, dictionary (df + idf), corpus stats, and bm25 results."""
    from flagembedding_spark.config import BM25Config
    from flagembedding_spark.operators.index_build import build_index
    from flagembedding_spark.operators.query import bm25_topk
    from flagembedding_spark.schemas import distributed_synth_corpus
    from flagembedding_spark.sources.index_store import build_and_save_index

    corpus = distributed_synth_corpus(spark, 700, partitions=5)
    idx = build_and_save_index(corpus, str(tmp_path / "s"), BM25Config())
    corpus2 = distributed_synth_corpus(spark, 700, partitions=5)
    mem = build_index(corpus2, BM25Config(), cache=False)

    def rows(df, cols):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    assert rows(idx.postings, ["term", "docid", "tf", "dl"]) == rows(
        mem.postings, ["term", "docid", "tf", "dl"]
    )
    assert rows(idx.doc_stats, ["docid", "docid_str", "dl"]) == rows(
        mem.doc_stats, ["docid", "docid_str", "dl"]
    )
    got_dict = {
        r["term"]: (r["df"], round(r["idf"], 10))
        for r in idx.dictionary.collect()
    }
    want_dict = {
        r["term"]: (r["df"], round(r["idf"], 10))
        for r in mem.dictionary.collect()
    }
    assert got_dict == want_dict
    assert idx.stats.n_docs == mem.stats.n_docs == 700
    assert abs(idx.stats.avgdl - mem.stats.avgdl) < 1e-9
    qs = spark.createDataFrame(
        [("q1", "def return get_er_0"), ("q2", "zz_oov")],
        ["query_id", "query"],
    )
    assert sorted(map(tuple, bm25_topk(idx, qs, k=7).collect())) == sorted(
        map(tuple, bm25_topk(mem, qs, k=7).collect())
    )


def test_include_docids_dataframe_cap(spark, monkeypatch):
    """An include_docids DataFrame past the documented cap must raise with
    guidance (layout tier / DocidBitmap) instead of materializing an
    unbounded set on the driver (VERDICT r05 'what's wrong' #3); under the
    cap the filtered query still works."""
    import pytest

    import flagembedding_spark.operators.wand as W
    from flagembedding_spark.config import BM25Config
    from flagembedding_spark.operators.index_build import build_index
    from flagembedding_spark.operators.segments import (
        build_segments,
        merge_segments,
    )
    from flagembedding_spark.schemas import distributed_synth_corpus

    corpus = distributed_synth_corpus(spark, 200, partitions=2)
    idx = build_index(
        corpus, BM25Config(block_size=16, term_buckets=4), cache=False
    )
    seg = merge_segments(build_segments(idx))
    qs = spark.createDataFrame([("q1", "def return")], ["query_id", "query"])
    inc = spark.range(120).selectExpr("id as docid")
    assert W.wand_topk(seg, qs, k=5, include_docids=inc).count() > 0
    monkeypatch.setattr(W, "INCLUDE_DOCIDS_DF_CAP", 100)
    with pytest.raises(ValueError, match="include_docids exceeds"):
        W.wand_topk(seg, qs, k=5, include_docids=inc).count()


def test_sha256_hex_col_identity():
    """Buffer-slice sha256 must equal hashlib over the re-encoded python
    strings — incl. empty strings, unicode, a sliced array view, and a
    chunked array."""
    import hashlib

    import pyarrow as pa

    from flagembedding_spark.operators.arrow_postings import sha256_hex_col

    texts = ["", "a", "héllo wörld", "日本語 テスト", "x" * 5000, "def (", ""]
    want = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]
    arr = pa.array(texts, pa.string())
    assert sha256_hex_col(arr).to_pylist() == want
    assert sha256_hex_col(arr.slice(2, 4)).to_pylist() == want[2:6]
    chunked = pa.chunked_array([texts[:3], texts[3:]], pa.string())
    assert sha256_hex_col(chunked).to_pylist() == want
    large = pa.array(texts, pa.large_string())
    assert sha256_hex_col(large).to_pylist() == want
