"""Persisted index layout — the analog of the reference's on-disk Lucene index
(modeling_bm25.py:91-107 builds one via Anserini ``IndexCollection``; S10).

Layout (parquet; Iceberg-compatible — swap ``.parquet(...)`` for
``.format("iceberg").save(...)`` on a real deployment):

    <root>/postings/    (term, docid, tf, dl)   — the postings table
    <root>/doc_stats/   (docid, docid_str, dl, content_sha256)
    <root>/dictionary/  (term, df, idf)
    <root>/stats.json   {n_docs, avgdl, k1, b, use_avgdl}

The segment-compressed, term-partitioned layout (delta-gap varint blocks +
block-max metadata) lives in operators/segments.py; this store is the plain
columnar form every other operator composes with.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from flagembedding_spark.config import BM25Config
from flagembedding_spark.operators.index_build import CorpusStats, InvertedIndex


def build_and_save_index(
    corpus,
    root: str,
    config: BM25Config | None = None,
    content_col: str = "content",
    docid_str=None,
    timings: dict | None = None,
) -> InvertedIndex:
    """One-pass persisted build (the real index-build job shape at scale):

      corpus → mapInArrow tokenize-and-count → write unified stream parquet
      (single corpus pass, postings + doc-stats rows interleaved) → derive
      dictionary/stats from the persisted parquet (cheap column-pruned scans,
      no recompute of the corpus pass).

    Returns the loaded index backed by the persisted files.
    """
    from pyspark.sql import functions as F

    from flagembedding_spark.operators.arrow_postings import tokenize_count_stream

    import time

    config = config or BM25Config()
    t0 = time.perf_counter()
    # term_hash rides the stream so query-time term lookups can probe on a
    # numeric key (string-key BroadcastHashJoin probing measured 2.7 s of a
    # 5.5 s query batch over 44M postings vs 0.7 s for the scan itself —
    # guide §3.1: make the join key cheap). Hashed inside the kernel per
    # DISTINCT term per batch (a per-row JVM xxhash64 projection cost ~1 s
    # of the corpus pass); NULL term (doc-stats rows) carries the seed and
    # is filtered out of postings on read as before.
    stream = tokenize_count_stream(
        corpus, config, content_col, docid_str, with_term_hash=True
    )
    stream.write.mode("overwrite").parquet(f"{root}/stream")
    if timings is not None:
        # the corpus pass: tokenize+count+persist — the phase whose
        # throughput scales with executors (finalize below is a handful of
        # small derived jobs, amortized per snapshot on a real deployment)
        timings["corpus_pass_sec"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    spark = corpus.sparkSession
    persisted = spark.read.parquet(f"{root}/stream")
    # ONE column-pruned scan of (term, dl) derives the dictionary AND the
    # corpus stats: doc-stats rows (term NULL) land in the NULL group, whose
    # count is n_docs and whose avg(dl) is avgdl — previously two separate
    # full scans of the stream (guide §2.4: share the pass). The aggregate
    # is vocabulary-sized, so caching it for the two tiny consumers is free.
    agged = (
        persisted.groupBy("term")
        .agg(F.count("*").alias("df"), F.avg("dl").alias("avg_dl"))
        .cache()
    )
    null_row = agged.filter(F.col("term").isNull()).collect()
    n_docs = int(null_row[0]["df"]) if null_row else 0
    avgdl = float(null_row[0]["avg_dl"] or 0.0) if null_row else 0.0
    n = float(n_docs)
    dictionary = agged.filter(F.col("term").isNotNull()).select(
        "term",
        "df",
        F.log(
            (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
    )
    dictionary.write.mode("overwrite").parquet(f"{root}/dictionary")
    agged.unpersist()

    meta = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "k1": config.k1,
        "b": config.b,
        "use_avgdl": config.use_avgdl,
        "stop_tokens": sorted(config.stop_tokens),
        "layout": "stream",
    }
    with open(f"{root}/stats.json", "w") as f:
        json.dump(meta, f)
    if timings is not None:
        timings["finalize_sec"] = time.perf_counter() - t0
    return load_index(spark, root)


def save_index(index: InvertedIndex, root: str, postings_partitions: int | None = None) -> None:
    p = index.postings
    if postings_partitions:
        p = p.repartition(postings_partitions)
    p.write.mode("overwrite").parquet(f"{root}/postings")
    index.doc_stats.write.mode("overwrite").parquet(f"{root}/doc_stats")
    index.dictionary.write.mode("overwrite").parquet(f"{root}/dictionary")
    cfg = index.config
    meta = {
        "n_docs": index.stats.n_docs,
        "avgdl": index.stats.avgdl,
        "k1": cfg.k1,
        "b": cfg.b,
        "use_avgdl": cfg.use_avgdl,
        "stop_tokens": sorted(cfg.stop_tokens),
    }
    os.makedirs(root, exist_ok=True)
    with open(f"{root}/stats.json", "w") as f:
        json.dump(meta, f)


def load_index(spark: SparkSession, root: str) -> InvertedIndex:
    from pyspark.sql import functions as F

    with open(f"{root}/stats.json") as f:
        meta = json.load(f)
    cfg = BM25Config(
        k1=meta["k1"],
        b=meta["b"],
        use_avgdl=meta["use_avgdl"],
        stop_tokens=frozenset(meta.get("stop_tokens", [])),
    )
    if meta.get("layout") == "stream":
        stream = spark.read.parquet(f"{root}/stream")
        post_cols = ["term", "docid", "tf", "dl"] + (
            ["term_hash"] if "term_hash" in stream.columns else []
        )
        postings = stream.filter(F.col("term").isNotNull()).select(*post_cols)
        doc_stats = stream.filter(F.col("term").isNull()).select(
            "docid", "docid_str", "dl", "content_sha256"
        )
    else:
        postings = spark.read.parquet(f"{root}/postings")
        doc_stats = spark.read.parquet(f"{root}/doc_stats")
    return InvertedIndex(
        postings=postings,
        doc_stats=doc_stats,
        dictionary=spark.read.parquet(f"{root}/dictionary"),
        stats=CorpusStats(n_docs=meta["n_docs"], avgdl=meta["avgdl"]),
        config=cfg,
    )
