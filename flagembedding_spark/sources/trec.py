"""TREC run format sink/scan (S6/S7).

Line format: ``qid Q0 docid rank score tag``
- writer: hybrid_retrieval/step0-hybrid_search_results.py:108-113
- reader: same file :65-82 (parses, truncates at top_k)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def trec_lines(results: DataFrame, tag: str = "flagembedding_spark") -> DataFrame:
    """(qid, docid, score, rank) → single 'line' column. Scores formatted as
    fixed 4dp decimals so round-trips are bit-stable."""
    return results.select(
        F.concat_ws(
            " ",
            F.col("qid").cast("string"),
            F.lit("Q0"),
            F.col("docid").cast("string"),
            F.col("rank").cast("string"),
            F.col("score").cast("decimal(18,4)").cast("string"),
            F.lit(tag),
        ).alias("line")
    )


def write_trec_run(results: DataFrame, path: str, tag: str = "flagembedding_spark") -> None:
    trec_lines(results, tag).coalesce(1).write.mode("overwrite").text(path)


def read_trec_run(spark: SparkSession, path: str, top_k: int | None = None) -> DataFrame:
    """Scan a run file → (qid, docid, score, rank); optionally truncate each
    query's list at top_k (reader semantics, step0:65-82)."""
    df = spark.read.text(path)
    parts = F.split(F.col("value"), " ")
    out = df.select(
        parts.getItem(0).alias("qid"),
        parts.getItem(2).alias("docid"),
        parts.getItem(4).cast("double").alias("score"),
        parts.getItem(3).cast("int").alias("rank"),
    )
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out


def write_msmarco_run(results: DataFrame, path: str) -> None:
    """msmarco result format: ``qid\\tdocid\\trank`` — the shape Anserini's
    SearchCollection -format msmarco emits and BM25Retriever._prepare_result
    parses back (modeling_bm25.py:81-89,131)."""
    results.select(
        F.concat_ws(
            "\t",
            F.col("qid").cast("string"),
            F.col("docid").cast("string"),
            F.col("rank").cast("string"),
        ).alias("line")
    ).coalesce(1).write.mode("overwrite").text(path)


def read_msmarco_run(spark: SparkSession, path: str) -> DataFrame:
    """→ (qid, docid, rank). The reference collects these into
    {qid: [docid,...]} rank-ordered; groupBy+sort_array reproduces that."""
    df = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return df.select(
        parts.getItem(0).alias("qid"),
        parts.getItem(1).alias("docid"),
        parts.getItem(2).cast("int").alias("rank"),
    )


def write_sharded_collection(
    corpus: DataFrame,
    path: str,
    max_docs_per_file: int = 1_000_000,
    id_col: str = "docid",
    text_col: str = "text",
) -> None:
    """S4: the Anserini JsonCollection sink shape, ``{'id': ..., 'contents':
    ...}`` JSONL sharded at max_docs_per_file (modeling_bm25.py:18-32).
    Spark's maxRecordsPerFile replaces the manual shard loop."""
    (
        corpus.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("contents")
        )
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_docs_per_file)
        .json(path)
    )


def read_jsonl_corpus(spark: SparkSession, path: str) -> DataFrame:
    """S1: read a JSONL corpus ({'id', 'contents'} or {'id','title','text'}
    conventions, data_loader.py:242-253). Title+text are concatenated the way
    the searcher does (searcher.py:111-114: f\"{title} {text}\".strip())."""
    df = spark.read.json(path)
    cols = set(df.columns)
    if "contents" in cols:
        text = F.col("contents")
    elif "title" in cols and "text" in cols:
        text = F.trim(F.concat_ws(" ", F.coalesce(F.col("title"), F.lit("")), F.col("text")))
    else:
        text = F.col("text")
    return df.select(F.col("id").cast("string").alias("docid"), text.alias("text"))


def read_jsonl_queries(spark: SparkSession, path: str) -> DataFrame:
    """S2: {split}_queries.jsonl with id/text fields (data_loader.py:290+)."""
    df = spark.read.json(path)
    qid = "query_id" if "query_id" in df.columns else "id"
    qtext = "query" if "query" in df.columns else "text"
    return df.select(
        F.col(qid).cast("string").alias("query_id"), F.col(qtext).alias("query")
    )


def read_jsonl_qrels(spark: SparkSession, path: str) -> DataFrame:
    """S2: {split}_qrels.jsonl {qid, docid, relevance} (data_loader.py:274-288)."""
    df = spark.read.json(path)
    return df.select(
        F.col("qid").cast("string"),
        F.col("docid").cast("string"),
        F.col("relevance").cast("int"),
    )
