"""Pseudo-relevance-feedback (PRF) query expansion over the BM25 engine.

Classic RM3/Bo1-style expansion: retrieve top ``fb_k`` docs per query with
BM25 (the reference's retrieval stage, modeling_bm25.py:212-243), then
rank candidate expansion terms drawn from those feedback docs. Term
weights here are INTEGER-ONLY by design — the r03 dual-engine gate showed
that float SUMs of per-doc ratios flip 6-decimal roundings with Spark's
partition order (NOTES.md "gate catches"), so the expansion score is the
lexicographic pair

    (fb_df, fb_tf)  =  (#feedback docs containing t, Σ tf(t, d) over them)

with term-ascending tie-break — deterministic across engines, no float in
any aggregate. Original query terms are excluded (standard RM3 practice).

Scale shape: the feedback set is (queries × fb_k) rows — broadcast into
the postings scan; candidate aggregation shuffles only the feedback docs'
postings (corpus-independent volume); final ranking is a per-qid window
over ≤ fb docs' vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flagembedding_spark.operators.index_build import InvertedIndex
from flagembedding_spark.operators.query import bm25_topk, query_terms


def prf_expansion(
    index: InvertedIndex,
    queries: DataFrame,
    fb_k: int = 10,
    n_terms: int = 5,
    qid_col: str = "query_id",
    query_col: str = "query",
    round_scores: int | None = 4,
) -> DataFrame:
    """→ (qid, term, fb_df, fb_tf, rank ≤ n_terms) expansion terms per
    query; queries whose retrieval returns nothing (all-OOV) are absent."""
    fb = bm25_topk(
        index, queries, k=fb_k, qid_col=qid_col, query_col=query_col,
        round_scores=round_scores,
    ).select("qid", "docid")
    qt = query_terms(queries, qid_col, query_col).select("qid", "term")
    cand = (
        index.postings.join(F.broadcast(fb), "docid")
        .join(F.broadcast(qt), ["qid", "term"], "left_anti")
        .groupBy("qid", "term")
        .agg(
            F.count("*").alias("fb_df"),
            F.sum("tf").alias("fb_tf"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("fb_df"), F.desc("fb_tf"), F.asc("term")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_terms)
        .select("qid", "term", "fb_df", "fb_tf", "rank")
    )
