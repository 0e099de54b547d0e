"""MoreLikeThis: document-as-query retrieval (Lucene MLT analog).

Given seed documents, select each seed's most significant terms and run
them as a BM25 disjunction, excluding the seed itself — "find documents
like this one". The reference stack retrieves with explicit queries only
(modeling_bm25.py); MLT is the standard Lucene companion a production
corpus-exploration / near-dup-triage workflow expects.

Term-selection rule (deterministic, cross-engine-safe): per (seed, term),
interestingness = tf(t, seed) · idf(t) rounded to 4 decimals, ranked
(weight DESC, term ASC), top ``m_terms`` kept. The idf product is a
SINGLE float multiplication per row — no cross-partition float SUM, so
the r03 rounding-boundary failure mode does not apply. Selected terms
query with qtf = 1 (Lucene MLT builds a boolean query of unique terms).

Scale shape: the seed set is broadcast-joined into postings twice — once
to read the seeds' own term vectors (tiny output: seeds' vocab), once as
the standard bm25 query path. No corpus shuffle beyond the flagship
plan's scatter-add.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flagembedding_spark.operators.index_build import InvertedIndex
from flagembedding_spark.operators.query import bm25_partial_scores


def mlt_terms(
    index: InvertedIndex,
    seed_docids: DataFrame,
    m_terms: int = 5,
) -> DataFrame:
    """→ (qid, term, weight4, rank ≤ m_terms): each seed doc's most
    interesting terms; qid = the seed docid as string."""
    seeds = seed_docids.select("docid")
    tv = index.postings.join(F.broadcast(seeds), "docid").select(
        "docid", "term", "tf"
    )
    # tv is seeds' vocabulary (seed-count × terms-per-doc — point-query
    # sized); broadcast it into the big dictionary scan, never the reverse
    scored = F.broadcast(tv).join(
        index.dictionary.select("term", "idf"), "term"
    ).select(
        F.col("docid").cast("string").alias("qid"),
        "term",
        F.round(F.col("tf") * F.col("idf"), 4).alias("weight4"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("weight4"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m_terms)
        .select("qid", "term", "weight4", "rank")
    )


def more_like_this(
    index: InvertedIndex,
    seed_docids: DataFrame,
    m_terms: int = 5,
    k: int = 10,
    k1: float | None = None,
    b: float | None = None,
    round_scores: int | None = None,
) -> DataFrame:
    """→ (qid, docid, score, rank ≤ k): BM25 over each seed's selected
    terms (qtf = 1 each), the seed doc itself excluded from its own
    results."""
    qt = mlt_terms(index, seed_docids, m_terms).select(
        "qid", "term", F.lit(1).cast("long").alias("qtf")
    )
    scored = (
        bm25_partial_scores(index, qt, k1, b)
        .groupBy("qid", "docid")
        .agg(F.sum("s").alias("score"))
        # a seed is always its own best match — Lucene MLT drops it
        .filter(F.col("qid") != F.col("docid").cast("string"))
    )
    if round_scores is not None:
        scored = scored.withColumn("score", F.round("score", round_scores))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "score", "rank")
    )
