"""Classic TF-IDF (Lucene ClassicSimilarity) as an alternative scorer
over the SAME index + broadcast plan as BM25.

Lucene's pre-BM25 default (TFIDFSimilarity/ClassicSimilarity):

    tf(t,d)   = sqrt(freq)
    idf(t)    = 1 + ln(N / (df + 1))
    norm(d)   = 1 / sqrt(dl)
    coord(q,d)= |matched distinct terms| / |query distinct terms|
    score     = coord · Σ_t  qtf · idf(t)² · tf(t,d) · norm(d)

idf enters SQUARED (it weights both the query vector and the doc term
weight in the classic model); queryNorm is omitted — constant within a
query, rank-invariant. The reference itself scores BM25 only
(modeling_bm25.py:225-227); this scorer exists because an engine claiming
the Lucene surface needs the classic similarity switch, and it shares
every physical property of the BM25 plan: dictionary ⋈ broadcast(qterms)
→ tiny artifact broadcast into the postings scan, one (qid, docid)
scatter-add, WindowGroupLimit top-k. coord rides the same aggregation as
min_should_match's match count — zero extra shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flagembedding_spark.operators.index_build import InvertedIndex
from flagembedding_spark.operators.query import query_terms


def tfidf_topk(
    index: InvertedIndex,
    queries: DataFrame,
    k: int = 10,
    round_scores: int | None = None,
    qid_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """(qid, docid, score, rank) under ClassicSimilarity — see module
    docstring for the exact formula. Ties (score DESC, docid ASC)."""
    n = float(index.stats.n_docs)
    qt = query_terms(queries, qid_col, query_col)
    qt_idf = index.dictionary.join(F.broadcast(qt), "term").select(
        "term", "qid", "qtf",
        (
            F.lit(1.0)
            + F.log(F.lit(n) / (F.col("df").cast("double") + F.lit(1.0)))
        ).alias("idf_c"),
    )
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    partial = (
        F.col("qtf") * F.col("idf_c") * F.col("idf_c")
        * F.sqrt(tf) / F.sqrt(dl)
    )
    scored = (
        index.postings.join(F.broadcast(qt_idf), "term")
        .select("qid", "docid", partial.alias("s"))
        .groupBy("qid", "docid")
        .agg(F.sum("s").alias("raw"), F.count("*").alias("nmatched"))
    )
    qneed = qt.groupBy("qid").agg(F.count("*").alias("m_total"))
    scored = scored.join(F.broadcast(qneed), "qid").select(
        "qid", "docid",
        (
            F.col("raw") * F.col("nmatched").cast("double")
            / F.col("m_total").cast("double")
        ).alias("score"),
    )
    if round_scores is not None:
        scored = scored.withColumn("score", F.round("score", round_scores))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "score", "rank")
    )


def classic_idf(n_docs: int, df: int) -> float:
    """Driver-side twin of the scorer's idf — for tests."""
    return 1.0 + math.log(n_docs / (df + 1.0))
