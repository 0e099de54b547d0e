"""Result grouping over BM25 retrieval — Lucene collapse/facet analogs.

The reference's retrieval surface returns flat (docid, score) rankings
(research/llm_embedder/src/retrieval/modeling_bm25.py:230-243); a search
stack over a source-code corpus needs the two standard groupings Lucene
ships on top of that ranking:

- ``collapse_topk`` — field collapsing (Lucene CollapsingTopDocsCollector
  / Solr collapse): keep only the BEST-scoring hit per group value
  (e.g. one hit per repo), then top-k over the collapsed ranking. Result
  diversification for "one result per repository" UX.
- ``facet_counts`` — facet counting (Lucene facets): per query, the
  number of MATCHING docs (≥1 query term — the candidate set, not the
  top-k page) per metadata field value, the sidebar-counts contract.

Scale shape: candidates are docs matching ≥1 query term — the same
partial-score stream the ranking itself aggregates, so faceting adds one
(qid, field) count on top of an existing exchange. The metadata join is
docid-equi (shuffle or broadcast per AQE; at cluster scale metadata
belongs bucketed by docid alongside doc_stats). Collapsing is two
row_number windows (qid, group) → (qid), both over candidate-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flagembedding_spark.operators.index_build import InvertedIndex
from flagembedding_spark.operators.query import (
    bm25_partial_scores,
    query_terms,
)


def collapse_topk(
    index: InvertedIndex,
    queries: DataFrame,
    doc_meta: DataFrame,
    group_col: str,
    k: int = 10,
    round_scores: int | None = None,
    qid_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """(qid, docid, score, group, rank): best hit per ``group_col`` value,
    top-k groups per query by that best hit's BM25 score.

    ``doc_meta`` maps docid → group (one row per doc). Ties break
    (score DESC, docid ASC) inside a group and across groups — the
    engine's canonical order. Scores are full BM25 (global stats);
    collapsing never rescores."""
    scored = (
        bm25_partial_scores(index, query_terms(queries, qid_col, query_col))
        .groupBy("qid", "docid")
        .agg(F.sum("s").alias("score"))
    )
    if round_scores is not None:
        scored = scored.withColumn("score", F.round("score", round_scores))
    meta = doc_meta.select("docid", F.col(group_col).alias("group"))
    cand = scored.join(meta, "docid")
    w_in = Window.partitionBy("qid", "group").orderBy(
        F.desc("score"), F.asc("docid")
    )
    w_out = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        cand.withColumn("r_in", F.row_number().over(w_in))
        .filter(F.col("r_in") == 1)
        .withColumn("rank", F.row_number().over(w_out))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "score", "group", "rank")
    )


def facet_counts(
    index: InvertedIndex,
    queries: DataFrame,
    doc_meta: DataFrame,
    facet_col: str,
    qid_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """(qid, facet, n_docs): per query, matching-doc count (docs containing
    ≥1 query term) per ``facet_col`` value — Lucene sidebar facets over
    the full match set, not the result page."""
    qt = query_terms(queries, qid_col, query_col)
    cand = (
        index.postings.join(F.broadcast(qt.select("qid", "term")), "term")
        .select("qid", "docid")
        .distinct()
    )
    meta = doc_meta.select("docid", F.col(facet_col).alias("facet"))
    return (
        cand.join(meta, "docid")
        .groupBy("qid", "facet")
        .agg(F.count("*").alias("n_docs"))
    )
