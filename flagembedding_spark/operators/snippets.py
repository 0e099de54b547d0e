"""Snippet (hit-highlight window) extraction for retrieval results.

The reference surfaces retrieval hits as bare (docid, score) pairs
(research/llm_embedder/src/retrieval/modeling_bm25.py:230-243); a serving
stack around it needs the matched context. This operator produces a
deterministic token-window snippet per (query, hit):

- tokens = single-space split of the document text (the engine's global
  tokenization contract, empties preserved);
- anchor = the FIRST occurrence (minimum token position) of ANY query term
  in the document — the earliest matched term; a hit containing NONE of
  the query's terms (possible for fused/filtered/expanded runs) anchors
  at position 1, yielding the document's LEADING window — defined
  behavior, never a null snippet;
- snippet = ``width`` tokens starting ``before`` tokens left of the anchor
  (clamped to the document start), space-joined.

Scale shape: the per-query term list is collected to a tiny broadcast array
(query-set-sized), hit docs are fetched by broadcasting the top-k result
set into the corpus scan (never the corpus into the results), and the
anchor/window math is pure JVM array expressions (array_position /
filter / slice) — no shuffle beyond the result⋈docs join, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flagembedding_spark.functions.tokenize import whitespace_tokens
from flagembedding_spark.operators.query import query_terms


def extract_snippets(
    docs: DataFrame,
    results: DataFrame,
    queries: DataFrame,
    width: int = 7,
    before: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """(qid, docid, rank, snippet) for every row of ``results``
    (qid, docid, rank) — see module docstring for the window rule."""
    qt_arr = (
        query_terms(queries, qid_col, query_col)
        .groupBy("qid")
        .agg(F.array_sort(F.collect_list("term")).alias("qterms"))
    )
    hits = docs.select(
        F.col(id_col).alias("docid"), whitespace_tokens(text_col).alias("toks")
    ).join(F.broadcast(results.select("qid", "docid", "rank")), "docid")
    toks = F.col("toks")
    # 1-based first position of each query term; 0/absent filtered out
    positions = F.filter(
        F.transform(F.col("qterms"), lambda t: F.array_position(toks, t)),
        lambda p: p > 0,
    )
    # no-match hits (empty positions array → null array_min) anchor at 1:
    # the leading window is the defined fallback (module docstring)
    anchor = F.coalesce(F.array_min(positions), F.lit(1))
    start = F.greatest(anchor - F.lit(before), F.lit(1))
    return (
        hits.join(F.broadcast(qt_arr), "qid")
        .select(
            "qid",
            "docid",
            "rank",
            F.concat_ws(
                " ", F.slice(toks, start, F.lit(width))
            ).alias("snippet"),
        )
    )
