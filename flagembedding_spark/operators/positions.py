"""Positional postings + exact phrase matching.

The reference's Anserini index is built with ``-storePositions
-storeDocvectors`` (research/llm_embedder/src/retrieval/modeling_bm25.py:
102-107) — BM25 never reads them, but phrase/proximity queries do. This is
that surface, Spark-native:

- positional_postings: (docid, term, tf, positions) via posexplode +
  groupBy — ONE shuffle keyed like the tf aggregation, positions kept as a
  sorted int array (the columnar docvector/positions analog; at the segment
  layer these would varint-encode next to tfs).
- phrase_occurrences: exact adjacent-phrase matching by positional-list
  intersection — start positions of the phrase are
  pos(t0) ∩ (pos(t1)−1) ∩ … ∩ (pos(t_{m−1})−(m−1)), computed with
  array_intersect/transform (JVM expressions), joins only the phrase's own
  m posting lists (broadcast-sized per phrase at any corpus scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flagembedding_spark.functions.tokenize import whitespace_tokens


def positional_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (docid, term, tf, positions array<long> ascending, 0-based).
    Positions are long so the cross-engine value hash matches DuckDB's
    BIGINT lists element-type-exactly."""
    toks = whitespace_tokens(text_col)
    return (
        df.select(
            F.col(id_col).alias("docid"),
            F.posexplode(toks).alias("pos", "term"),
        )
        .groupBy("docid", "term")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.sort_array(F.collect_list(F.col("pos").cast("long"))).alias(
                "positions"
            ),
        )
    )


def phrase_occurrences(
    positional: DataFrame, phrase: str, qid: str | None = None
) -> DataFrame:
    """→ (docid, n_occ) for docs containing the exact adjacent ``phrase``
    (single-space tokenization, same as the index); n_occ counts every start
    position. With ``qid``, a constant qid column is prepended (for batched
    phrase sets)."""
    terms = phrase.split(" ")
    if not terms:
        raise ValueError("empty phrase")
    acc = None
    for i, t in enumerate(terms):
        side = positional.filter(F.col("term") == t).select(
            "docid",
            F.transform("positions", lambda p: p - F.lit(i)).alias(f"_p{i}"),
        )
        if acc is None:
            acc = side.withColumnRenamed("_p0", "_starts")
        else:
            acc = acc.join(side, "docid").withColumn(
                "_starts", F.array_intersect("_starts", f"_p{i}")
            ).drop(f"_p{i}")
    out = (
        acc.withColumn("n_occ", F.size("_starts").cast("long"))
        .filter(F.col("n_occ") > 0)
        .select("docid", "n_occ")
    )
    if qid is not None:
        out = out.select(F.lit(qid).alias("qid"), "docid", "n_occ")
    return out


def phrase_match_batch(
    positional: DataFrame, phrases: list[tuple[str, str]]
) -> DataFrame:
    """Union of phrase_occurrences over (qid, phrase) pairs →
    (qid, docid, n_occ)."""
    outs = [phrase_occurrences(positional, p, qid) for qid, p in phrases]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
