"""Hot-filter INDEX LAYOUT: materialized per-value sub-stores.

The engine's filter story has three tiers, from ad-hoc to hot:

1. ``bm25_topk(include_docids=)`` — DataFrame semi-join (ad-hoc).
2. ``wand_topk(include_docids=)`` — in-kernel DocidMask over the full
   store (ad-hoc on the scale path).
3. THIS module — a recurring filter (e.g. per-language search) pays for
   neither: the store itself is partitioned by the filter field, so a
   filtered query scans ONLY its value's blocks. This is the Lucene/
   Elasticsearch practice of routing/per-tenant indices, Spark-native.

Semantics are the Lucene filter-clause contract shared by the other two
tiers: candidates restricted, scores from GLOBAL corpus statistics — a
filter never rescores. That falls out of construction: each sub-store is
built from the value's postings but carries the GLOBAL dictionary
(df/idf) and global N/avgdl (build_segments propagates ``index.stats``
and ``index.dictionary`` verbatim), so ``wand_topk`` on a sub-store is
rank- and score-identical to ``include_docids`` over the full store
(entry ``bm25_topk_filtered_layout`` shares ``_filtered_oracle``).

Scale shape: one store build per hot value (low-cardinality fields —
lang, source, tenant). Each build is the standard segment pipeline over
a semi-joined postings subset; at cluster scale the loop runs as
independent jobs (or one pass writing ``partitionBy(field, bucket)``),
and a filtered query touches |value's postings| bytes instead of
masking the full corpus post-decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flagembedding_spark.operators.index_build import InvertedIndex
from flagembedding_spark.operators.segments import (
    SegmentIndex,
    build_segments,
    load_segments,
    merge_segments,
    save_segments,
)


def build_filter_partitioned_store(
    index: InvertedIndex,
    doc_meta: DataFrame,
    field: str,
    root: str,
    values: list | None = None,
) -> list:
    """Materialize one sub-store per ``field`` value under
    ``<root>/<field>=<value>/``. ``doc_meta`` maps docid → field (one row
    per doc). Returns the list of values written. Global statistics are
    preserved in every sub-store (see module docstring)."""
    if values is None:
        values = sorted(
            r["v"]
            for r in doc_meta.select(
                F.col(field).alias("v")
            ).distinct().collect()
        )
    for v in values:
        keep = doc_meta.filter(F.col(field) == v).select("docid")
        sub_post = index.postings.join(keep, "docid", "left_semi")
        sub_idx = InvertedIndex(
            postings=sub_post,
            doc_stats=index.doc_stats,
            dictionary=index.dictionary,  # GLOBAL df/idf — never rescored
            stats=index.stats,            # GLOBAL N/avgdl
            config=index.config,
        )
        seg = merge_segments(build_segments(sub_idx))
        save_segments(seg, f"{root}/{field}={v}")
    return values


def load_filtered_store(
    spark: SparkSession, root: str, field: str, value
) -> SegmentIndex:
    """Open the sub-store for one filter value — every query against it
    (wand_topk, SegmentReader) is implicitly filtered, at zero per-query
    cost: the non-matching blocks are not in the store."""
    return load_segments(spark, f"{root}/{field}={value}")
