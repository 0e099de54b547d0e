"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Engine: ``flagembedding_spark`` — a from-scratch PySpark-native rebuild of
FlagOpen/FlagEmbedding's lexical-retrieval (BM25) dataflow. See SURVEY.md.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query, SCALE path (VERDICT r03 ask #6): salted segment
    build → log-structured merge → delta-gap varint blocks → block-max WAND
    top-10 (k1=1.2, b=0.75) over sf0.001 documents — the plan you'd run at
    100×, rank-identical to the DataFrame path (same oracle as bm25_topk,
    driver-green as `bm25_topk_wand`)."""
    from flagembedding_spark.entries import q_bm25_topk_wand

    return q_bm25_topk_wand(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flagembedding_spark.entries import SPARK_ENTRIES
    from flagembedding_spark.entries_pipeline import PIPELINE_ENTRIES
    from flagembedding_spark.registry_order import canonical_order

    merged = {**SPARK_ENTRIES, **PIPELINE_ENTRIES}
    return {k: merged[k] for k in canonical_order(list(merged))}


def oracle_sql() -> dict[str, str]:
    from flagembedding_spark.entries import ORACLE_SQL
    from flagembedding_spark.entries_pipeline import PIPELINE_ORACLE_SQL
    from flagembedding_spark.registry_order import canonical_order

    merged = {**ORACLE_SQL, **PIPELINE_ORACLE_SQL}
    return {k: merged[k] for k in canonical_order(list(merged))}
