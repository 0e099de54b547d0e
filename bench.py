"""Benchmark: index-build throughput (files/sec), BM25 query latency, and the
north-rule two-parallelism scaling run (local[8] vs local[32] standing in for
N and 4N executors — no real cluster in this sandbox).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-phase sec...}, "sf": ...,
   "index": {...}, "scaling": {...}}

Env:
  SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
  SPARK_GRAFT_CPUS     default 32
  FES_BENCH_DOCS       synthetic corpus size for build/scaling (default 40000)
  FES_SCALING          set to 0 to skip the two-parallelism run
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

from flagembedding_spark.config import BM25Config  # noqa: E402
from flagembedding_spark.entries import (  # noqa: E402
    K1,
    B,
    TOPK,
    QUERY_SET,
    build_doc_index,
)
from flagembedding_spark.operators.index_build import build_index  # noqa: E402
from flagembedding_spark.operators.query import bm25_topk  # noqa: E402
from flagembedding_spark.schemas import distributed_synth_corpus  # noqa: E402
from flagembedding_spark.session import get_spark  # noqa: E402


def _queries_df(spark: SparkSession):
    return spark.createDataFrame(QUERY_SET, ["query_id", "query"])


def build_and_query_once(spark: SparkSession, n_docs: int, partitions: int):
    """One full pipeline: synth corpus → index build (forced via doc_stats +
    postings count actions) → BM25 top-k for the query set. Returns timings."""
    t0 = time.perf_counter()
    corpus = distributed_synth_corpus(spark, n_docs, partitions=partitions)
    idx = build_index(corpus, BM25Config(k1=K1, b=B), cache=True)
    n_postings = idx.postings.count()  # materialize the index
    t_build = time.perf_counter() - t0

    t1 = time.perf_counter()
    res = bm25_topk(idx, _queries_df(spark), k=TOPK)
    n_res = res.count()
    t_query = time.perf_counter() - t1
    return t_build, t_query, n_postings, n_res


def run_at_parallelism(cores: int, n_docs: int) -> dict:
    spark = get_spark(
        f"fes-bench-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    try:
        t_build, t_query, n_postings, _ = build_and_query_once(
            spark, n_docs, partitions=max(cores * 2, 16)
        )
    finally:
        spark.stop()
    return {
        "cores": cores,
        "build_sec": round(t_build, 3),
        "query_sec": round(t_query, 3),
        "files_per_sec": round(n_docs / t_build, 1),
        "postings": n_postings,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("FES_BENCH_DOCS", "40000"))
    do_scaling = os.environ.get("FES_SCALING", "1") != "0"
    sf = sf_dir.rstrip("/").split("sf")[-1]

    timings: dict[str, float] = {}
    total0 = time.perf_counter()

    # --- headline: index build + query over the driver's documents table ---
    spark = get_spark("fes-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    n_table_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    t = time.perf_counter()
    idx = build_doc_index(spark, sf_dir)
    idx.postings.cache().count()
    idx.dictionary.cache().count()
    timings["index_build_documents"] = time.perf_counter() - t

    t = time.perf_counter()
    bm25_topk(idx, _queries_df(spark), k=TOPK).count()
    timings["bm25_topk_batch"] = time.perf_counter() - t

    # per-query latency distribution over the fixed query set (index cached)
    lat = []
    for qid, qtext in QUERY_SET:
        qdf = spark.createDataFrame([(qid, qtext)], ["query_id", "query"])
        t = time.perf_counter()
        bm25_topk(idx, qdf, k=TOPK).collect()
        lat.append(time.perf_counter() - t)
    lat.sort()
    p95 = lat[min(len(lat) - 1, int(round(0.95 * len(lat))) )]
    timings["bm25_single_query_p50"] = lat[len(lat) // 2]
    timings["bm25_single_query_p95"] = p95

    # --- synthetic-corpus build throughput at full parallelism ---
    t = time.perf_counter()
    t_build, t_query, n_postings, _ = build_and_query_once(
        spark, n_docs, partitions=max(cpus * 2, 16)
    )
    timings["index_build_synth"] = t_build
    timings["bm25_topk_synth"] = t_query
    spark.stop()

    index_metrics = {
        "documents_rows": n_table_docs,
        "synth_docs": n_docs,
        "synth_postings": n_postings,
        "synth_files_per_sec": round(n_docs / t_build, 1),
    }

    # --- north-rule scaling evidence: same job at 8 and 32 cores ---
    scaling = None
    if do_scaling:
        r8 = run_at_parallelism(8, n_docs)
        r32 = run_at_parallelism(32, n_docs)
        speedup = r8["build_sec"] / r32["build_sec"]
        scaling = {
            "local8": r8,
            "local32": r32,
            "speedup_8_to_32": round(speedup, 3),
            "efficiency": round(speedup / 4.0, 3),
            "rule": "efficiency = (T_8/T_32) / (32/8); target >= 0.8",
        }
        timings["scaling_local8_build"] = r8["build_sec"]
        timings["scaling_local32_build"] = r32["build_sec"]

    total = time.perf_counter() - total0
    out = {
        "metric": "bm25_index_build_and_topk",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "sf": sf,
        "index": index_metrics,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
