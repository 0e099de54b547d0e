"""Result post-processing operators:

- J4 hybrid score fusion — full-outer merge of two runs per (qid, docid),
  weighted sum with a scale divisor on the sparse side (the reference undoes
  its x10000 impact quantization there), re-rank, top-k
  (C_MTEB/MLDR/hybrid_retrieval/step0-hybrid_search_results.py:85-106).
- J3 reranker pair generation — top-k results ⋈ queries ⋈ corpus text
  (abc/evaluation/searcher.py:217-239), truncated to rerank_top_k
  (searcher.py:211-216, arguments.py:49).
- J7 hard-negative mining — from top-k, drop positives, slice a rank range,
  sample n (scripts/hn_mine.py; range_for_sampling "10-210"). Sampling here
  is a seeded hash-sample: deterministic, distributed, no driver RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fuse_runs(
    run_a: DataFrame,
    run_b: DataFrame,
    w_a: float = 1.0,
    w_b: float = 1.0,
    scale_a: float = 1.0,
    k: int = 10,
    round_scores: int | None = None,
) -> DataFrame:
    """score = coalesce(a/scale_a, 0)*w_a + coalesce(b, 0)*w_b over the full
    outer (qid, docid) union; deterministic re-rank; top-k."""
    a = run_a.select("qid", "docid", F.col("score").alias("score_a"))
    b = run_b.select("qid", "docid", F.col("score").alias("score_b"))
    fused = a.join(b, ["qid", "docid"], "full_outer").select(
        "qid",
        "docid",
        (
            F.coalesce(F.col("score_a") / scale_a, F.lit(0.0)) * w_a
            + F.coalesce(F.col("score_b"), F.lit(0.0)) * w_b
        ).alias("score"),
    )
    if round_scores is not None:
        fused = fused.withColumn("score", F.round("score", round_scores))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "score", "rank")
    )


def rerank_pairs(
    results: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    rerank_top_k: int = 100,
    qid_col: str = "query_id",
    query_col: str = "query",
    docid_col: str = "docid",
    text_col: str = "text",
) -> DataFrame:
    """(qid, query, docid, text) pairs for the cross-encoder stage. The
    queries side is tiny → broadcast; the corpus join is the big one and
    stays a shuffle join on docid."""
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    topk = (
        results.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank_top_k)
        .select("qid", "docid", "rank")
    )
    q = queries.select(F.col(qid_col).alias("qid"), F.col(query_col).alias("query"))
    c = corpus.select(F.col(docid_col).alias("docid"), F.col(text_col).alias("text"))
    return (
        topk.join(F.broadcast(q), "qid")
        .join(c, "docid")
        .select("qid", "query", "docid", "text", "rank")
    )


def mine_hard_negatives(
    results: DataFrame,
    positives: DataFrame,
    range_start: int = 10,
    range_end: int = 210,
    n_negatives: int = 15,
    seed: int = 42,
) -> DataFrame:
    """Anti-join out known positives, keep ranks in [range_start, range_end),
    then keep n per query by seeded hash order (deterministic across runs
    and cluster sizes, unlike driver-side random.sample; md5-based so the
    pick order is reproducible in any engine — functions/hashing.py)."""
    from flagembedding_spark.functions.hashing import md5_prefix_long

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    ranked = results.withColumn("rank", F.row_number().over(w))
    cand = (
        ranked.filter(
            (F.col("rank") >= range_start) & (F.col("rank") < range_end)
        )
        .join(
            positives.select("qid", "docid"), ["qid", "docid"], "left_anti"
        )
    )
    pick_key = md5_prefix_long(
        F.concat_ws("|", F.col("qid"), F.col("docid").cast("string"), F.lit(str(seed)))
    )
    ws = Window.partitionBy("qid").orderBy(pick_key, F.asc("docid"))
    return (
        cand.withColumn("pick", F.row_number().over(ws))
        .filter(F.col("pick") <= n_negatives)
        .select("qid", "docid", "score", "rank")
    )
