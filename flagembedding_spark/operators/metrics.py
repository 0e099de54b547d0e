"""IR metric operators — the eval-harness contract
(FlagEmbedding/abc/evaluation/utils.py):

- MRR@k               utils.py:14-52   (sort desc, first relevant hit)
- Recall@k            pytrec_eval `recall.k` via utils.py:95-147
- capped recall R_cap@k  utils.py:56-91 (denominator min(#rel, k))
- nDCG@k              trec_eval `ndcg_cut.k` semantics: linear gain
                      rel/log2(rank+1), ideal from qrels sorted desc
- P@k                 pytrec_eval `P.k`

Means are over queries present in qrels, rounded to 5 decimals
(utils.py:141-146). All computed as joins + windows + aggregations — one
left join of results to qrels (J5) feeds every metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ranked(results: DataFrame) -> DataFrame:
    """(Re)assign deterministic 1-based ranks per qid: score DESC, docid ASC
    (the reference sorts by score desc; docid tie-break is our canon)."""
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return results.select("qid", "docid", "score").withColumn(
        "rank", F.row_number().over(w)
    )


def retrieval_metrics_binary(
    results: DataFrame,
    labels: DataFrame,
    k_values: list[int] = (1, 5, 10),
    round_dp: int = 5,
) -> DataFrame:
    """The llm_embedder index-label metric family
    (research/llm_embedder/src/retrieval/metrics.py:124-231) — binary
    relevance, means over the queries present in PREDICTIONS:

    - mrr@k    : 1/rank of the FIRST hit if it lands ≤ k, else 0 (:134-158)
    - recall@k : |label ∩ pred[:k]| / |label|  (UNCAPPED denominator, unlike
                 R_cap — :163-189)
    - ndcg@k   : Σ_hits≤k 1/log2(rank+1), IDCG from the LABEL COUNT
                 (first min(|label|, k) ideal positions — :193-231)

    → (metric string, k int, value double)."""
    spark = results.sparkSession
    ranked = _ranked(results) if "rank" not in results.columns else (
        results.select("qid", "docid", "rank")
    )
    lab = labels.select("qid", "docid").distinct()
    qset = ranked.select("qid").distinct()
    n_q = qset.count()
    if n_q == 0:
        return spark.createDataFrame([], "metric string, k int, value double")
    hits = ranked.join(lab, ["qid", "docid"]).select("qid", "rank")
    nlab = lab.groupBy("qid").agg(F.count("*").alias("n_label"))

    out = []
    for k in k_values:
        hk = hits.filter(F.col("rank") <= k)
        per_q = hk.groupBy("qid").agg(
            F.min("rank").alias("first_hit"),
            F.count("*").alias("n_hit"),
            F.sum(1.0 / F.log2(F.col("rank") + 1)).alias("dcg"),
        )
        # idcg from label count: sum_{j=1..min(n_label,k)} 1/log2(j+1)
        idcg = F.aggregate(
            F.sequence(F.lit(1), F.least(F.col("n_label"), F.lit(k))),
            F.lit(0.0),
            lambda a, j: a + 1.0 / F.log2(j.cast("double") + 1.0),
        )
        full = (
            qset.join(per_q, "qid", "left")
            .join(nlab, "qid", "left")
            .select(
                F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)).alias("rr"),
                # a qid with predictions but NO labels contributes 0 (like
                # mrr/ndcg) instead of a NULL that F.avg silently drops —
                # 'means over queries present in predictions' (ADVICE r02)
                F.coalesce(
                    F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_label"),
                    F.lit(0.0),
                ).alias("recall"),
                F.coalesce(F.col("dcg") / idcg, F.lit(0.0)).alias("ndcg"),
            )
        )
        row = full.agg(
            F.round(F.avg("rr"), round_dp).alias("mrr"),
            F.round(F.avg("recall"), round_dp).alias("recall"),
            F.round(F.avg("ndcg"), round_dp).alias("ndcg"),
        ).collect()[0]
        for m in ("mrr", "recall", "ndcg"):
            out.append((m, k, float(row[m])))
    return spark.createDataFrame(out, "metric string, k int, value double")


def ir_metrics_by_group(
    results: DataFrame,
    qrels: DataFrame,
    groups: DataFrame,
    k_values: list[int] = (10,),
    round_dp: int = 5,
    group_col: str = "lang",
) -> DataFrame:
    """Per-group (per-language) metric rollup + unweighted cross-group mean —
    the MLDR evaluation shape (step2-eval_sparse_mldr.py:182-192 evaluates
    each language's qrels/run separately; :94-108 'average' = np.mean of the
    per-language scores). ``groups`` maps qid → group label; the driver loop
    over groups mirrors the reference's language loop (group count is small
    by construction). → (lang, metric, k, value) incl. lang='average'."""
    spark = results.sparkSession
    gvals = sorted(
        r["g"] for r in groups.select(F.col(group_col).alias("g")).distinct().collect()
    )
    rows: list[tuple] = []
    for g in gvals:
        qset = groups.filter(F.col(group_col) == g).select("qid").distinct()
        m = ir_metrics(
            results.join(F.broadcast(qset), "qid"),
            qrels.join(F.broadcast(qset), "qid"),
            k_values, round_dp,
        )
        rows.extend((g, r["metric"], r["k"], r["value"]) for r in m.collect())
    import math

    def _round_half_away(v: float, dp: int) -> float:
        # SQL/trec-style rounding (half away from zero on the double) — NOT
        # Python's round(): the cross-group mean of 5dp values lands on
        # .XXXXX5 constantly and banker's rounding would disagree with the
        # oracle engine by one ulp
        p = 10 ** dp
        return math.floor(v * p + 0.5) / p

    by_mk: dict[tuple, list[float]] = {}
    for _, metric, k, v in rows:
        by_mk.setdefault((metric, k), []).append(v)
    rows.extend(
        ("average", metric, k, _round_half_away(sum(vs) / len(vs), round_dp))
        for (metric, k), vs in sorted(by_mk.items())
    )
    return spark.createDataFrame(
        rows, f"{group_col} string, metric string, k int, value double"
    )


def ir_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k_values: list[int] = (1, 3, 5, 10),
    round_dp: int = 5,
) -> DataFrame:
    """→ (metric string, k int, value double), metrics ∈
    {mrr, recall, r_cap, ndcg, precision}."""
    spark = results.sparkSession
    ranked = _ranked(results)

    pos = qrels.filter(F.col("relevance") > 0)
    # per-query relevant count + ideal gains (for idcg)
    wq = Window.partitionBy("qid").orderBy(F.desc("relevance"), F.asc("docid"))
    ideal = pos.withColumn("irank", F.row_number().over(wq))

    hits = ranked.join(
        pos.select("qid", "docid", "relevance"), ["qid", "docid"], "inner"
    )

    out = []
    qids = pos.select("qid").distinct()
    n_q = qids.count()
    if n_q == 0:
        return spark.createDataFrame([], "metric string, k int, value double")

    for k in k_values:
        hk = hits.filter(F.col("rank") <= k)

        # average precision: precision at each relevant position within top-k
        # divided by the total relevant count (trec_eval map_cut semantics)
        w_hit = Window.partitionBy("qid").orderBy("rank")
        hk = hk.withColumn(
            "prec_at_hit", F.row_number().over(w_hit) / F.col("rank")
        )

        per_q = hk.groupBy("qid").agg(
            F.min("rank").alias("first_hit"),
            F.count("*").alias("n_hit"),
            F.sum(F.col("relevance") / F.log2(F.col("rank") + 1)).alias("dcg"),
            F.sum("prec_at_hit").alias("ap_num"),
        )
        idcg = ideal.filter(F.col("irank") <= k).groupBy("qid").agg(
            F.sum(F.col("relevance") / F.log2(F.col("irank") + 1)).alias("idcg")
        )
        nrel = pos.groupBy("qid").agg(F.count("*").alias("n_rel"))

        full = (
            qids.join(per_q, "qid", "left")
            .join(idcg, "qid", "left")
            .join(nrel, "qid", "left")
            .select(
                F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)).alias("rr"),
                F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
                F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)).alias("ndcg"),
                F.coalesce(F.col("ap_num"), F.lit(0.0)).alias("ap_num"),
                F.col("n_rel"),
            )
        )
        row = full.agg(
            F.round(F.avg("rr"), round_dp).alias("mrr"),
            F.round(F.avg(F.col("n_hit") / F.col("n_rel")), round_dp).alias("recall"),
            F.round(
                F.avg(F.col("n_hit") / F.least(F.col("n_rel"), F.lit(k))), round_dp
            ).alias("r_cap"),
            F.round(F.avg("ndcg"), round_dp).alias("ndcg"),
            F.round(F.avg(F.col("n_hit") / F.lit(float(k))), round_dp).alias(
                "precision"
            ),
            F.round(F.avg(F.col("ap_num") / F.col("n_rel")), round_dp).alias("map"),
        ).collect()[0]
        for m in ("mrr", "recall", "r_cap", "ndcg", "precision", "map"):
            out.append((m, k, float(row[m])))

    return spark.createDataFrame(out, "metric string, k int, value double")
