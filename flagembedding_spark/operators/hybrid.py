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


# ---------------------------------------------------------------------------
# BGE-M3 score family: lexical (sparse) matching + three-way ensemble
# ---------------------------------------------------------------------------

def lexical_weights_from_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, weight = tf/dl) — the shape of the reference's per-text
    lexical-weight dict ({token: weight}, m3.py:120-132), derived
    deterministically from text so the sparse path is testable without the
    neural encoder. One hash-agg shuffle."""
    from flagembedding_spark.functions.tokenize import whitespace_tokens

    toks = whitespace_tokens(text_col)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.size(toks).cast("double").alias("dl"),
            F.explode(toks).alias("term"),
        )
        .groupBy("id", "term", "dl")
        .agg(F.count("*").alias("tf"))
        .select(
            "id", "term", (F.col("tf") / F.col("dl")).alias("weight")
        )
    )


def lexical_matching_scores(
    q_weights: DataFrame, d_weights: DataFrame
) -> DataFrame:
    """The reference's compute_lexical_matching_score (m3.py:134-166):
    score(q, d) = Σ over SHARED tokens of qw(t)·dw(t) — a sparse dot
    product. Inputs (qid, term, weight) and (docid, term, weight); the tiny
    query side broadcasts into the term join, so the doc-weight table is
    never shuffled. → (qid, docid, score); pairs sharing no token are
    absent (score 0 by convention, coalesced by consumers)."""
    q = q_weights.select("qid", "term", F.col("weight").alias("qw"))
    d = d_weights.select(
        F.col("id").alias("docid"), "term", F.col("weight").alias("dw")
    )
    return (
        d.join(F.broadcast(q), "term")
        .groupBy("qid", "docid")
        .agg(F.sum(F.col("qw") * F.col("dw")).alias("score"))
    )


def m3_ensemble_topk(
    dense: DataFrame,
    sparse: DataFrame,
    colbert: DataFrame,
    weights: tuple[float, float, float] = (0.4, 0.2, 0.4),
    k: int = 10,
    round_scores: int | None = None,
) -> DataFrame:
    """BGE-M3's 'colbert+sparse+dense' ensemble
    (m3.py:688-726, modeling.py:239-263): weighted MEAN of the three score
    surfaces — (wd·dense + ws·sparse + wc·colbert) / (wd+ws+wc) — with a
    missing pair contributing 0 on that surface. Inputs are
    (qid, docid, score) frames; → (qid, docid, score, rank ≤ k),
    (score DESC, docid ASC)."""
    wd, ws, wc = (float(x) for x in weights)
    total = wd + ws + wc

    def pre(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            "qid", "docid", F.col("score").alias(name)
        )

    joined = (
        pre(dense, "s_dense")
        .join(pre(sparse, "s_sparse"), ["qid", "docid"], "full_outer")
        .join(pre(colbert, "s_colbert"), ["qid", "docid"], "full_outer")
    )
    score = (
        F.coalesce("s_dense", F.lit(0.0)) * wd
        + F.coalesce("s_sparse", F.lit(0.0)) * ws
        + F.coalesce("s_colbert", F.lit(0.0)) * wc
    ) / total
    out = joined.select("qid", "docid", score.alias("score"))
    if round_scores is not None:
        out = out.withColumn("score", F.round("score", round_scores))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "score", "rank")
    )


def rrf_fusion(
    runs: list[DataFrame],
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) — the
    standard rank-based hybrid combiner (Elasticsearch/OpenSearch default):
    score(d) = Σ over runs 1/(k0 + rank_run(d)). Contributions are emitted
    as FIXED-POINT integers round(10⁹/(k0+rank)) so the sum is exact and
    associative — identical across engines regardless of partition order
    or run count (the float form is not, for ≥3 addends). → (qid, docid,
    rrf_score int64, rank ≤ k), ties broken by docid."""
    if not runs:
        raise ValueError("need at least one run")
    contribs = None
    for r in runs:
        c = r.select(
            "qid",
            "docid",
            F.round(F.lit(1_000_000_000.0) / (F.lit(k0) + F.col("rank")))
            .cast("long")
            .alias("c"),
        )
        contribs = c if contribs is None else contribs.unionByName(c)
    fused = contribs.groupBy("qid", "docid").agg(
        F.sum("c").alias("rrf_score")
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("rrf_score"), F.asc("docid")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "rrf_score", "rank")
    )
