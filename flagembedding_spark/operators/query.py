"""BM25 top-k query execution — DataFrame path (no Python in the hot path).

Semantics replicated from NaiveBM25Retriever.search
(research/llm_embedder/src/retrieval/modeling_bm25.py:212-243):

    idf(t)     = ln((N - df + 0.5)/(df + 0.5) + 1)                     # :225
    s(t,d)     = idf * (k1+1) * tf / (tf + k1*(1 - b + b*dl/avgdl))    # :227
                 (the naive oracle uses raw dl, i.e. avgdl ≡ 1 — see
                  BM25Config.use_avgdl; standard BM25 divides by avgdl)
    s(q,d)     = Σ over query tokens; duplicate query tokens count
                 multiply (loop at :217 revisits repeats → qtf factor)
    missing query terms are skipped (:218-221); hits clamped to N (:195);
    top-k resolved by (score DESC, docid ASC) — the reference leaves ties
    unspecified (argpartition, :230-235), we canonicalize.

Physical plan (why it scales):
- query terms are aggregated to (qid, term, qtf) — a tiny DF.
- the term dictionary can be huge, but only query terms matter: join
  dictionary ⋈ broadcast(qterms) first, producing a tiny (term, idf, qid,
  qtf) artifact that is then BROADCAST into the postings join — the big
  postings table is never shuffled for the lookup (J1, the reference's
  ``inverted_lists[token]`` dict probe).
- partial scores are a codegen'd arithmetic projection; the only shuffle is
  the (qid, docid) sum — J2's scatter-add — followed by per-qid top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flagembedding_spark.functions.tokenize import whitespace_tokens
from flagembedding_spark.operators.index_build import InvertedIndex


def driver_local_rows(df: DataFrame):
    """collect() IFF ``df``'s logical plan is driver-originated data — a
    LocalRelation or a LogicalRDD (what PySpark's createDataFrame over a
    Python list builds; nothing in this engine wraps a distributed RDD in
    one). Returns None for every other plan, so distributed inputs are
    never pulled to the driver. Used to keep query-set-sized side inputs
    off the Spark job path entirely. Frames produced by the driver-side
    fast paths carry their rows as an attribute — read back with zero
    jobs."""
    cached = getattr(df, "_fes_local_rows", None)
    if cached is not None:
        return cached
    try:
        cname = df._jdf.queryExecution().logical().getClass().getSimpleName()
    except Exception:
        return None
    if cname in ("LocalRelation", "LogicalRDD"):
        return df.collect()
    return None


def query_terms(queries: DataFrame, qid_col: str = "query_id",
                query_col: str = "query") -> DataFrame:
    """(qid, term, qtf). Duplicate tokens aggregate to qtf>1 (SURVEY §2.5.2).

    Driver-originated query sets (the serving/bench shape) are tokenized on
    the driver with the SAME single-space split, skipping the explode →
    groupBy exchange and its shuffle-stage job; the result feeds the
    downstream broadcast joins directly. Distributed inputs keep the
    explode → groupBy plan."""
    rows = driver_local_rows(queries)
    if rows is not None:
        from pyspark.sql.types import LongType, StructField, StructType

        counts: dict[tuple, int] = {}
        for r in rows:
            # explode(split(NULL)) emits nothing; NULL qids group as-is
            if r[query_col] is None:
                continue
            for t in r[query_col].split(" "):
                k = (r[qid_col], t)
                counts[k] = counts.get(k, 0) + 1
        schema = StructType([
            StructField("qid", queries.select(qid_col).schema[0].dataType),
            StructField("term", queries.select(query_col).schema[0].dataType),
            StructField("qtf", LongType()),
        ])
        # build via pandas+Arrow: a plain createDataFrame(list) parallelizes
        # even a handful of rows across the default parallelism and needs a
        # Python worker round trip per partition at every execution (~0.4 s
        # per downstream broadcast build at local[32]); the Arrow conversion
        # yields a single-partition JVM-executable relation (~0.01 s collect,
        # measured)
        if counts:
            import pandas as pd

            out = queries.sparkSession.createDataFrame(
                pd.DataFrame(
                    [(q, t, c) for (q, t), c in counts.items()],
                    columns=["qid", "term", "qtf"],
                ),
                schema,
            )
        else:
            out = queries.sparkSession.createDataFrame([], schema)
        from pyspark.sql import Row

        out._fes_local_rows = [
            Row(qid=q, term=t, qtf=c) for (q, t), c in counts.items()
        ]
        return out
    return (
        queries.select(F.col(qid_col).alias("qid"), F.explode(whitespace_tokens(query_col)).alias("term"))
        .groupBy("qid", "term")
        .agg(F.count("*").alias("qtf"))
    )


def boosted_query_terms(
    queries: DataFrame,
    qid_col: str = "query_id",
    query_col: str = "query",
) -> tuple[DataFrame, DataFrame]:
    """Parse Lucene ``term^boost`` query syntax → (plain_queries_qterms,
    boosts) for ``bm25_topk(..., boosts=...)``.

    Each whitespace token optionally carries a ``^<number>`` suffix
    (``error^2`` or ``error^2.5``); a bare token boosts at 1.0. Duplicate
    occurrences of a term SUM their boosts (each occurrence contributes
    its own boosted partial — the qtf-revisit semantics of the unboosted
    engine, reference modeling_bm25.py:217). Pure JVM regex — no Python.

    Returns (qterms, boosts): ``qterms`` is (qid, term, qtf=1) with the
    boost markers stripped — feed the SUMMED boost through ``boosts``
    so partial = idf·tfnorm·Σboosts exactly."""
    tok = F.explode(whitespace_tokens(query_col)).alias("tok")
    raw = queries.select(F.col(qid_col).alias("qid"), tok)
    boost_re = r"\^(\d+(?:\.\d+)?)$"
    parsed = raw.select(
        "qid",
        F.regexp_replace("tok", boost_re, "").alias("term"),
        F.coalesce(
            F.nullif(F.regexp_extract("tok", boost_re, 1), F.lit("")),
            F.lit("1.0"),
        ).cast("double").alias("b1"),
    )
    agg = parsed.groupBy("qid", "term").agg(F.sum("b1").alias("boost"))
    qterms = agg.select("qid", "term", F.lit(1).cast("long").alias("qtf"))
    return qterms, agg.select("qid", "term", "boost")


def bm25_partial_scores(
    index: InvertedIndex,
    qterms: DataFrame,
    k1: float | None = None,
    b: float | None = None,
) -> DataFrame:
    """(qid, docid, partial score) before the scatter-add aggregation."""
    cfg = index.config
    k1 = cfg.k1 if k1 is None else k1
    b = cfg.b if b is None else b
    avgdl = index.avgdl_effective

    # tiny: only terms that appear in some query survive this join
    qt_cols = ["term", "qid", "qtf", "idf"] + (
        ["boost"] if "boost" in qterms.columns else []
    )
    qt_idf = index.dictionary.join(F.broadcast(qterms), "term").select(*qt_cols)

    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
    partial = F.col("qtf") * F.col("idf") * F.lit(k1 + 1.0) * tf / denom
    if "boost" in qterms.columns:
        # per-term query boost (Lucene `term^boost`): scales the term's
        # partial contribution only — document stats untouched
        partial = partial * F.col("boost")

    if "term_hash" in index.postings.columns:
        # persisted stream indexes carry an int32 term_hash (xxhash64 low
        # bits): probe the broadcast relation on the numeric key
        # (string-key probing over the full postings scan dominated query
        # cost — guide §3.1), then drop hash collisions with an exact
        # string compare on the (tiny) matched set. Bit-identical results:
        # the string check restores exact-term join semantics. It is
        # phrased as >= AND <= because a plain equality would be extracted
        # as a SECOND equi-join key (hashing the string again for every
        # probe — the cost this path removes); the range pair stays a
        # residual condition, evaluated only on hash matches. The probe
        # side sign-extends the same low 32 bits out of the JVM hash via
        # shiftleft/shiftright (no ANSI-throwing overflow cast; the final
        # cast to int is safe because the value fits by construction).
        qh = qt_idf.select(
            F.col("term").alias("_qterm"),
            F.shiftright(F.shiftleft(F.xxhash64("term"), 32), 32)
            .cast("int")  # ANSI-safe: sign-extended low 32 bits fit int32
            .alias("_qh"),
            *[c for c in qt_cols if c != "term"],
        )
        t, qt_, th = F.col("term"), F.col("_qterm"), F.col("term_hash")
        return (
            index.postings.join(
                F.broadcast(qh),
                (th == F.col("_qh")) & (t >= qt_) & (t <= qt_),
            )
            .select("qid", "docid", partial.alias("s"))
        )
    return index.postings.join(F.broadcast(qt_idf), "term").select(
        "qid", "docid", partial.alias("s")
    )


def bm25_topk(
    index: InvertedIndex,
    queries: DataFrame,
    k: int = 10,
    k1: float | None = None,
    b: float | None = None,
    qid_col: str = "query_id",
    query_col: str = "query",
    round_scores: int | None = None,
    min_should_match: int | str = 0,
    exclude_docids=None,
    include_docids: DataFrame | None = None,
    boosts: DataFrame | None = None,
    must_not: DataFrame | None = None,
    qterms: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25 per query: (qid, docid, score, rank). Deterministic ties.

    ``round_scores``: round the summed score to N decimals *before* ranking —
    used by the cross-engine oracle harness so rank order is invariant to
    float summation order between engines.

    ``min_should_match``: Lucene's BooleanQuery knob over the same plan —
    0 (default) is pure disjunction (the reference's behavior,
    modeling_bm25.py:218-221 skips missing terms); an int n keeps only docs
    matching ≥ n DISTINCT query terms; ``'all'`` is conjunctive AND (every
    query term required — a query containing an out-of-vocabulary term
    matches nothing, as in Lucene). Zero extra shuffles: the distinct-term
    match count rides the existing (qid, docid) scatter-add (postings are
    unique per (term, docid), so count(*) IS the distinct matched terms),
    and the per-query required count is a broadcast-joined tiny aggregate.

    ``exclude_docids``: live tombstones (operators/deletes.py) — a docid
    DataFrame or iterable dropped BEFORE ranking. Lucene live-docs
    semantics: deleted docs vanish, surviving docs keep the index's stale
    df/avgdl scores (compact/rebuild to refresh statistics).

    ``include_docids``: metadata-filtered search (Lucene filter clause) —
    a (docid) DataFrame restricting candidates, scores still computed
    with GLOBAL index statistics (a filter never rescores, exactly as a
    Lucene filter query). Applied as a docid join before ranking; at
    cluster scale a hot recurring filter (e.g. per-language) belongs in
    the index layout (partitionBy) instead — this is the ad-hoc path.

    ``boosts``: per-(qid, term) query boosts (Lucene ``term^boost``) — a
    (qid, term, boost) DataFrame; unlisted terms default to 1.0. Scales
    the term's partial contribution only; document statistics untouched.
    Parse Lucene boost syntax with ``boosted_query_terms``.

    ``must_not``: Lucene BooleanClause.MUST_NOT — a (qid, term) DataFrame;
    docs containing ANY prohibited term for that query are removed from
    candidates (exclusion never rescores survivors).
    """
    k = min(k, index.stats.n_docs) if index.stats.n_docs else k
    qt = (
        qterms
        if qterms is not None
        else query_terms(queries, qid_col, query_col)
    )
    if must_not is not None:
        # MUST_NOT precedence (Lucene, same rule as wand_topk): a term
        # both scored and prohibited scores no doc — every doc containing
        # it is excluded below — so its positive row is dropped here too.
        # This keeps min_should_match's required count consistent across
        # engines (the prohibited term is not a requirable match).
        qt = qt.join(
            F.broadcast(must_not.select("qid", "term").distinct()),
            ["qid", "term"], "left_anti",
        )
    if boosts is not None:
        # Lucene `term^boost`: scale a term's contribution (query-set-sized
        # artifact — broadcast left join, unboosted terms default to 1.0).
        # boost == 0 means the term is ABSENT (no zero-score candidates,
        # not a requirable match) — the same rule the segment path applies
        # by dropping w=0-boost streams.
        qt = qt.join(
            F.broadcast(boosts.select("qid", "term", "boost")),
            ["qid", "term"], "left",
        ).withColumn("boost", F.coalesce(F.col("boost"), F.lit(1.0)))
        qt = qt.filter(F.col("boost") != 0)
    scored = (
        bm25_partial_scores(index, qt, k1, b)
        .groupBy("qid", "docid")
        .agg(F.sum("s").alias("score"), F.count("*").alias("nmatched"))
    )
    if min_should_match == "all":
        qneed = qt.groupBy("qid").agg(F.count("*").alias("m_req"))
        scored = scored.join(F.broadcast(qneed), "qid").filter(
            F.col("nmatched") == F.col("m_req")
        )
    elif min_should_match:
        scored = scored.filter(F.col("nmatched") >= int(min_should_match))
    scored = scored.select("qid", "docid", "score")
    if must_not is not None:
        # Lucene BooleanClause.MUST_NOT: a doc containing ANY of the
        # query's prohibited terms is removed from candidates — exclusion
        # never rescores survivors. The not-term list is query-set-sized
        # (broadcast into the postings scan, same shape as the positive
        # lookup); the anti-join runs on (qid, docid) — the aggregation's
        # own grouping keys — so the scored side needs no extra exchange.
        not_docs = (
            index.postings.join(
                F.broadcast(must_not.select("qid", "term")), "term"
            )
            .select("qid", "docid")
            .distinct()
        )
        scored = scored.join(not_docs, ["qid", "docid"], "left_anti")
    if include_docids is not None:
        # filter sets are metadata-selection-sized (≪ corpus); broadcast so
        # the semi-join never shuffles the scored side (AQE usually converts
        # this anyway — the hint makes it deterministic, mirroring exclude)
        scored = scored.join(
            F.broadcast(include_docids.select("docid")), "docid", "left_semi"
        )
    if exclude_docids is not None:
        if isinstance(exclude_docids, DataFrame):
            scored = scored.join(
                F.broadcast(exclude_docids.select("docid")),
                "docid",
                "left_anti",
            )
        else:
            if hasattr(exclude_docids, "to_array"):  # deletes.DocidBitmap
                ids = [int(x) for x in exclude_docids.to_array()]
            else:
                ids = sorted({int(x) for x in exclude_docids})
            if len(ids) > 1000:
                # a giant IN() literal bloats the plan; ship as a broadcast
                # anti-join instead (same shape as the DataFrame branch)
                import pandas as pd

                dead_df = scored.sparkSession.createDataFrame(
                    pd.DataFrame({"docid": pd.array(ids, dtype="int64")})
                )
                scored = scored.join(
                    F.broadcast(dead_df), "docid", "left_anti"
                )
            else:
                scored = scored.filter(~F.col("docid").isin(ids))
    if round_scores is not None:
        scored = scored.withColumn("score", F.round("score", round_scores))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "score", "rank")
    )


def attach_docid_str(results: DataFrame, index: InvertedIndex) -> DataFrame:
    """Map integer docIDs back to string docids (repo:path@commit).
    doc_stats is the small side at query time only for modest top-k result
    sets; we broadcast the *results* into it, not vice versa."""
    return index.doc_stats.select("docid", "docid_str").join(
        F.broadcast(results), "docid"
    )


def reference_result_arrays(
    topk: DataFrame, k: int
) -> DataFrame:
    """Reproduce the reference's padded array contract: positions with score 0
    → docid −1, score −inf (modeling_bm25.py:237-239); short lists padded to k.
    Output: (qid, docids array<long>, scores array<double>)."""
    agg = topk.groupBy("qid").agg(
        F.sort_array(
            F.collect_list(F.struct("rank", "docid", "score"))
        ).alias("hits")
    )
    # try_element_at: under ANSI mode (Spark 4 default) a plain element_at
    # past the end of a short hit list throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    # — exactly the padding case this function exists for.
    pad = F.sequence(F.lit(1), F.lit(k))
    return agg.select(
        "qid",
        F.transform(
            pad,
            lambda i: F.coalesce(
                F.try_element_at(F.col("hits"), i)["docid"], F.lit(-1)
            ),
        ).alias("docids"),
        F.transform(
            pad,
            lambda i: F.coalesce(
                F.try_element_at(F.col("hits"), i)["score"],
                F.lit(float("-inf")),
            ),
        ).alias("scores"),
    )


def bm25_explain(
    index: InvertedIndex,
    queries: DataFrame,
    k: int = 3,
    k1: float | None = None,
    b: float | None = None,
    qid_col: str = "query_id",
    query_col: str = "query",
    round_to: int = 4,
) -> DataFrame:
    """Lucene ``explain()`` analog: per-term score breakdown for each
    query's top-``k`` docs → (qid, docid, rank, term, partial4, score4).
    ``partial4`` is the term's contribution (qtf·idf·(k1+1)·tf / denom),
    rounded once per row — no float SUM in the emitted columns beyond the
    already-rounded total. The top-k set comes from the standard engine;
    the breakdown joins the tiny result set back into partial scores
    (broadcast), so the corpus is scanned exactly as in bm25_topk."""
    top = bm25_topk(
        index, queries, k=k, k1=k1, b=b, qid_col=qid_col,
        query_col=query_col, round_scores=round_to,
    )
    qt = query_terms(queries, qid_col, query_col)
    # bm25_partial_scores drops the term label, so the same expressions are
    # rebuilt here with the term kept (same plan shape)
    cfg = index.config
    k1v = cfg.k1 if k1 is None else k1
    bv = cfg.b if b is None else b
    avgdl = index.avgdl_effective
    qt_idf = index.dictionary.join(F.broadcast(qt), "term").select(
        "term", "qid", "qtf", "idf"
    )
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    denom = tf + F.lit(k1v) * (F.lit(1.0 - bv) + F.lit(bv) * dl / F.lit(avgdl))
    partial = F.col("qtf") * F.col("idf") * F.lit(k1v + 1.0) * tf / denom
    parts = index.postings.join(F.broadcast(qt_idf), "term").select(
        "qid", "docid", "term", F.round(partial, round_to).alias("partial4")
    )
    return parts.join(
        F.broadcast(top), ["qid", "docid"]
    ).select(
        "qid", "docid", "rank", "term", "partial4",
        F.col("score").alias("score4"),
    )


def bm25_search_after(
    index: InvertedIndex,
    queries: DataFrame,
    cursors: DataFrame,
    k: int = 10,
    k1: float | None = None,
    b: float | None = None,
    qid_col: str = "query_id",
    query_col: str = "query",
    round_scores: int | None = 4,
) -> DataFrame:
    """Lucene ``searchAfter`` cursor pagination: return the next ``k``
    results strictly AFTER each query's (after_score, after_docid) cursor
    in the engine's total order (score DESC, docid ASC). Stateless deep
    paging — no from+size over-fetch: page N costs the same single pass as
    page 1, and the cursor row is exactly the last hit of the previous
    page. ``cursors``: (qid, after_score, after_docid); queries without a
    cursor row page from the top. Scores must be compared at the same
    rounding the pages were produced with (``round_scores``)."""
    qt = query_terms(queries, qid_col, query_col)
    scored = (
        bm25_partial_scores(index, qt, k1, b)
        .groupBy("qid", "docid")
        .agg(F.sum("s").alias("score"))
    )
    if round_scores is not None:
        scored = scored.withColumn("score", F.round("score", round_scores))
    cur = cursors.select(
        "qid",
        F.col("after_score").alias("a_s"),
        F.col("after_docid").alias("a_d"),
    )
    scored = scored.join(F.broadcast(cur), "qid", "left").filter(
        F.col("a_s").isNull()
        | (F.col("score") < F.col("a_s"))
        | ((F.col("score") == F.col("a_s")) & (F.col("docid") > F.col("a_d")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "score", "rank")
    )
