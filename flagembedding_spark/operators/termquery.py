"""Multi-term queries: prefix and fuzzy term expansion (Lucene
PrefixQuery / FuzzyQuery analogs) over the BM25 engine.

Lucene rewrites a multi-term query by expanding it against the terms
dictionary (FST seek / Levenshtein automaton) into a bounded disjunction.
The distributed analog here: ONE pushed-down scan of the dictionary per
query batch, expansion capped deterministically at ``max_expansions``
terms per query ranked (df DESC, term ASC) — the highest-df terms are the
ones that can change top-k most, and the ordering is total so both
engines expand identically. Expanded terms then score as a standard BM25
disjunction with qtf = 1 each (the blended-scoring rewrite shape; Lucene's
exact boost blending is IDF-anachronistic and not replicated — the rule
here is fixed and documented rather than emergent).

Scale shape: query terms/prefixes are broadcast into the dictionary scan
(predicate pushdown on the term column — `startswith` prunes parquet row
groups via min/max stats); the expansion output is ≤ queries ×
max_expansions rows and feeds the flagship broadcast-join plan unchanged.
Fuzzy adds a length-window pre-filter (|len(t)−len(q)| ≤ max_edits)
before the Levenshtein evaluation so the scan stays cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flagembedding_spark.operators.index_build import InvertedIndex


def expand_prefix(
    index: InvertedIndex,
    prefixes: DataFrame,
    max_expansions: int = 50,
    qid_col: str = "query_id",
    prefix_col: str = "prefix",
) -> DataFrame:
    """→ (qid, term, qtf=1): dictionary terms starting with each query's
    prefix, capped at ``max_expansions`` by (df DESC, term ASC)."""
    p = prefixes.select(
        F.col(qid_col).alias("qid"), F.col(prefix_col).alias("prefix")
    )
    cand = index.dictionary.select("term", "df").join(
        F.broadcast(p),
        F.col("term").startswith(F.col("prefix")),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= max_expansions)
        .select("qid", "term", F.lit(1).cast("long").alias("qtf"))
    )


def expand_fuzzy(
    index: InvertedIndex,
    terms: DataFrame,
    max_edits: int = 1,
    max_expansions: int = 50,
    qid_col: str = "query_id",
    term_col: str = "qterm",
) -> DataFrame:
    """→ (qid, term, qtf=1): dictionary terms within Levenshtein distance
    ``max_edits`` of each query term (the exact term itself included, as
    FuzzyQuery), capped like expand_prefix."""
    q = terms.select(
        F.col(qid_col).alias("qid"), F.col(term_col).alias("qterm")
    )
    cand = (
        index.dictionary.select("term", "df")
        .join(
            F.broadcast(q),
            # cheap length window first; the Levenshtein evaluates only on
            # survivors (Catalyst keeps conjunct order here)
            (
                F.abs(F.length("term") - F.length("qterm"))
                <= F.lit(max_edits)
            )
            & (F.levenshtein("term", "qterm") <= F.lit(max_edits)),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= max_expansions)
        .select("qid", "term", F.lit(1).cast("long").alias("qtf"))
    )


def wildcard_to_regex(pattern: str) -> str:
    """Lucene wildcard syntax → anchored regex: ``*`` = any sequence,
    ``?`` = exactly one char, everything else literal. The output uses
    only `.`/`.*`/escaped literals — a subset with identical semantics in
    Java regex (Spark rlike) and RE2-style engines (DuckDB
    regexp_matches)."""
    import re as _re

    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "^" + "".join(out) + "$"


def expand_wildcard(
    index: InvertedIndex,
    patterns: DataFrame,
    max_expansions: int = 50,
    qid_col: str = "query_id",
    pattern_col: str = "pattern",
) -> DataFrame:
    """→ (qid, term, qtf=1): dictionary terms matching each query's
    wildcard pattern (`*`/`?`), capped like expand_prefix. A
    leading-wildcard pattern scans the whole dictionary (Lucene disallows
    it by default for the same reason) — allowed here because the scan is
    distributed, but prefer an anchored prefix when possible."""
    # patterns are query-set-sized: translate driver-side (no UDF) and
    # re-broadcast the tiny (qid, regex) table
    rows = patterns.select(
        F.col(qid_col).alias("qid"), F.col(pattern_col).alias("pattern")
    ).collect()
    p = patterns.sparkSession.createDataFrame(
        [(r["qid"], wildcard_to_regex(r["pattern"])) for r in rows],
        "qid string, rx string",
    )
    cand = index.dictionary.select("term", "df").join(
        F.broadcast(p), F.regexp_like(F.col("term"), F.col("rx"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= max_expansions)
        .select("qid", "term", F.lit(1).cast("long").alias("qtf"))
    )


def wildcard_search_topk(
    index: InvertedIndex,
    patterns: DataFrame,
    k: int = 10,
    max_expansions: int = 50,
    round_scores: int | None = None,
    qid_col: str = "query_id",
    pattern_col: str = "pattern",
) -> DataFrame:
    """Top-k BM25 over the wildcard-expanded disjunction."""
    qt = expand_wildcard(
        index, patterns, max_expansions, qid_col, pattern_col
    )
    return _score_expanded(index, qt, k, round_scores)


def _score_expanded(
    index: InvertedIndex, qt: DataFrame, k: int, round_scores: int | None
) -> DataFrame:
    from flagembedding_spark.operators.query import bm25_partial_scores

    scored = (
        bm25_partial_scores(index, qt)
        .groupBy("qid", "docid")
        .agg(F.sum("s").alias("score"))
    )
    if round_scores is not None:
        scored = scored.withColumn("score", F.round("score", round_scores))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "score", "rank")
    )


def prefix_search_topk(
    index: InvertedIndex,
    prefixes: DataFrame,
    k: int = 10,
    max_expansions: int = 50,
    round_scores: int | None = None,
    qid_col: str = "query_id",
    prefix_col: str = "prefix",
) -> DataFrame:
    """Top-k BM25 over the expanded prefix disjunction."""
    qt = expand_prefix(index, prefixes, max_expansions, qid_col, prefix_col)
    return _score_expanded(index, qt, k, round_scores)


def fuzzy_search_topk(
    index: InvertedIndex,
    terms: DataFrame,
    k: int = 10,
    max_edits: int = 1,
    max_expansions: int = 50,
    round_scores: int | None = None,
    qid_col: str = "query_id",
    term_col: str = "qterm",
) -> DataFrame:
    """Top-k BM25 over the fuzzy-expanded disjunction."""
    qt = expand_fuzzy(
        index, terms, max_edits, max_expansions, qid_col, term_col
    )
    return _score_expanded(index, qt, k, round_scores)


def spell_suggest(
    index: InvertedIndex,
    terms: DataFrame,
    max_edits: int = 2,
    n_suggest: int = 5,
    qid_col: str = "query_id",
    term_col: str = "qterm",
) -> DataFrame:
    """→ (qid, qterm, suggestion, df, rank): spelling corrections PER
    query term — the Lucene DirectSpellChecker analog (it suggests per
    term, so a query with several misspellings gets its own top-n for
    each), ranked the way its default comparator breaks ties after edit
    distance is windowed: higher-df (more popular) terms first, then
    lexicographic. The exact input term is EXCLUDED (a suggestion must
    differ); candidates come from the same length-windowed Levenshtein
    dictionary scan as expand_fuzzy (dictionary-sized, broadcast query
    side, no postings touched)."""
    q = terms.select(
        F.col(qid_col).alias("qid"), F.col(term_col).alias("qterm")
    )
    cand = index.dictionary.select("term", "df").join(
        F.broadcast(q),
        (
            F.abs(F.length("term") - F.length("qterm"))
            <= F.lit(max_edits)
        )
        & (F.col("term") != F.col("qterm"))
        & (F.levenshtein("term", "qterm") <= F.lit(max_edits)),
    )
    w = Window.partitionBy("qid", "qterm").orderBy(
        F.desc("df"), F.asc("term")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_suggest)
        .select("qid", "qterm", F.col("term").alias("suggestion"), "df",
                "rank")
    )
