"""QA-recall operators (the MKQA evaluation path):

- J6 answer-containment join: does a retrieved doc contain a gold answer?
  The reference matches answer token sequences inside normalized doc tokens
  (evaluation/mkqa/utils/compute_metrics.py:37-62). We implement the same
  whole-token contiguous-subsequence match as a space-padded substring test
  over normalized text — identical semantics for whitespace-tokenized text,
  and expressible in any engine.
- QA recall@k: fraction of queries whose top-k contains ≥1 answer-bearing
  doc (evaluation/mkqa/evaluator.py:87-114, RocketQA-style).
- T8 instruction templating: '{instruction}{text}' query prefixing
  (abc/inference/AbsEmbedder.py:156-170).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolved by pandas_udf type-hint inference
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flagembedding_spark.functions.tokenize import normalize_text


def _padded(c: Column) -> Column:
    return F.concat(F.lit(" "), c, F.lit(" "))


def answer_containment(
    results: DataFrame,
    answers: DataFrame,
    corpus: DataFrame,
    docid_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """results (qid, docid, rank) ⋈ answers (qid, answer) ⋈ corpus →
    (qid, docid, rank, contains): whole-token answer match in normalized doc
    text. Answers are tiny → broadcast; the corpus join carries the text."""
    docs = corpus.select(
        F.col(docid_col).alias("docid"),
        _padded(normalize_text(text_col)).alias("_ntext"),
    )
    ans = answers.select(
        "qid", _padded(normalize_text("answer")).alias("_nans")
    )
    hit = F.max(
        F.when(F.instr(F.col("_ntext"), F.col("_nans")) > 0, 1).otherwise(0)
    )
    return (
        results.select("qid", "docid", "rank")
        .join(docs, "docid")
        .join(F.broadcast(ans), "qid")
        .groupBy("qid", "docid", "rank")
        .agg(hit.alias("contains"))
    )


def answer_containment_unicode(
    results: DataFrame,
    answers: DataFrame,
    corpus: DataFrame,
    docid_col: str = "doc_id",
    text_col: str = "text",
    apply_char_norm: bool = True,
) -> DataFrame:
    """Full-fidelity MKQA containment: corpus text gets the T5 character
    normalization at load (mkqa/data_loader.py:110,125 — JVM expressions),
    then NFD + Unicode word tokenization + uncased token-subsequence match
    (compute_metrics.py:33-48) inside an Arrow-batched pandas UDF (NFD has no
    JVM builtin; this is the eval-side path, same as the reference).
    → (qid, docid, rank, contains)."""
    from pyspark.cloudpickle import register_pickle_by_value
    from pyspark.sql.types import IntegerType

    from flagembedding_spark.functions import unicode_norm
    from flagembedding_spark.functions.unicode_norm import (
        has_answer_py,
        normalize_chars,
    )

    # executors don't have the repo on PYTHONPATH — ship the (pure-stdlib)
    # containment helpers by value inside the UDF closure instead of by
    # module reference
    register_pickle_by_value(unicode_norm)

    text_expr = (
        normalize_chars(text_col) if apply_char_norm else F.col(text_col)
    )
    docs = corpus.select(
        F.col(docid_col).alias("docid"), text_expr.alias("_text")
    )
    ans_agg = answers.groupBy("qid").agg(
        F.sort_array(F.collect_list("answer")).alias("_answers")
    )

    @F.pandas_udf(IntegerType())
    def _contains(answers_s: pd.Series, text_s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                1 if has_answer_py(list(a), t) else 0
                for a, t in zip(answers_s, text_s)
            ],
            dtype="int32",
        )

    return (
        results.select("qid", "docid", "rank")
        .join(docs, "docid")
        .join(F.broadcast(ans_agg), "qid")
        .select(
            "qid", "docid", "rank",
            _contains("_answers", "_text").alias("contains"),
        )
    )


def qa_recall_at_k(
    containment: DataFrame, k_values: list[int] = (1, 5, 10), round_dp: int = 5
) -> DataFrame:
    """→ (metric='qa_recall', k, value): share of queries with ≥1 containing
    doc at rank ≤ k (queries with no containing doc anywhere count 0)."""
    spark = containment.sparkSession
    out = []
    qids = containment.select("qid").distinct()
    n_q = qids.count()
    for k in k_values:
        hits = (
            containment.filter((F.col("rank") <= k) & (F.col("contains") == 1))
            .select("qid").distinct().count()
        )
        out.append(("qa_recall", k, round(hits / n_q, round_dp) if n_q else 0.0))
    return spark.createDataFrame(out, "metric string, k int, value double")


def with_instruction(
    queries: DataFrame, instruction: str, query_col: str = "query"
) -> DataFrame:
    """T8: '{}{}'.format(instruction, sentence) prefixing."""
    return queries.withColumn(
        query_col, F.concat(F.lit(instruction), F.col(query_col))
    )
