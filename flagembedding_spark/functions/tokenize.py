"""Tokenization — JVM-side column expressions only (no Python in the hot path).

Reference semantics matched:

- T1 whitespace tokenizer: ``text.split(" ")`` — a *single-space* split; runs of
  spaces yield empty-string tokens, which the reference indexes like any term
  (research/llm_embedder/src/retrieval/modeling_bm25.py:164-165,213-214).
  Spark's ``split(col, ' ', -1)`` reproduces this exactly (limit=-1 keeps
  trailing empties, same as Python str.split(" ")).

- T2 pre-tokenize-then-space-join: the reference tokenizes with an external
  tokenizer and re-joins with spaces before indexing
  (research/C_MTEB/MLDR/sparse_retrieval/bm25_baseline_same_tokenizer.py:26-64).
  Our code tokenizer follows that pattern: tokenize once at ingest, share the
  token stream between engine and oracle so goldens test index+scoring only.

- T7 query sanitization: newline/tab → space, drop empty-after-strip queries
  (modeling_bm25.py:42-48; MLDR bm25_baseline.py:43).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# identifiers | numbers | any single non-space-non-word char (code punctuation)
CODE_TOKEN_RE = r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[^\sA-Za-z0-9_]"


def whitespace_tokens(col: Column | str) -> Column:
    """Exact reference semantics: single-space split, empties preserved."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ", -1)


def code_tokens(col: Column | str, split_identifiers: bool = False) -> Column:
    """Code-aware tokenizer: identifiers / numbers / single punctuation chars.

    With ``split_identifiers`` snake_case and camelCase identifiers are further
    split into lowercased subtokens (all via JVM expressions — regexp insertion
    of spaces, then split — no Python UDF).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(c, F.lit(CODE_TOKEN_RE), 0)
    if split_identifiers:
        sub = F.transform(
            toks,
            lambda t: F.split(
                F.lower(
                    F.regexp_replace(
                        F.regexp_replace(t, r"([a-z0-9])([A-Z])", r"$1 $2"), "_", " "
                    )
                ),
                " ",
            ),
        )
        toks = F.filter(F.flatten(sub), lambda t: t != F.lit(""))
    return toks


def stop_filter(tokens: Column, stop_tokens: frozenset[str] | set[str]) -> Column:
    """T3 stop-token filter. NOTE: doc length must be computed on the
    *unfiltered* token array (modeling_bm25.py:180) — callers measure
    ``size(tokens)`` before applying this."""
    if not stop_tokens:
        return tokens
    stop_arr = F.array(*[F.lit(t) for t in sorted(stop_tokens)])
    return F.filter(tokens, lambda t: ~F.array_contains(stop_arr, t))


def sanitize_queries(df: DataFrame, query_col: str = "query") -> DataFrame:
    """T7: escape newlines/tabs to spaces and drop queries empty after strip
    (modeling_bm25.py:42-48; MLDR variant replaces \\n,\\t with ' ')."""
    cleaned = F.regexp_replace(F.col(query_col), "[\\n\\t\\r]", " ")
    return df.withColumn(query_col, cleaned).filter(
        F.length(F.trim(F.col(query_col))) > 0
    )


def normalize_text(col: Column | str) -> Column:
    """T4/T5-style normalization used by dedup/fingerprinting: lowercase and
    collapse whitespace runs (the MKQA path lowercases + unicode-normalizes,
    evaluation/mkqa/utils/normalize_text.py; we keep the cheap JVM subset)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
