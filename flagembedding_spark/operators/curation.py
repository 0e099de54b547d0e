"""Corpus-curation operators for large-scale training-data pipelines:
deterministic stratified sampling and the end-to-end cleaning pass a 100 TB
ingest runs before index build / training-data export.

The reference's data prep assumes already-curated corpora (its corpus
loaders read finished JSONL — FlagEmbedding/abc/evaluation/data_loader.py);
these operators are the upstream stage, built on the same
cross-engine-stable hash primitives (functions/hashing.py) so every
decision is verifiable against an independent SQL engine.

Scale shape: stratified_sample is a PURE FILTER (no shuffle, no state —
each row's keep/drop is a function of its own id hash); clean_corpus
composes the existing columnar lang/quality signals with the exact-dedup
keep-list join, i.e. one sha-keyed shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flagembedding_spark.functions.hashing import md5_prefix_long
from flagembedding_spark.functions.tokenize import whitespace_tokens

SAMPLE_RESOLUTION = 1_000_000


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 7,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by a
    CONTENT-DETERMINISTIC hash of the row id — not an RNG: re-running on the
    same data (any partitioning, any cluster size) keeps exactly the same
    rows, appends never resample old rows, and the decision is reproducible
    in any engine with md5 (the oracle recomputes it). u(id) =
    (md5_60bit(id:seed) mod 1e6)/1e6 < rate[stratum].

    No shuffle: the rate lookup is a Catalyst map literal, the filter is
    row-local. Unknown strata fall to ``default_rate``."""
    u = (
        md5_prefix_long(
            F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
        )
        % SAMPLE_RESOLUTION
    )
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv]
    )
    thresh = (
        F.coalesce(rate_map[F.col(strata_col)], F.lit(float(default_rate)))
        * SAMPLE_RESOLUTION
    )
    return df.filter(u < thresh)


def clean_corpus(
    df: DataFrame,
    min_quality: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """The standard pre-training cleaning pass, one composed plan:

    1. exact dedup — keep only each content group's representative
       (min id), via the sha-keyed aggregate + a keep-list join
    2. language ID (columnar two-stage heuristic, textstats.lang_id)
    3. quality scoring (textstats.quality_score) with a threshold

    → (doc_id, lang_pred, quality) of the surviving docs. ``keep_langs``
    None admits every language (the filter is then quality+dedup only)."""
    from flagembedding_spark.operators.dedup import exact_dedup
    from flagembedding_spark.operators.textstats import lang_id, quality_score

    keep = exact_dedup(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    scored = quality_score(lang_id(df, text_col), text_col)
    out = (
        scored.join(keep, id_col)
        .filter(F.col("quality") >= min_quality)
        .select(id_col, "lang_pred", "quality")
    )
    if keep_langs is not None:
        out = out.filter(F.col("lang_pred").isin(list(keep_langs)))
    return out


# ---------------------------------------------------------------------------
# text cleaning: PII redaction + within-document repeated-segment removal
# ---------------------------------------------------------------------------

# patterns restricted to the Java-regex ∩ RE2 common subset so the DuckDB
# oracle runs the IDENTICAL expressions
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{9,16}\b", "<NUM>"),  # phone/account/cc-sized digit runs
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``redacted`` (the scrubbed text) and ``n_redactions`` — chained
    columnar regexp_replace, no UDF. Order matters: emails first (their
    local parts can contain digit runs), then IPs (dotted quads would
    otherwise half-match the digit-run rule), then long digit runs."""
    # counts run on the PROGRESSIVELY-redacted text so digit runs inside an
    # email/IP aren't double-counted after the earlier rule consumed them
    cur = F.col(text_col)
    counts = []
    for pat, repl in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))))
        cur = F.regexp_replace(cur, pat, repl)
    n = counts[0]
    for c in counts[1:]:
        n = n + c
    return df.select(
        "*", cur.alias("redacted"), n.cast("int").alias("n_redactions")
    )


def dedup_segments_within_doc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Remove REPEATED segments (lines / paragraphs / tokens, by ``sep``)
    within each document, keeping first occurrences in order — the standard
    boilerplate-paragraph cleanup in LLM corpus prep. Pure columnar:
    array_distinct preserves first-occurrence order in Spark. Adds
    ``cleaned`` and ``n_dropped``."""
    parts = F.split(F.col(text_col), F.lit(sep), -1)
    kept = F.array_distinct(parts)
    return df.select(
        "*",
        F.array_join(kept, sep).alias("cleaned"),
        (F.size(parts) - F.size(kept)).cast("int").alias("n_dropped"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
    eval_id_col: str = "doc_id",
) -> DataFrame:
    """Training-set decontamination (the GPT-3/PaLM n-gram overlap rule):
    flag every training document sharing at least one ``n``-gram token
    shingle with the evaluation benchmark set → (doc_id, n_matched_grams),
    counting DISTINCT matched shingles per doc. Anti-join the result
    against the corpus for the clean view.

    Scale shape: both sides shingle with the dedup module's JVM-only
    shingler; the match is one equi-join on the shingle key — the eval
    side is benchmark-sized (≪ corpus) so Catalyst/AQE broadcasts it; the
    count aggregates map-side. No O(corpus²) anything."""
    from flagembedding_spark.operators.dedup import token_shingles

    train_sh = token_shingles(docs, n, text_col, id_col)
    eval_sh = (
        token_shingles(eval_docs, n, eval_text_col, eval_id_col)
        .select("shingle")
        .distinct()
    )
    return (
        train_sh.join(eval_sh, "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_matched_grams"))
        .select(F.col("id").alias(id_col), "n_matched_grams")
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``n_bigrams``         total token bigrams (docs with < 2 tokens are
                            absent — no bigram support)
    - ``dup_bigram_frac``   1 − distinct/total bigrams (near-1 = loopy,
                            boilerplate, or generated text)
    - ``top_bigram_frac``   occurrences of the most frequent bigram /
                            total (the Gopher top-n-gram fraction, n=2)

    Fractions are single integer divisions rounded once — no float SUM,
    cross-engine-stable. One explode + two aggregations; the bigram
    stream stays partition-local until the (doc, bigram) count."""
    toks = whitespace_tokens(text_col)
    bg = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bgc = (
        docs.select(F.col(id_col).alias("id"), F.explode(bg).alias("bg"))
        .groupBy("id", "bg")
        .agg(F.count("*").alias("c"))
    )
    agg = bgc.groupBy("id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    nb = F.col("n_bigrams").cast("double")
    return agg.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        F.round(F.lit(1.0) - F.col("n_distinct") / nb, round_to).alias(
            "dup_bigram_frac"
        ),
        F.round(F.col("top_c") / nb, round_to).alias("top_bigram_frac"),
    )
