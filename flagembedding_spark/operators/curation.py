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
