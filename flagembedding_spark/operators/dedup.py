"""Deduplication operators for large-scale training-data pipelines.

The reference corpus-prep scripts assume pre-deduplicated data; these are the
operators a 100 TB ingest actually needs before index build. All are
DataFrame-native; every hash is cross-engine-stable (functions/hashing.py)
so correctness is verifiable against an independent SQL engine.

- exact_dedup           sha256 groups (hash-groupBy; one shuffle of (sha) keys)
- token_shingles        n-gram shingling shared by minhash/jaccard
- ngram_jaccard_pairs   exact Jaccard over shingle sets for candidate pairs
- minhash_signatures    k permutations over 60-bit shingle hashes
- lsh_candidate_pairs   band-bucket join (the MinHash-LSH near-dup pipeline)
- simhash               64-bit weighted-bit fingerprint, hamming near-dup
- embedding_neardup     cosine-threshold pairs over an embedding column

Scale notes: pair generation is always candidate-restricted (band buckets /
shared-shingle buckets), never an O(n²) cross join; bucket joins shuffle on
the bucket key and are salt-able exactly like index terms.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flagembedding_spark.functions.hashing import (
    MERSENNE_P,
    md5_prefix_long,
    minhash_params,
)
from flagembedding_spark.functions.tokenize import whitespace_tokens


def _auto_cap(n_docs: int, floor: int = 64) -> int:
    """Default hot-key cap = max(floor, ⌈√N⌉): a bucket (or shingle) of m
    members emits ~m² candidate pairs, so capping m at √N bounds any single
    key's pair count by N — the whole job stays O(N·caps) instead of
    quadratic in the hottest key. The floor keeps small corpora exact."""
    return max(floor, math.isqrt(max(n_docs, 0)) + 1)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (text_sha, dup_count, keep_id): one row per distinct content, the
    kept representative is the smallest id (deterministic)."""
    return (
        df.select(
            F.sha2(F.col(text_col), 256).alias("text_sha"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("text_sha")
        .agg(
            F.count("*").alias("dup_count"),
            F.min("_id").alias("keep_id"),
        )
    )


def token_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (id, shingle) DISTINCT n-gram token shingles, JVM expressions only."""
    toks = whitespace_tokens(text_col)
    # guard: sequence(1, 0) DESCENDS in Spark, and ANSI element_at throws on
    # out-of-bounds — docs shorter than n tokens get an empty shingle array
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | str | None = "auto",
) -> DataFrame:
    """Exact Jaccard over shingle sets, candidate-restricted to pairs sharing
    ≥1 shingle (the shingle bucket join). → (id_a, id_b, jaccard) with
    id_a < id_b and jaccard ≥ threshold.

    ``max_shingle_df`` is the 100 TB guard: a corpus-wide boilerplate shingle
    (license header, codegen preamble) appearing in millions of docs turns
    the shingle bucket join quadratic. With the cap set, shingles whose
    document frequency exceeds it are excluded from CANDIDATE GENERATION
    (they carry no discriminative signal — the stop-token pragmatics of the
    index build), while the Jaccard verification still runs over the FULL
    shingle sets, so any surviving pair's score is exact. Pairs that share
    ONLY above-cap shingles are not emitted (documented recall trade).

    Default 'auto' = max(64, ⌈√N⌉) from a one-job count pre-pass (like the
    index build's df-driven salting) — scale-safe without expert arguments;
    pass None to disable, an int to pin."""
    sh = token_shingles(df, n, text_col, id_col).cache()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    if max_shingle_df == "auto":
        max_shingle_df = _auto_cap(df.select(id_col).count())
    if max_shingle_df is None:
        inter = (
            sh.alias("x")
            .join(sh.alias("y"), "shingle")
            .filter(F.col("x.id") < F.col("y.id"))
            .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .agg(F.count("*").alias("inter"))
        )
    else:
        cold = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        cand_sh = sh.join(cold, "shingle")
        cand = (
            cand_sh.alias("x")
            .join(cand_sh.alias("y"), "shingle")
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
        inter = (
            cand.join(sh.withColumnRenamed("id", "id_a"), "id_a")
            .join(sh.withColumnRenamed("id", "id_b"), ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    n_perms: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 1337,
) -> DataFrame:
    """→ (id, perm, minhash): min over shingles of the j-th permutation hash.
    Documents with fewer than n tokens have no shingles → no rows (callers
    union them back as always-unique)."""
    sh = token_shingles(df, n, text_col, id_col)
    base = md5_prefix_long(F.col("shingle")) % MERSENNE_P
    params = minhash_params(n_perms, seed)
    perms = F.array(
        *[
            F.struct(
                F.lit(j).alias("perm"),
                ((F.lit(a) * base + F.lit(b)) % MERSENNE_P).alias("h"),
            )
            for j, (a, b) in enumerate(params)
        ]
    )
    return (
        sh.select("id", F.explode(perms).alias("p"))
        .groupBy("id", F.col("p.perm").alias("perm"))
        .agg(F.min("p.h").alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_perms: int = 16,
    bands: int = 4,
    max_bucket: int | str | None = "auto",
) -> DataFrame:
    """Band the signature (rows = n_perms/bands), bucket-join on
    (band, band_key) → candidate pairs (id_a < id_b). Collision probability
    for Jaccard s is 1-(1-s^r)^b — the standard LSH S-curve.

    ``max_bucket`` is the 100 TB guard against hot band buckets: a bucket of
    m near-identical docs (boilerplate files, vendored copies) would emit
    m²/2 pairs — 10^12 pairs at m=1.4M. Buckets larger than the cap switch
    to STAR candidates (bucket-min id ↔ every other member): candidate count
    becomes linear in m and the duplicate CLUSTER stays connected through
    the root, which is what dedup consumers (connected components / keep-one)
    need; only non-root×non-root pairs inside oversized buckets are skipped.
    Buckets at or under the cap are unchanged.

    Default 'auto' = max(64, ⌈√N⌉) from a one-job distinct-id count — hot
    boilerplate buckets are linearized without expert arguments; None
    disables, an int pins."""
    if max_bucket == "auto":
        max_bucket = _auto_cap(signatures.select("id").distinct().count())
    rows = n_perms // bands
    banded = signatures.withColumn("band", (F.col("perm") / rows).cast("int"))
    keys = banded.groupBy("id", "band").agg(
        F.md5(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.struct("perm", "minhash")))
                .cast("string")
            )
        ).alias("band_key")
    )
    if max_bucket is None:
        return (
            keys.alias("x")
            .join(keys.alias("y"), ["band", "band_key"])
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
    stats = keys.groupBy("band", "band_key").agg(
        F.count("*").alias("_cnt"), F.min("id").alias("_root")
    )
    keyed = keys.join(stats, ["band", "band_key"])
    small = keyed.filter(F.col("_cnt") <= max_bucket)
    pairs_small = (
        small.alias("x")
        .join(small.alias("y"), ["band", "band_key"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
    )
    pairs_big = (
        keyed.filter((F.col("_cnt") > max_bucket) & (F.col("id") != F.col("_root")))
        .select(F.col("_root").alias("id_a"), F.col("id").alias("id_b"))
    )
    return pairs_small.unionByName(pairs_big).distinct()


def minhash_dedup(
    df: DataFrame,
    threshold: float = 0.8,
    n_perms: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | str | None = "auto",
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → band buckets →
    candidate pairs → EXACT Jaccard verification (no false positives).
    → (id_a, id_b, jaccard ≥ threshold). ``max_bucket`` caps hot band
    buckets via star candidates (see lsh_candidate_pairs); the default
    'auto' computes the cap from the corpus count so ``minhash_dedup(df)``
    is scale-safe with no expert arguments."""
    if max_bucket == "auto":
        max_bucket = _auto_cap(df.select(id_col).count())
    sig = minhash_signatures(df, n_perms, n, text_col, id_col)
    cand = lsh_candidate_pairs(sig, n_perms, bands, max_bucket)
    sh = token_shingles(df, n, text_col, id_col)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    # count of shared shingles per candidate pair
    sh_a = sh.withColumnRenamed("id", "id_a")
    sh_b = sh.withColumnRenamed("id", "id_b")
    inter = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(
    df: DataFrame,
    n_bits: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (id, simhash): weighted-majority bit fingerprint. Bit k of the token's
    60-bit md5-prefix hash votes ±tf; bit k of the output is 1 iff the vote
    sum is positive. Pure JVM expressions (explode tokens × bit positions is
    avoided: votes are aggregated per token first)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(whitespace_tokens(text_col)).alias("term"),
    ).groupBy("id", "term").agg(F.count("*").alias("tf"))
    h = md5_prefix_long("term")
    bits = F.array(
        *[
            (
                F.when((F.shiftright(h, k) % 2) == 1, F.col("tf")).otherwise(-F.col("tf"))
            ).alias(f"b{k}")
            for k in range(n_bits)
        ]
    )
    votes = toks.select("id", bits.alias("v")).groupBy("id").agg(
        F.array(*[F.sum(F.element_at("v", k + 1)).alias(f"s{k}") for k in range(n_bits)]).alias("s")
    )
    val = None
    for k in range(n_bits):
        term = F.when(F.element_at("s", k + 1) > 0, F.lit(1 << k)).otherwise(F.lit(0))
        val = term if val is None else (val + term)
    return votes.select("id", val.cast("long").alias("simhash"))


def simhash_neardup_pairs(
    sims: DataFrame, max_hamming: int = 3, n_bits: int = 60, prefix_bits: int = 15
) -> DataFrame:
    """Candidate pairs by shared bit-block bucketing, then exact hamming
    filter — avoids the O(n²) cross join. Completeness needs
    n_blocks > max_hamming (pigeonhole: ≤h differing bits can't touch all
    blocks); defaults give 4 blocks for h ≤ 3."""
    n_blocks = n_bits // prefix_bits
    if n_blocks <= max_hamming:
        raise ValueError(
            f"need n_bits/prefix_bits > max_hamming for complete recall "
            f"(got {n_blocks} blocks, h={max_hamming})"
        )
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                (F.shiftright(F.col("simhash"), i * prefix_bits) % (1 << prefix_bits)).alias("key"),
            )
            for i in range(n_blocks)
        ]
    )
    keyed = sims.select("id", "simhash", F.explode(blocks).alias("b")).select(
        "id", "simhash", F.col("b.blk").alias("blk"), F.col("b.key").alias("key")
    )
    pairs = (
        keyed.alias("x")
        .join(keyed.alias("y"), ["blk", "key"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    n_tables: int = 24,
    planes_per_table: int = 3,
    seed: int = 271,
) -> DataFrame:
    """Cosine-threshold near-dup pairs → (id_a, id_b, cosine ≥ threshold).

    method='exact' (default): the O(n²) self-join — exact recall, callers
    get deterministic semantics unless they opt in to approximation
    (ADVICE r02: silently switching the public default to probabilistic
    recall is a trap at thresholds below ~0.9). method='lsh' is the scale
    path and what the pipeline entry uses: candidates come from a
    hyperplane-LSH bucket self-join (pairs colliding in ≥1 of L tables of r
    sign bits), then EXACT cosine rescoring on candidates only — no false
    positives, misses bounded by (1−p^r)^L with p = 1−θ/π. The corpus is
    never theta-self-joined. method='exact' is the O(n²) self-join kept for
    recall verification at sandbox scale."""
    def norm(c: Column) -> Column:
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda a, v: a + v,
            )
        )

    v = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), norm(F.col(vec_col)).alias("nrm")
    )
    dot = F.aggregate(
        F.zip_with("x.v", "y.v", lambda a, b_: a.cast("double") * b_.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    cosine = (dot / (F.col("x.nrm") * F.col("y.nrm"))).alias("cosine")
    if method == "lsh":
        from flagembedding_spark.operators.similarity import hyperplane_signatures

        dim = len(df.select(vec_col).first()[0])
        sig = hyperplane_signatures(
            v.select("id", "v"), dim, n_tables, planes_per_table, "v", seed
        ).select("id", "table", "sig")
        cand = (
            sig.alias("x")
            .join(sig.alias("y"), ["table", "sig"])
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
        scored = (
            cand.join(
                v.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                         F.col("nrm").alias("na")), "id_a")
            .join(
                v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                         F.col("nrm").alias("nb")), "id_b")
            .select(
                "id_a", "id_b",
                (
                    F.aggregate(
                        F.zip_with("va", "vb",
                                   lambda a, b_: a.cast("double") * b_.cast("double")),
                        F.lit(0.0), lambda a, x: a + x,
                    ) / (F.col("na") * F.col("nb"))
                ).alias("cosine"),
            )
        )
        return (
            scored.filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
        )
    return (
        v.alias("x")
        .join(v.alias("y"), F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            cosine,
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )
