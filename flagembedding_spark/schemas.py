"""Declared schemas + deterministic synthetic fixture generators.

The reference's schemas are implicit JSON-field conventions
(abc/evaluation/data_loader.py:242-310). We declare them once here.

The input table shape is fixed by BASELINE.json.input_hint:
    (repo string, path string, commit string, lang string, content string)
with docid = concat(repo, ':', path, '@', commit) and the per-row invariant
content_sha256 = sha2(content, 256) carried through the index build.

Synthetic generation is fully deterministic (seeded Python RNG for tiny/small
pytest fixtures; hash-arithmetic Spark expressions for the distributed bench
corpus so no driver-side materialization is needed at scale).
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

QUERIES_SCHEMA = StructType(
    [
        StructField("query_id", StringType(), False),
        StructField("query", StringType(), False),
    ]
)

QRELS_SCHEMA = StructType(
    [
        StructField("qid", StringType(), False),
        StructField("docid", StringType(), False),
        StructField("relevance", IntegerType(), False),
    ]
)

POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("docid", LongType(), False),
        StructField("tf", LongType(), False),
        StructField("dl", LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# vocabulary: ~2000 identifiers + a heavy head of stopword-like code tokens
# (skew driver per FIXTURES.md §1)
# ---------------------------------------------------------------------------

HOT_TOKENS = [
    "def", "return", "import", "self", "(", ")", "=", "{", "}", ":",
    "if", "for", "class", ";", ",", "const", "func", "public", "->", "==",
]

_LANGS = ["python", "java", "go", "js", "c"]
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "c": "c"}


def _sql_string_array(values: list[str]):
    """Constant array<string> literal built with ONE py4j call (SQL-parsed
    JVM-side) instead of one round trip per element."""
    quoted = ",".join(
        "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        for v in values
    )
    return F.expr(f"array({quoted})")


def _identifier_vocab(n: int = 2000) -> list[str]:
    stems = [
        "get", "set", "build", "parse", "read", "write", "merge", "index",
        "query", "score", "token", "batch", "node", "shard", "block", "scan",
    ]
    suffixes = [
        "er", "ctx", "impl", "util", "mgr", "buf", "map", "list", "iter",
        "cfg", "meta", "spec", "plan", "task", "pool", "cache",
    ]
    out = []
    i = 0
    while len(out) < n:
        s = stems[i % len(stems)]
        t = suffixes[(i // len(stems)) % len(suffixes)]
        out.append(f"{s}_{t}_{i}")
        i += 1
    return out


def synth_corpus_rows(
    n_docs: int, seed: int = 42, vocab_size: int = 2000
) -> list[tuple[str, str, str, str, str]]:
    """Deterministic synthetic code corpus (driver-side; tiny/small scales)."""
    rng = random.Random(seed)
    vocab = _identifier_vocab(vocab_size)
    rows = []
    commits: dict[str, str] = {}
    for i in range(n_docs):
        r = i % max(1, n_docs // 50 + 1)
        repo = f"org{r // 10}/repo{r}"
        if repo not in commits:
            commits[repo] = hashlib.sha1(f"commit-{repo}".encode()).hexdigest()
        lang = _LANGS[rng.randrange(len(_LANGS))]
        path = f"src/d{i % 7}/file_{i}.{_EXT[lang]}"
        n_tok = rng.randint(20, 400)
        toks = []
        for j in range(n_tok):
            if rng.random() < 0.45:  # heavy stopword-like head → skew
                toks.append(HOT_TOKENS[rng.randrange(len(HOT_TOKENS))])
            else:
                # Zipf-ish: low ranks much more likely
                rank = min(int(rng.paretovariate(1.1)) - 1, vocab_size - 1)
                toks.append(vocab[rank])
            if j % rng.randint(8, 12) == 7:
                toks.append("\n")
        content = " ".join(toks).replace(" \n ", "\n")
        rows.append((repo, path, commits[repo], lang, content))
    return rows


def synth_corpus(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synth_corpus_rows(n_docs, seed), CORPUS_SCHEMA)


def synth_queries_rows(
    n_queries: int, seed: int = 43, vocab_size: int = 2000
) -> list[tuple[str, str]]:
    """Per FIXTURES.md §2: 70% in-vocab terms, 20% duplicated terms (qtf>1),
    10% OOV; a few all-OOV queries (empty-result path)."""
    rng = random.Random(seed)
    vocab = _identifier_vocab(vocab_size)
    rows = []
    for i in range(n_queries):
        if i % 17 == 16:  # all-OOV query
            q = f"zz_oov_{i} zz_oov_{i}_b"
        else:
            n_tok = rng.randint(1, 8)
            toks = []
            for _ in range(n_tok):
                u = rng.random()
                if u < 0.10:
                    toks.append(f"zz_oov_{rng.randrange(10_000)}")
                elif u < 0.35:
                    toks.append(HOT_TOKENS[rng.randrange(len(HOT_TOKENS))])
                else:
                    rank = min(int(rng.paretovariate(1.1)) - 1, vocab_size - 1)
                    toks.append(vocab[rank])
            if len(toks) > 1 and rng.random() < 0.20:  # duplicate a term
                toks.append(toks[rng.randrange(len(toks))])
            q = " ".join(toks)
        rows.append((f"q{i}", q))
    return rows


def synth_queries(spark: SparkSession, n_queries: int, seed: int = 43) -> DataFrame:
    return spark.createDataFrame(synth_queries_rows(n_queries, seed), QUERIES_SCHEMA)


def synth_qrels_rows(
    queries: list[tuple[str, str]],
    docids: list[str],
    seed: int = 44,
) -> list[tuple[str, str, int]]:
    rng = random.Random(seed)
    rows = []
    for qid, _ in queries:
        for _ in range(rng.randint(1, 5)):
            rows.append((qid, docids[rng.randrange(len(docids))], rng.randint(1, 3)))
    # dedup (qid, docid) keeping max relevance
    best: dict[tuple[str, str], int] = {}
    for qid, d, rel in rows:
        best[(qid, d)] = max(best.get((qid, d), 0), rel)
    return [(q, d, r) for (q, d), r in sorted(best.items())]


NEEDLE_EVERY = 1000  # skewed fixture: 1-in-NEEDLE_EVERY docs carry a needle
N_NEEDLES = 8


def distributed_synth_corpus_skewed(
    spark: SparkSession, n_docs: int, partitions: int = 64, seed: int = 42
) -> DataFrame:
    """Zipf-skewed idf fixture for WAND pruning benchmarks: the base corpus's
    stopword-like head (df ≈ N → idf ≈ 0) PLUS rare 'needle_<j>' terms planted
    in 1-in-1000 docs (df ≈ N/1000 → idf ≈ ln(1000)). A query mixing a needle
    with stopwords makes every stopword non-essential under union-bound
    pruning — the case where block-max skipping genuinely wins."""
    base = distributed_synth_corpus(spark, n_docs, partitions, seed)
    i = F.xxhash64("path")  # deterministic per doc
    needle = F.concat(
        F.lit("needle_"), (F.abs(i) % N_NEEDLES).cast("string")
    )
    out = base.withColumn(
        "content",
        F.when(
            F.abs(F.xxhash64("path", F.lit("plant"))) % NEEDLE_EVERY == 0,
            F.concat(F.col("content"), F.lit(" "), needle),
        ).otherwise(F.col("content")),
    )
    # 1:1 row-preserving projection — the base's declared partition counts
    # still hold (verified in-stage by the arrow build)
    out._fes_partition_counts = base._fes_partition_counts
    return out


def skewed_queries(spark: SparkSession) -> DataFrame:
    """Needle+stopword mixes — the prunable shape (one rare high-idf term,
    many low-idf stopwords whose posting lists dominate decode cost) — plus
    controls."""
    stop_mix = "def self ( ) = { } : if for class return"
    rows = [
        (f"sk{j}", f"needle_{j} {stop_mix}") for j in range(N_NEEDLES)
    ] + [
        ("sk_hot", "def return import"),     # all-hot control: nothing prunable
        ("sk_pair", "needle_0 needle_1"),    # all-rare control
    ]
    return spark.createDataFrame(rows, QUERIES_SCHEMA)


def distributed_synth_corpus(
    spark: SparkSession, n_docs: int, partitions: int = 64, seed: int = 42
) -> DataFrame:
    """Distributed, driver-free corpus generator for bench/scaling runs —
    vectorized Arrow kernel.

    Content is BIT-IDENTICAL to the expression form below
    (``distributed_synth_corpus_expr``, the cross-engine reference kept for
    parity tests): the same xxhash64 fold chain, evaluated as numpy array
    passes (functions/hashing.py ``xxh64_fold_*_np``) instead of one
    interpreted JVM lambda eval per token — Spark's higher-order
    ``transform`` is CodegenFallback, so the expression form pays ~3
    interpreted multi-column hash evals per token (~120 µs/doc-core
    measured); the Arrow kernel does the same chain at ~45 µs/doc-core
    (guide §4.2: vectorize the kernel, not the loop). Still driver-free
    and per-partition, so it scales exactly like the expression form.
    Parity pinned by test_synth_corpus_arrow_parity (full-row identity,
    plain + skewed composition). ``FES_SYNTH_EXPR=1`` selects the
    expression form (A/B measurement + parity debugging only)."""
    import os

    if os.environ.get("FES_SYNTH_EXPR") == "1":
        return distributed_synth_corpus_expr(spark, n_docs, partitions, seed)
    df = spark.range(0, n_docs, 1, partitions)
    out = df.mapInArrow(
        _synth_corpus_arrow_kernel(n_docs, seed), CORPUS_SCHEMA
    )
    out._fes_partition_counts = range_partition_counts(n_docs, partitions)
    return out


# truncated-int result of the expression ``cast(pow(k/1000.0, 2.0) * 511 as
# int)`` for every reachable k — the vocab-index curve. Precomputed so the
# kernel does a table lookup; parity vs the Spark expression for ALL 1000
# inputs is pytest-asserted (test_synth_vocab_lut_parity), which pins the
# Math.pow rounding question exhaustively rather than by argument.
_VOCAB_POW_LUT = [int(((k / 1000.0) ** 2) * 511) for k in range(1000)]


def _synth_corpus_arrow_kernel(n_docs: int, seed: int):
    """mapInArrow kernel: spark.range batches → corpus rows. All per-token
    work is numpy/pyarrow array passes; the only per-row Python is the
    per-repo sha1 cache (|repos| = n_docs/50, amortized across its 50
    docs)."""
    from flagembedding_spark.functions.hashing import (
        java_abs_np,
        java_mod_np,
        xxh64_fold_bytes_np,
        xxh64_fold_int_np,
        xxh64_fold_long_np,
    )

    vocab = _identifier_vocab(2000)[:512]
    tok_table = HOT_TOKENS + vocab  # hot: idx 0..19; vocab: 20..531
    n_repo = max(1, n_docs // 50 + 1)
    fold_seed_as_int = -(1 << 31) <= seed < (1 << 31)

    def gen(batches):
        import hashlib as _hashlib

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        U = np.uint64
        lut = np.array(_VOCAB_POW_LUT, dtype=np.int64)
        tok_arr = pa.array(tok_table, pa.string())
        lang_arr = pa.array(_LANGS, pa.string())
        sha_cache: dict[str, str] = {}

        def habs(tag: bytes, state):
            """abs(fold(state, tag, lit(seed))) — the generator's ``h``."""
            h = xxh64_fold_bytes_np(tag, state)
            if fold_seed_as_int:
                h = xxh64_fold_int_np(np.int64(seed), h)
            else:
                h = xxh64_fold_long_np(np.asarray(seed, np.int64), h)
            return java_abs_np(h)

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            i = batch.column(0).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            # state after folding the doc id (shared prefix of every h())
            st_i = xxh64_fold_long_np(i, U(42))
            n_tok = java_mod_np(habs(b"len", st_i), 381) + 20
            m = int(n_tok.sum())
            parent = np.repeat(np.arange(n, dtype=np.int64), n_tok)
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(n_tok[:-1], out=starts[1:])
            p = np.arange(m, dtype=np.int64)
            p -= starts[parent]
            # state after folding (i, p) — shared by the 3 per-token h()s
            st_ip = xxh64_fold_int_np(p, st_i[parent])
            is_hot = java_mod_np(habs(b"hot", st_ip), 100) < 45
            idx = np.empty(m, dtype=np.int64)
            idx[is_hot] = java_mod_np(habs(b"h", st_ip[is_hot]), 20)
            kv = java_mod_np(habs(b"v", st_ip[~is_hot]), 1000)
            idx[~is_hot] = lut[kv] + 20
            # content = array_join(tokens, " ") — C++ take + join
            flat = tok_arr.take(pa.array(idx))
            off = np.zeros(n + 1, dtype=np.int32)
            off[1:] = np.cumsum(n_tok)
            content = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(off, pa.int32()), flat),
                " ",
            )
            # per-doc metadata columns
            r = i % n_repo
            org_s = pc.cast(pa.array(r // 10), pa.string())
            r_s = pc.cast(pa.array(r), pa.string())
            i_s = pc.cast(pa.array(i), pa.string())
            d7_s = pc.cast(pa.array(i % 7), pa.string())
            repo = pc.binary_join_element_wise(
                "org", org_s, "/repo", r_s, ""
            )
            path = pc.binary_join_element_wise(
                "src/d", d7_s, "/file_", i_s, ".py", ""
            )
            commits = []
            for rv in repo.to_pylist():
                c = sha_cache.get(rv)
                if c is None:
                    c = _hashlib.sha1(
                        ("commit-" + rv).encode("utf-8")
                    ).hexdigest()
                    sha_cache[rv] = c
                commits.append(c)
            lang_i = java_mod_np(habs(b"lang", st_i), 5)
            lang = lang_arr.take(pa.array(lang_i))
            yield pa.RecordBatch.from_arrays(
                [repo, path, pa.array(commits, pa.string()), lang, content],
                names=["repo", "path", "commit", "lang", "content"],
            )

    return gen


def distributed_synth_corpus_expr(
    spark: SparkSession, n_docs: int, partitions: int = 64, seed: int = 42
) -> DataFrame:
    """Distributed, driver-free corpus generator for bench/scaling runs.

    Pure JVM expressions (xxhash64 arithmetic), so generating 10^8 docs never
    touches the driver — the pattern that survives 10^12-file scale.
    Token draws approximate the same skewed distribution as synth_corpus.
    This is the reference form; ``distributed_synth_corpus`` evaluates the
    SAME chain as a vectorized Arrow kernel (bit-identical output,
    parity-tested) because Spark's higher-order ``transform`` is interpreted
    per element.
    """
    vocab = _identifier_vocab(2000)
    # one array literal per list, parsed JVM-side in a single py4j call:
    # F.array(*[F.lit(v) ...]) — and F.lit(list), which expands to the same
    # per-element calls — spent ~0.3 s of DRIVER time per corpus DataFrame
    # on 500+ py4j round trips building the same constant-folded Literal
    vocab_arr = _sql_string_array(vocab[:512])  # keep expr tree sane
    hot_arr = _sql_string_array(HOT_TOKENS)

    df = spark.range(0, n_docs, 1, partitions).withColumnRenamed("id", "i")
    h = lambda *cols: F.abs(F.xxhash64(*cols, F.lit(seed)))  # noqa: E731
    n_tok = (h(F.col("i"), F.lit("len")) % 381 + 20).cast("int")
    pos = F.sequence(F.lit(0), n_tok - 1)
    tok = F.transform(
        pos,
        lambda p: F.when(
            h(F.col("i"), p, F.lit("hot")) % 100 < 45,
            F.element_at(hot_arr, (h(F.col("i"), p, F.lit("h")) % len(HOT_TOKENS) + 1).cast("int")),
        ).otherwise(
            # squared-uniform index → Zipf-ish head concentration
            F.element_at(
                vocab_arr,
                (
                    F.pow((h(F.col("i"), p, F.lit("v")) % 1000) / F.lit(1000.0), F.lit(2.0)) * 511
                ).cast("int")
                + 1,
            )
        ),
    )
    r = F.col("i") % F.lit(max(1, n_docs // 50 + 1))
    repo = F.concat(F.lit("org"), (r / 10).cast("long").cast("string"), F.lit("/repo"), r.cast("string"))
    out = df.select(
        repo.alias("repo"),
        F.concat(F.lit("src/d"), (F.col("i") % 7).cast("string"), F.lit("/file_"), F.col("i").cast("string"), F.lit(".py")).alias("path"),
        F.sha1(F.concat(F.lit("commit-"), repo)).alias("commit"),
        F.element_at(_sql_string_array(_LANGS), (h(F.col("i"), F.lit("lang")) % 5 + 1).cast("int")).alias("lang"),
        F.array_join(tok, " ").alias("content"),
    )
    # spark.range splits [0, n) into ``partitions`` contiguous slices of
    # statically-known size; declaring them lets the arrow index build skip
    # its row-counting pre-job (the map stage still verifies actual rows
    # against this declaration — test_partition_counts_declaration)
    out._fes_partition_counts = range_partition_counts(n_docs, partitions)
    return out


def range_partition_counts(n: int, partitions: int) -> dict[int, int]:
    """Per-partition row counts of ``spark.range(0, n, 1, partitions)``:
    partition i holds floor((i+1)·n/p) − floor(i·n/p) rows (Spark's Range
    split arithmetic)."""
    p = max(int(partitions), 1)
    return {
        i: ((i + 1) * n) // p - (i * n) // p
        for i in range(p)
    }
