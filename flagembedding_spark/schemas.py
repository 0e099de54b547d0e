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
    """Distributed, driver-free corpus generator for bench/scaling runs.

    Pure JVM expressions (xxhash64 arithmetic), so generating 10^8 docs never
    touches the driver — the pattern that survives 10^12-file scale.
    Token draws approximate the same skewed distribution as synth_corpus.
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
