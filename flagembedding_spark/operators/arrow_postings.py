"""Vectorized (Arrow-batched) tokenize-and-count postings builder.

This is the north-star build path: ``mapInArrow`` code-aware tokenization
directly into (term, docID, tf) postings — the per-doc term counting happens
inside the Arrow batch, so the cluster never materializes the 10^12 × avgdl
exploded token stream, and postings need NO shuffle at all (they are already
exact per-doc aggregates when they leave the map stage).

Compared to the pure-JVM explode → groupBy(term, docid) alternative
(index_build.build_index_sql), this cuts the big shuffle entirely: only the
term dictionary (df per term) still aggregates, and its map-side partial
combine reduces the exchange to ~|vocab| rows per partition.

Doc IDs are assigned Lucene-style by insertion order: a first pass counts
rows per input partition (tiny collect — one long per partition), the map
stage then adds the broadcast partition offset to the local row number. This
matches the reference's enumeration-order docids
(modeling_bm25.py:163 ``for i, doc in enumerate(corpus)``) and requires no
shuffle — but does require the input's partition layout to be deterministic
between the two passes (true for file scans and spark.range; both jobs plan
identical splits). The map stage VERIFIES this: each partition re-counts its
rows against the offsets job's count and raises on any drift (and on rows in
a partition the counting pass never saw), so a non-deterministic source or
an AQE replan fails loudly instead of silently mis-assigning docids.

Tokenization here is Python's ``str.split(" ")`` — *identical by definition*
to the reference oracle's tokenizer (T1). Stop tokens are removed from tf/df
but doc length counts unfiltered tokens (modeling_bm25.py:180).
"""

from __future__ import annotations

import hashlib
from collections import Counter
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from flagembedding_spark.config import BM25Config

STREAM_SCHEMA = StructType(
    [
        StructField("docid", LongType(), False),
        StructField("docid_str", StringType(), False),
        StructField("term", StringType(), True),  # NULL → doc-stats row
        StructField("tf", LongType(), False),
        StructField("dl", LongType(), False),
        StructField("content_sha256", StringType(), True),  # doc-stats rows only
    ]
)

_ARROW_SCHEMA = pa.schema(
    [
        pa.field("docid", pa.int64(), nullable=False),
        pa.field("docid_str", pa.string(), nullable=False),
        pa.field("term", pa.string(), nullable=True),
        pa.field("tf", pa.int64(), nullable=False),
        pa.field("dl", pa.int64(), nullable=False),
        pa.field("content_sha256", pa.string(), nullable=True),
    ]
)


def partition_offsets(df: DataFrame) -> tuple[dict[int, int], dict[int, int]]:
    """Rows-per-partition → (cumulative offsets, per-partition counts).
    One tiny collect (O(#parts)). The counts are re-verified inside the map
    stage so any layout drift between the two jobs fails loudly instead of
    silently mis-assigning docids."""
    rows = (
        df.select(F.spark_partition_id().alias("_pid"))
        .groupBy("_pid")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    counts = {r["_pid"]: r["cnt"] for r in rows}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    return offsets, counts


def grouped_partition_offsets(
    df: DataFrame, group_col: str
) -> tuple[dict[tuple[int, int], int], dict[tuple[int, int], int]]:
    """Per-(partition, group) → (offset within the GROUP's own dense id
    space, count). Each group's ids run 0..n_group−1 cumulatively over
    partition ids, so (group << B) | local never collides and is dense per
    group. One collect of O(#parts × #groups) tiny rows."""
    rows = (
        df.select(
            F.spark_partition_id().alias("_pid"), F.col(group_col).alias("_g")
        )
        .groupBy("_pid", "_g")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    counts = {(r["_pid"], r["_g"]): r["cnt"] for r in rows}
    offsets: dict[tuple[int, int], int] = {}
    acc: dict[int, int] = {}
    for pid, g in sorted(counts):
        offsets[(pid, g)] = acc.get(g, 0)
        acc[g] = acc.get(g, 0) + counts[(pid, g)]
    return offsets, counts


def tokenize_count_stream(
    corpus: DataFrame,
    config: BM25Config,
    content_col: str = "content",
    docid_str: F.Column | None = None,
    group_expr: F.Column | None = None,
    max_local: int | None = None,
) -> DataFrame:
    """corpus → unified stream of postings rows (term NOT NULL) and doc-stats
    rows (term NULL, carrying content_sha256). Zero shuffles.

    ``group_expr`` (evaluated over the slim (docid_str, content) frame, e.g.
    a hash-chunk of docid_str): docids become DENSE PER GROUP — each group's
    ids run 0..n_group−1 in insertion order — so a caller composing
    (group << B) | docid gets ids that are independent of which other groups
    were built in the same pass (resumable-build stability). ``max_local``
    bounds the per-group id and raises past it (overflow into the group
    bits)."""
    from flagembedding_spark.operators.index_build import docid_expr

    did = docid_str if docid_str is not None else docid_expr()
    slim = corpus.select(did.alias("docid_str"), F.col(content_col).alias("content"))
    grouped = group_expr is not None
    if grouped:
        slim = slim.withColumn("_grp", group_expr)
        offsets, expected_counts = grouped_partition_offsets(slim, "_grp")
    else:
        offsets, expected_counts = partition_offsets(slim)
    stop = set(config.stop_tokens)

    max_out_rows = 262_144  # bound per-batch memory (an input batch of 10k
    # docs would otherwise emit one ~1M-row output batch)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen: dict = {}  # offsets key → rows emitted so far in this task
        o_docid, o_str, o_term, o_tf, o_dl, o_sha = [], [], [], [], [], []

        def flush():
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array(o_docid, pa.int64()),
                    pa.array(o_str, pa.string()),
                    pa.array(o_term, pa.string()),
                    pa.array(o_tf, pa.int64()),
                    pa.array(o_dl, pa.int64()),
                    pa.array(o_sha, pa.string()),
                ],
                schema=_ARROW_SCHEMA,
            )
            o_docid.clear(); o_str.clear(); o_term.clear()
            o_tf.clear(); o_dl.clear(); o_sha.clear()
            return batch

        for batch in batches:
            ids = batch.column("docid_str").to_pylist()
            texts = batch.column("content").to_pylist()
            grps = batch.column("_grp").to_pylist() if grouped else None
            for i, (key, text) in enumerate(zip(ids, texts)):
                okey = (pid, grps[i]) if grouped else pid
                base = offsets.get(okey)
                if base is None:
                    # rows in a partition/group the counting pass never saw:
                    # the two jobs planned different splits — docids would
                    # collide with another range. Fail loudly.
                    raise RuntimeError(
                        f"docid assignment: partition key {okey} has rows but "
                        "no offset from the counting pass — input partition "
                        "layout drifted between the offsets job and the map "
                        "job (non-deterministic source / AQE replan / "
                        "concurrent write?)"
                    )
                local = seen.get(okey, 0)
                seen[okey] = local + 1
                docid = base + local
                if max_local is not None and docid >= max_local:
                    raise RuntimeError(
                        f"docid assignment: group-local id {docid} overflows "
                        f"the {max_local} id space for key {okey} — raise "
                        "the group-id bit budget or use more groups"
                    )
                toks = text.split(" ")
                dl = len(toks)
                cnt = Counter(toks)
                for t in stop:
                    cnt.pop(t, None)
                # doc-stats row
                o_docid.append(docid)
                o_str.append(key)
                o_term.append(None)
                o_tf.append(0)
                o_dl.append(dl)
                o_sha.append(hashlib.sha256(text.encode("utf-8")).hexdigest())
                # postings rows
                o_docid.extend([docid] * len(cnt))
                o_str.extend([key] * len(cnt))
                o_term.extend(cnt.keys())
                o_tf.extend(cnt.values())
                o_dl.extend([dl] * len(cnt))
                o_sha.extend([None] * len(cnt))
                if len(o_docid) >= max_out_rows:
                    yield flush()
        my_expected = {
            k: c for k, c in expected_counts.items()
            if (k[0] if grouped else k) == pid
        }
        if seen != my_expected:
            raise RuntimeError(
                f"docid assignment: partition {pid} saw {seen} rows in the "
                f"map stage but the counting pass recorded {my_expected} — "
                "layout drift between the two jobs would mis-assign docids"
            )
        if o_docid:
            yield flush()

    return slim.mapInArrow(gen, STREAM_SCHEMA)
