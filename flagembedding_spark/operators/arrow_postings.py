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
identical splits).

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


def partition_offsets(df: DataFrame) -> dict[int, int]:
    """Rows-per-partition → cumulative offsets. One tiny collect (O(#parts))."""
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
    return offsets


def tokenize_count_stream(
    corpus: DataFrame,
    config: BM25Config,
    content_col: str = "content",
    docid_str: F.Column | None = None,
) -> DataFrame:
    """corpus → unified stream of postings rows (term NOT NULL) and doc-stats
    rows (term NULL, carrying content_sha256). Zero shuffles."""
    from flagembedding_spark.operators.index_build import docid_expr

    did = docid_str if docid_str is not None else docid_expr()
    slim = corpus.select(did.alias("docid_str"), F.col(content_col).alias("content"))
    offsets = partition_offsets(slim)
    stop = set(config.stop_tokens)

    max_out_rows = 262_144  # bound per-batch memory (an input batch of 10k
    # docs would otherwise emit one ~1M-row output batch)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        next_id = offsets.get(pid, 0)
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
            for key, text in zip(ids, texts):
                docid = next_id
                next_id += 1
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
        if o_docid:
            yield flush()

    return slim.mapInArrow(gen, STREAM_SCHEMA)
