"""Document deletes over a persisted segment store — Lucene semantics.

Lucene marks deletions in a per-segment live-docs bitset: queries stop
returning deleted docs IMMEDIATELY, but corpus statistics (df, avgdl, N)
stay stale until segments are merged/expunged — surviving docs' BM25
scores are unchanged by a delete. The reference's Anserini index inherits
exactly this behavior (modeling_bm25.py:102-107 builds a Lucene index).
This module is that contract, Spark/parquet-native:

- ``write_tombstones`` appends docids to ``<root>/tombstones.json``
  (idempotent union — the tiny, atomic analog of the live-docs bitset;
  at cluster scale this would be a roaring bitmap per bucket, the
  sorted-int64 array here is the same read contract).
- ``SegmentReader`` honors tombstones on point queries (stale stats).
- ``wand_topk(..., exclude_docids=...)`` is the Spark batch twin: fetch
  k + |deleted| then re-rank — exact for point-delete-sized sets; the
  size cap forces large delete sets through compaction instead.
- ``compact_store`` is the ``expungeDeletes`` analog: decode the store
  (positions carried when present), drop deleted postings, REBUILD with
  freshly recomputed df/idf/avgdl/N — after compaction, scores reflect
  the surviving corpus.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import SparkSession

# batch-path safety cap: exclude_docids over-fetches k + |deleted| per
# query, so huge tombstone sets belong in compact_store, not query time
MAX_QUERY_TIME_DELETES = 10_000


def write_tombstones(root: str, docids) -> np.ndarray:
    """Append ``docids`` to the store's tombstone set (idempotent union);
    returns the merged sorted array."""
    merged = np.union1d(
        load_tombstones(root), np.asarray(list(docids), dtype=np.int64)
    )
    tmp = f"{root}/tombstones.json.tmp"
    with open(tmp, "w") as f:
        json.dump([int(x) for x in merged], f)
    os.replace(tmp, f"{root}/tombstones.json")  # atomic swap (bitset flip)
    return merged


def load_tombstones(root: str) -> np.ndarray:
    path = f"{root}/tombstones.json"
    if not os.path.exists(path):
        return np.empty(0, dtype=np.int64)
    with open(path) as f:
        return np.asarray(sorted(set(json.load(f))), dtype=np.int64)


def clear_tombstones(root: str) -> None:
    path = f"{root}/tombstones.json"
    if os.path.exists(path):
        os.remove(path)


def compact_store(
    spark: SparkSession, root: str, out_root: str
):
    """expungeDeletes: rebuild ``root`` minus its tombstones into
    ``out_root`` with RECOMPUTED global statistics (one decode pass, no
    re-tokenization; positions carried when the store has them). Returns
    the loaded compacted SegmentIndex — its tombstone set is empty."""
    from pyspark.sql import functions as F

    from flagembedding_spark.operators.index_build import index_from_postings
    from flagembedding_spark.operators.segments import (
        build_doc_partitioned_segments,
        build_segments,
        load_segments,
        merge_segments,
        postings_from_segments,
        save_segments,
    )

    seg = load_segments(spark, root)
    dead = load_tombstones(root)
    post = postings_from_segments(seg, with_positions=seg.has_positions)
    if dead.size:
        dead_df = spark.createDataFrame(
            [(int(x),) for x in dead], "docid long"
        )
        post = post.join(F.broadcast(dead_df), "docid", "left_anti")
    idx = index_from_postings(post, seg.config)
    if getattr(seg, "layout", "term") == "doc":
        out = build_doc_partitioned_segments(
            idx, store_positions=seg.has_positions
        )
    else:
        out = merge_segments(
            build_segments(idx, store_positions=seg.has_positions)
        )
    save_segments(out, out_root)
    return load_segments(spark, out_root)
