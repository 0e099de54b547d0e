"""Document deletes over a persisted segment store — Lucene semantics.

Lucene marks deletions in a per-segment live-docs bitset: queries stop
returning deleted docs IMMEDIATELY, but corpus statistics (df, avgdl, N)
stay stale until segments are merged/expunged — surviving docs' BM25
scores are unchanged by a delete. The reference's Anserini index inherits
exactly this behavior (modeling_bm25.py:102-107 builds a Lucene index).
This module is that contract, Spark/parquet-native:

- ``DocidBitmap`` is the live-docs set itself: a roaring-bitmap-shaped
  container structure (docid >> 16 keys each a bitmap or sorted-array
  container) with fully vectorized membership — bounded memory at
  millions of tombstones (≤ 8 KiB per dense 65 536-docid range).
- ``write_tombstones`` unions docids into ``<root>/tombstones.npz``
  (the compressed bitmap; a small human-readable ``tombstones.json``
  twin is kept while the set is tiny). SINGLE-WRITER contract: the
  read-modify-write is atomic against readers (write-temp + rename) but
  NOT against a concurrent writer — concurrent deleters must serialize
  externally (at cluster scale, deletes funnel through one driver job,
  exactly as Lucene funnels them through one IndexWriter).
- ``wand_topk(..., exclude_docids=...)`` and the serving reader mask
  tombstones IN-KERNEL immediately after block decode (wand._mask_dead):
  θ bootstraps and block bounds reflect survivors only, which keeps
  pruning score-safe under deletion with NO over-fetch. (The previous
  fetch-``k + |deleted|``-then-re-rank design was measured 1.6× slower
  at 2 M docs because pruning thresholds collapsed; it is gone.) There
  is no query-time size cap — a ≥1 M-tombstone set rides the bitmap.
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

# container type flips from sorted-array to packed bitmap above this many
# values per 65 536-docid range (4096 × 2 B == the 8 KiB bitmap — the
# classic roaring cutover)
_BITMAP_CONTAINER_CUTOVER = 4096
# keep the human-readable JSON twin only while the set is small
_JSON_TWIN_MAX = 100_000

_U1 = np.uint64(1)
_U6 = np.uint64(6)
_U63 = np.uint64(63)


class DocidBitmap:
    """Roaring-shaped int64-docid set with vectorized membership.

    Containers are keyed by ``docid >> 16``; a container holds its low
    16 bits either as a sorted ``uint16`` array (sparse) or a 1024-word
    packed bitmap (dense, > 4096 values). The container key space IS the
    per-docid-range "bucket": a doc-layout scoring task whose docid range
    is known could load only the intersecting containers — memory per
    task is bounded by the task's docid span, not the global delete count.
    """

    __slots__ = ("keys", "kinds", "bm_row", "bitmap_words", "arr_values",
                 "size")

    def __init__(self, keys, kinds, bitmap_words, arr_values, size):
        self.keys = keys                  # int64 [n_containers], sorted
        self.kinds = kinds                # uint8 [n_containers] 0=array 1=bitmap
        self.bitmap_words = bitmap_words  # uint64 [n_bitmap_containers, 1024]
        self.arr_values = arr_values      # int64, sorted — full docids of array containers
        self.size = int(size)
        bm_row = np.full(keys.size, -1, dtype=np.int64)
        bm_row[kinds == 1] = np.arange(int((kinds == 1).sum()))
        self.bm_row = bm_row

    def __len__(self) -> int:
        return self.size

    @classmethod
    def from_array(cls, docids) -> "DocidBitmap":
        d = np.unique(np.asarray(docids, dtype=np.int64))
        if d.size and int(d[0]) < 0:
            raise ValueError("docids must be non-negative")
        if d.size == 0:
            return cls(
                np.empty(0, np.int64), np.empty(0, np.uint8),
                np.zeros((0, 1024), np.uint64), np.empty(0, np.int64), 0,
            )
        hi = d >> 16
        keys, starts = np.unique(hi, return_index=True)
        ends = np.append(starts[1:], d.size)
        counts = ends - starts
        kinds = (counts > _BITMAP_CONTAINER_CUTOVER).astype(np.uint8)
        bm_idx = np.flatnonzero(kinds == 1)
        words = np.zeros((bm_idx.size, 1024), np.uint64)
        arr_mask = np.ones(d.size, bool)
        for r, ci in enumerate(bm_idx):
            lo = (d[starts[ci]:ends[ci]] & 0xFFFF).astype(np.uint64)
            np.bitwise_or.at(
                words[r], (lo >> _U6).astype(np.int64), _U1 << (lo & _U63)
            )
            arr_mask[starts[ci]:ends[ci]] = False
        return cls(keys, kinds, words, d[arr_mask], d.size)

    def contains(self, docids: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool mask aligned with ``docids``."""
        d = np.asarray(docids, dtype=np.int64)
        out = np.zeros(d.size, dtype=bool)
        if self.keys.size == 0 or d.size == 0:
            return out
        hi = d >> 16
        ci = np.searchsorted(self.keys, hi)
        np.minimum(ci, self.keys.size - 1, out=ci)
        valid = self.keys[ci] == hi
        is_bm = valid & (self.kinds[ci] == 1)
        if is_bm.any():
            rows = self.bm_row[ci[is_bm]]
            lo = (d[is_bm] & 0xFFFF).astype(np.uint64)
            w = self.bitmap_words[rows, (lo >> _U6).astype(np.int64)]
            out[is_bm] = ((w >> (lo & _U63)) & _U1) != 0
        is_ar = valid & (self.kinds[ci] == 0)
        if is_ar.any() and self.arr_values.size:
            v = d[is_ar]
            pos = np.searchsorted(self.arr_values, v)
            np.minimum(pos, self.arr_values.size - 1, out=pos)
            out[is_ar] = self.arr_values[pos] == v
        return out

    def contains_scalar(self, docid: int) -> bool:
        return bool(self.contains(np.asarray([docid], dtype=np.int64))[0])

    def to_array(self) -> np.ndarray:
        """Materialize the full sorted int64 docid array."""
        parts = [self.arr_values]
        for r, ci in enumerate(np.flatnonzero(self.kinds == 1)):
            bits = np.unpackbits(
                self.bitmap_words[r].view(np.uint8), bitorder="little"
            )
            lo = np.flatnonzero(bits).astype(np.int64)
            parts.append((int(self.keys[ci]) << 16) | lo)
        out = np.concatenate(parts) if parts else np.empty(0, np.int64)
        out.sort()
        return out

    def tolist(self) -> list[int]:
        return [int(x) for x in self.to_array()]

    def union(self, docids) -> "DocidBitmap":
        """Union with an iterable, ndarray, or another DocidBitmap."""
        if isinstance(docids, DocidBitmap):
            extra = docids.to_array()
        elif isinstance(docids, np.ndarray):
            extra = np.asarray(docids, dtype=np.int64)
        else:
            extra = np.asarray(list(docids), dtype=np.int64)
        if extra.size == 0:
            return self
        return DocidBitmap.from_array(
            np.concatenate([self.to_array(), extra])
        )

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez_compressed(
                f, keys=self.keys, kinds=self.kinds,
                bitmap_words=self.bitmap_words, arr_values=self.arr_values,
                size=np.asarray([self.size], np.int64),
            )
        os.replace(tmp, path)  # atomic vs readers (not vs another writer)

    @classmethod
    def load(cls, path: str) -> "DocidBitmap":
        with np.load(path) as z:
            return cls(z["keys"], z["kinds"], z["bitmap_words"],
                       z["arr_values"], int(z["size"][0]))


class DocidMask:
    """Combined exclude/include docid filter for the in-kernel mask hook
    (wand._mask_dead duck-types on ``contains``): ``contains(d)`` returns
    True where the doc must be DROPPED — tombstoned, or outside the
    include set. Include is the Lucene filter-clause contract: restricts
    candidates, never rescores (global stats). Applied immediately after
    block decode, so θ bootstraps and pruning bounds reflect only
    admissible docs — score-safe, and pruning can only get TIGHTER.

    Include sets are filter-selection-sized (a metadata predicate's
    matches), shipped to tasks as a roaring-shaped DocidBitmap; a hot
    recurring filter at cluster scale belongs in the index layout
    (partitionBy) instead — query.py documents the same boundary."""

    __slots__ = ("exclude", "include")

    def __init__(self, exclude=None, include: DocidBitmap | None = None):
        self.exclude = exclude  # DocidBitmap | small sorted int64 array | None
        self.include = include  # DocidBitmap | None

    def __len__(self) -> int:
        n = len(self.exclude) if self.exclude is not None else 0
        return n + (1 if self.include is not None else 0)

    def contains(self, docids: np.ndarray) -> np.ndarray:
        d = np.asarray(docids, dtype=np.int64)
        if self.exclude is None:
            drop = np.zeros(d.size, dtype=bool)
        elif hasattr(self.exclude, "contains"):
            drop = self.exclude.contains(d)
        else:
            drop = np.isin(d, self.exclude)
        if self.include is not None:
            drop |= ~self.include.contains(d)
        return drop


def write_tombstones(root: str, docids) -> DocidBitmap:
    """Union ``docids`` into the store's tombstone set; returns the merged
    DocidBitmap. SINGLE-WRITER: atomic against concurrent readers (temp +
    rename), not against a second concurrent writer — serialize deleters
    externally (the Lucene one-IndexWriter contract)."""
    merged = load_tombstones(root).union(docids)
    merged.save(f"{root}/tombstones.npz")
    json_path = f"{root}/tombstones.json"
    if merged.size <= _JSON_TWIN_MAX:
        tmp = json_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged.tolist(), f)
        os.replace(tmp, json_path)
    elif os.path.exists(json_path):
        os.remove(json_path)  # never leave a stale small twin behind
    return merged


def load_tombstones(root: str) -> DocidBitmap:
    npz = f"{root}/tombstones.npz"
    if os.path.exists(npz):
        return DocidBitmap.load(npz)
    legacy = f"{root}/tombstones.json"
    if os.path.exists(legacy):
        with open(legacy) as f:
            return DocidBitmap.from_array(
                np.asarray(json.load(f), dtype=np.int64)
            )
    return DocidBitmap.from_array(np.empty(0, np.int64))


def clear_tombstones(root: str) -> None:
    for name in ("tombstones.npz", "tombstones.json"):
        path = f"{root}/{name}"
        if os.path.exists(path):
            os.remove(path)


def compact_store(
    spark: SparkSession, root: str, out_root: str
):
    """expungeDeletes: rebuild ``root`` minus its tombstones into
    ``out_root`` with RECOMPUTED global statistics (one decode pass, no
    re-tokenization; positions carried when the store has them). Returns
    the loaded compacted SegmentIndex — its tombstone set is empty."""
    import pandas as pd
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
            pd.DataFrame({"docid": dead.to_array()})
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
