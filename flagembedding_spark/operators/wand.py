"""Query execution over the compressed segment index: exact decode-and-score
and score-safe Block-Max WAND (BMW) pruning — both inside vectorized Arrow
kernels (no per-row Python in Spark's row pipeline).

Physical plan:
    queries → (qid, term, qtf) → broadcast-join dictionary → tiny
    (qid, term, qtf, idf) artifact → broadcast-join segment blocks on term
    (Catalyst pushes the term filter into the parquet scan; bucket partition
    pruning applies when the block table is partitioned by bucket)
    → repartition by qid (moves only the COMPRESSED blocks of query terms)
    → mapInArrow per-query scorer → (qid, docid, score, rank ≤ k).

WAND here is *score-safe*: it skips a block only when the sum of block-max
upper bounds of the terms that could cover the pivot docid cannot beat the
current top-k threshold, so top-k results are identical to the exact path
(tested). The reference has no WAND (its Lucene engine applies BMW
internally without changing top-k — the same contract we enforce;
SURVEY §2.5 / §4).
"""

from __future__ import annotations

import heapq
import os
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flagembedding_spark.operators.query import query_terms
from flagembedding_spark.operators.segments import (
    SegmentIndex,
    decode_block,
    decode_blocks_batch,
)

RESULT_DDL = "qid string, docid long, score double, rank int"
_RESULT_PA = pa.schema(
    [
        pa.field("qid", pa.string()),
        pa.field("docid", pa.int64()),
        pa.field("score", pa.float64()),
        pa.field("rank", pa.int32()),
    ]
)


# dense-accumulator ceiling: one transient float64 array of this many
# entries (128 MB) per in-flight query — far above any single corpus
# partition's docid range, far below lineage ids (chunk·2^40), which take
# the sort-based path
_DENSE_ACC_MAX = 1 << 24


def _accumulate(d: np.ndarray, s: np.ndarray):
    """Exact per-doc score totals → (docids ascending, totals).

    Dense path: when docids are small non-negative ints (the dense-corpus
    case — serving stores, doc-partitioned buckets), ONE bincount pass —
    no sort. np.unique(return_inverse=True) was measured 24 s on a 22 M
    posting hot query at 2 M docs; bincount is 0.25 s. Sparse path
    (lineage-scale ids): unique + in-order add. Both paths add the same
    elements in the same order, so every float bit matches."""
    if d.size == 0:
        return d.astype(np.int64), s.astype(np.float64)
    mn = int(d.min())
    mx = int(d.max())
    if 0 <= mn and mx < _DENSE_ACC_MAX:
        acc = np.bincount(d, weights=s, minlength=mx + 1)
        nz = np.flatnonzero(acc)  # partial scores are strictly positive
        return nz.astype(np.int64), acc[nz]
    uniq = np.unique(d)
    acc = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(acc, np.searchsorted(uniq, d), s)
    return uniq, acc


def _topk_rows(qid: str, docids: np.ndarray, scores: np.ndarray, k: int):
    """Deterministic (score DESC, docid ASC) top-k."""
    if docids.size == 0:
        return []
    k = min(k, docids.size)
    # partial select then exact sort (the reference's argpartition+sort shape,
    # modeling_bm25.py:230-235, with deterministic tie-break). Candidates =
    # every doc scoring >= the kth score, so docid ties at the boundary
    # resolve identically to a full sort.
    if docids.size > k:
        kth = np.partition(scores, docids.size - k)[docids.size - k]
        cand = np.nonzero(scores >= kth)[0]
    else:
        cand = np.arange(docids.size)
    order = sorted(cand.tolist(), key=lambda i: (-scores[i], docids[i]))[:k]
    return [
        (qid, int(docids[i]), float(scores[i]), r + 1) for r, i in enumerate(order)
    ]


class _TermCursor:
    """Block-level cursor over one term's merged (docid-ordered, disjoint)
    block list, with lazy decode."""

    __slots__ = (
        "weight", "firsts", "lasts", "ubs", "blocks", "bi", "pos",
        "cur_docids", "cur_scores", "max_ub",
    )

    def __init__(self, weight, firsts, lasts, ubs, blocks):
        order = np.argsort(firsts, kind="stable")
        self.weight = weight
        self.firsts = firsts[order]
        self.lasts = lasts[order]
        self.ubs = ubs[order] * weight
        self.blocks = [blocks[i] for i in order]
        self.max_ub = float(self.ubs.max()) if len(self.ubs) else 0.0
        self.bi = 0
        self.pos = 0
        self.cur_docids = None
        self.cur_scores = None

    def exhausted(self) -> bool:
        return self.bi >= len(self.blocks)

    def _ensure_decoded(self):
        if self.cur_docids is None:
            f, docs, tfs, dls, k1, b, avgdl = self.blocks[self.bi]
            d, t, l_ = decode_block(f, docs, tfs, dls)
            tf = t.astype(np.float64)
            dl = l_.astype(np.float64)
            self.cur_docids = d
            self.cur_scores = self.weight * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))

    def doc(self) -> int:
        """Current docid (next posting ≥ previous advance target)."""
        self._ensure_decoded()
        return int(self.cur_docids[self.pos])

    def block_ub(self) -> float:
        return float(self.ubs[self.bi])

    def score(self) -> float:
        self._ensure_decoded()
        return float(self.cur_scores[self.pos])

    def advance_to(self, target: int) -> None:
        """Move to first posting with docid ≥ target (block-level skip without
        decoding skipped blocks)."""
        while self.bi < len(self.blocks):
            if self.lasts[self.bi] < target:
                self.bi += 1
                self.pos = 0
                self.cur_docids = None
                self.cur_scores = None
                continue
            self._ensure_decoded()
            self.pos += int(
                np.searchsorted(self.cur_docids[self.pos:], target, side="left")
            )
            if self.pos >= self.cur_docids.size:
                self.bi += 1
                self.pos = 0
                self.cur_docids = None
                self.cur_scores = None
                continue
            return
        # exhausted

    def next_posting(self) -> None:
        self.advance_to(self.doc() + 1)


def _wand_query(qid: str, term_blocks: dict, k: int):
    """Score-safe block-max WAND over one query's term cursors."""
    cursors = [ _TermCursor(*v) for v in term_blocks.values() ]
    for c in cursors:
        c.advance_to(0)
    cursors = [c for c in cursors if not c.exhausted()]
    heap: list[tuple[float, int]] = []  # (score, -docid) min-heap of top-k
    theta = 0.0

    while cursors:
        cursors = [c for c in cursors if not c.exhausted()]
        if not cursors:
            break
        cursors.sort(key=lambda c: c.doc())
        # pivot: first prefix whose *global* term UBs could still reach theta.
        # Comparisons are >= so score-ties at theta are never pruned — docid
        # tie-break then matches the exact path bit-for-bit.
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(cursors):
            acc += c.max_ub
            if acc >= theta or len(heap) < k:
                pivot_idx = i
                break
        if pivot_idx == -1:
            break  # nothing can beat theta
        pivot_doc = cursors[pivot_idx].doc()
        if cursors[0].doc() == pivot_doc:
            # all cursors up to pivot are aligned on pivot_doc → block-max check
            block_ub = 0.0
            for c in cursors:
                if c.doc() > pivot_doc:
                    break
                block_ub += c.block_ub()
            if block_ub >= theta or len(heap) < k:
                s = 0.0
                for c in cursors:
                    if c.exhausted():
                        continue
                    if c.doc() == pivot_doc:
                        s += c.score()
                for c in cursors:
                    if not c.exhausted() and c.doc() == pivot_doc:
                        c.next_posting()
                item = (s, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                    if len(heap) == k:
                        theta = heap[0][0]
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
                    theta = heap[0][0]
            else:
                # safe skip: advance the aligned cursors past this doc
                for c in cursors:
                    if not c.exhausted() and c.doc() == pivot_doc:
                        c.next_posting()
        else:
            # advance one lagging cursor to the pivot
            cursors[0].advance_to(pivot_doc)

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(qid, -nd, s, r + 1) for r, (s, nd) in enumerate(out)]


class _UnionDead:
    """Per-query drop set: a MUST_NOT clause's decoded docids unioned with
    the global exclude set (array / DocidBitmap / DocidMask). Duck-types
    the `contains` hook _mask_dead dispatches on."""

    __slots__ = ("base", "extra")

    def __init__(self, base, extra_sorted: np.ndarray):
        self.base = base          # None | array | bitmap/mask (.contains)
        self.extra = extra_sorted  # sorted int64

    def __len__(self) -> int:
        return 1  # truthy: len only gates the no-op fast path

    def contains(self, d: np.ndarray) -> np.ndarray:
        d = np.asarray(d, dtype=np.int64)
        if self.extra.size:
            pos = np.searchsorted(self.extra, d)
            np.minimum(pos, self.extra.size - 1, out=pos)
            drop = self.extra[pos] == d
        else:
            drop = np.zeros(d.size, dtype=bool)
        if self.base is not None:
            if hasattr(self.base, "contains"):
                drop |= self.base.contains(d)
            else:
                drop |= np.isin(d, self.base)
        return drop


def _neg_drop_set(neg_block_lists, base) -> "_UnionDead":
    """Decode MUST_NOT streams' blocks into a per-query drop set unioned
    with ``base`` (tombstones / filter mask / None). Shared by
    wand_topk's kernel dispatch and the serving reader."""
    nd = []
    for blocks in neg_block_lists:
        if blocks:
            d0, _, _ = decode_blocks_batch(
                [blk[0] for blk in blocks], [blk[1] for blk in blocks],
                [blk[2] for blk in blocks], [blk[3] for blk in blocks],
            )
            nd.append(d0)
    extra = (
        np.unique(np.concatenate(nd)) if nd else np.empty(0, dtype=np.int64)
    )
    return _UnionDead(base, extra)


def _mask_dead(d: np.ndarray, s: np.ndarray, dead):
    """Drop tombstoned docids from a decoded (docid, score) stream. Applied
    IMMEDIATELY after decode in every kernel so deleted docs cease to exist
    before any θ bootstrap / bound / accumulation — pruning thresholds are
    then derived from survivors only, which keeps pruning score-safe under
    deletion (a θ that counted deleted docs could over-prune).

    ``dead`` is either a small sorted int64 array (np.isin path) or a
    deletes.DocidBitmap (roaring-shaped; vectorized ``contains`` —
    bounded memory at millions of tombstones)."""
    if dead is None or len(dead) == 0 or d.size == 0:
        return d, s
    if hasattr(dead, "contains"):  # deletes.DocidBitmap (duck-typed: no import cycle)
        keep = ~dead.contains(d)
    else:
        keep = ~np.isin(d, dead)
    return d[keep], s[keep]


def _pruned_query(qid: str, term_blocks: dict, k: int, dead=None):
    """Vectorized score-safe pruning (the default scale path).

    Classic DAAT block-max WAND (``_wand_query``) is per-pivot Python — it
    measured 5x slower than vectorized exact decode on corpora whose scores
    are homogeneous (nothing prunable). This variant keeps everything numpy:

    1. bootstrap θ: fully score the single highest-upper-bound term
       (vectorized); take its kth partial score — a lower bound of the true
       kth total, so pruning with it is safe.
    2. essential terms: order terms by total upper bound ascending; the
       maximal prefix whose UB sum is < θ is non-essential — a doc appearing
       ONLY in those lists scores ≤ that sum < θ and can never reach top-k.
    3. decode every essential term's blocks (vectorized), bincount-accumulate
       → candidate docs with their essential-term partials.
    4. for each non-essential term, decode ONLY blocks whose docid range
       intersects the candidate set (block-max metadata range check via
       searchsorted) and add contributions for candidate docs.
    5. exact top-k over candidates (their totals are complete).

    Degenerates to the exact path when θ can't exclude any term (all terms
    essential) — so it is never slower than exact by more than the bootstrap.
    """
    if not term_blocks:
        return []
    entries = list(term_blocks.values())
    # per-term total upper bound = weight * max block tfn (ubs already scaled)
    total_ubs = np.array(
        [float(e[3].max()) * e[0] if len(e[3]) else 0.0 for e in entries]
    )

    def decode_term(e):
        k1, b, avgdl = e[4][0][4], e[4][0][5], e[4][0][6]
        d, t, l_ = decode_blocks_batch(
            [blk[0] for blk in e[4]], [blk[1] for blk in e[4]],
            [blk[2] for blk in e[4]], [blk[3] for blk in e[4]],
        )
        tf = t.astype(np.float64)
        dl = l_.astype(np.float64)
        return _mask_dead(
            d, e[0] * tf / (tf + k1 * (1.0 - b + b * dl / avgdl)), dead
        )

    # 1. bootstrap theta from the strongest term
    boot = int(np.argmax(total_ubs))
    bd, bs = decode_term(entries[boot])
    if bd.size > k:
        theta = float(np.partition(bs, bd.size - k)[bd.size - k])
    else:
        theta = 0.0

    # 2. essential split
    order = np.argsort(total_ubs, kind="stable")
    cum = np.cumsum(total_ubs[order])
    non_essential = [int(i) for i, c in zip(order, cum) if c < theta]
    essential = [i for i in range(len(entries)) if i not in set(non_essential)]

    # 3. decode essential terms, accumulate
    all_d = [bd] if boot in essential else []
    all_s = [bs] if boot in essential else []
    for i in essential:
        if i == boot:
            continue
        d, s = decode_term(entries[i])
        all_d.append(d)
        all_s.append(s)
    if not all_d:
        return []
    d = np.concatenate(all_d)
    s = np.concatenate(all_s)
    cand, acc = _accumulate(d, s)

    # 4. candidate-only rescoring against non-essential terms: select
    # range-intersecting blocks vectorized, bulk-decode them, then ONE
    # searchsorted membership pass per term
    for i in non_essential:
        e = entries[i]
        firsts, lasts = e[1], e[2]
        lo = np.searchsorted(cand, firsts, side="left")
        hi = np.searchsorted(cand, lasts, side="right")
        touch = np.nonzero(hi > lo)[0]
        if touch.size == 0:
            continue
        k1, b, avgdl = e[4][0][4], e[4][0][5], e[4][0][6]
        bd2, bt, bl = decode_blocks_batch(
            [e[4][bi][0] for bi in touch], [e[4][bi][1] for bi in touch],
            [e[4][bi][2] for bi in touch], [e[4][bi][3] for bi in touch],
        )
        pos = np.searchsorted(cand, bd2)
        pos[pos >= cand.size] = 0
        hitmask = cand[pos] == bd2
        if not hitmask.any():
            continue
        tf = bt[hitmask].astype(np.float64)
        dl = bl[hitmask].astype(np.float64)
        contrib = e[0] * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
        np.add.at(acc, pos[hitmask], contrib)

    return _topk_rows(qid, cand, acc, k)


def _auto_query(qid: str, term_blocks: dict, k: int, dead=None):
    """Per-query mode pick from the term upper-bound spread (no decoding):
    union-bound pruning can only exclude a term when some UB prefix sum stays
    below θ, and θ is at most the strongest term's UB — so if the weakest
    term's UB is already ≥ half the strongest's, nothing is realistically
    prunable and the exact path's simpler kernel wins. When pruning IS
    plausible, ``_pruned_query`` is chosen; it degenerates to exact when θ
    turns out too low, so auto never loses more than the bootstrap pass."""
    if len(term_blocks) <= 1:
        return _exact_query(qid, term_blocks, k, dead)
    ubs = [
        (float(e[3].max()) if len(e[3]) else 0.0) * e[0]
        for e in term_blocks.values()
    ]
    if min(ubs) < 0.5 * max(ubs):
        return _pruned_query(qid, term_blocks, k, dead)
    return _exact_query(qid, term_blocks, k, dead)


def _exact_query(qid: str, term_blocks: dict, k: int, dead=None):
    """Exact path: decode every block of every query term (ONE batched
    varint pass per term per stream), vectorized accumulate, top-k."""
    all_d, all_s = [], []
    for weight, firsts, lasts, ubs, blocks in term_blocks.values():
        if not blocks:
            continue
        k1, b, avgdl = blocks[0][4], blocks[0][5], blocks[0][6]
        d, t, l_ = decode_blocks_batch(
            [blk[0] for blk in blocks], [blk[1] for blk in blocks],
            [blk[2] for blk in blocks], [blk[3] for blk in blocks],
        )
        tf = t.astype(np.float64)
        dl = l_.astype(np.float64)
        dm, sm = _mask_dead(
            d, weight * tf / (tf + k1 * (1.0 - b + b * dl / avgdl)), dead
        )
        all_d.append(dm)
        all_s.append(sm)
    if not all_d:
        return []
    d = np.concatenate(all_d)
    s = np.concatenate(all_s)
    uniq, acc = _accumulate(d, s)
    return _topk_rows(qid, uniq, acc, k)


def _conjunctive_query(qid: str, term_blocks: dict, k: int, m_required: int,
                       dead=None):
    """Boolean-AND / minimum-should-match form of the exact kernel: a
    term's postings are docid-unique, so a docid's occurrence count in the
    concatenated decode stream IS its matched-distinct-term count — one
    extra accumulate of ones, then the match filter before top-k.
    ``m_required`` < 0 encodes min_should_match = |m_required| (at-least);
    ≥ 0 means exact equality (the AND form, equality with the query's
    distinct term count — a query with an OOV term passes an m_required
    larger than the in-task term count and matches nothing, as Lucene)."""
    all_d, all_s = [], []
    for weight, firsts, lasts, ubs, blocks in term_blocks.values():
        if not blocks:
            continue
        k1, b, avgdl = blocks[0][4], blocks[0][5], blocks[0][6]
        d, t, l_ = decode_blocks_batch(
            [blk[0] for blk in blocks], [blk[1] for blk in blocks],
            [blk[2] for blk in blocks], [blk[3] for blk in blocks],
        )
        tf = t.astype(np.float64)
        dl = l_.astype(np.float64)
        dm, sm = _mask_dead(
            d, weight * tf / (tf + k1 * (1.0 - b + b * dl / avgdl)), dead
        )
        all_d.append(dm)
        all_s.append(sm)
    if not all_d:
        return []
    d = np.concatenate(all_d)
    s = np.concatenate(all_s)
    uniq, acc = _accumulate(d, s)
    _, cnt = _accumulate(d, np.ones(d.size, dtype=np.float64))
    if m_required < 0:
        mask = cnt >= -m_required
    else:
        mask = cnt == m_required
    return _topk_rows(qid, uniq[mask], acc[mask], k)


# single-slot cache for the two-phase candidate set: _two_phase_prune
# persists its input so the metadata agg and the scoring job scan the
# term-pruned blocks once, not twice. The SCORING job is lazy — the caller
# triggers it after wand_topk returns — so the persist cannot be released
# inside this module at the right moment. Instead each new two-phase call
# evicts the PREVIOUS call's cached set (by then its scoring job has run in
# any sequential usage), bounding accumulation to one cached DataFrame per
# session (ADVICE r03: repeated calls used to accumulate cached partitions
# until LRU pressure). release_two_phase_cache() frees the last one.
_TP_CACHE: list[DataFrame] = []

# largest include_docids DataFrame wand_topk will pull to the driver
# (~40 MB of int64 docids); larger filter sets belong in the index layout
# (layout.build_filter_partitioned_store) or arrive as a DocidBitmap
INCLUDE_DOCIDS_DF_CAP = 5_000_000
_MASK_BC: list = []  # live exclude/include mask broadcasts (see release hook)


def release_mask_broadcasts() -> None:
    """Unpersist mask broadcasts created by earlier wand_topk calls with
    large exclude/include sets. Call once the result DataFrames of those
    calls have been consumed — a long-lived session issuing many filtered
    queries otherwise accumulates executor broadcast blocks until Python GC
    happens to collect the closures (ADVICE r05)."""
    while _MASK_BC:
        try:
            _MASK_BC.pop().unpersist()
        except Exception:
            pass


def release_two_phase_cache() -> None:
    """Unpersist the candidate-block set cached by the most recent
    wand_topk(two_phase=True) plan. Call after the query results have been
    consumed (e.g. between benchmark phases or at session teardown)."""
    while _TP_CACHE:
        _TP_CACHE.pop().unpersist()


def _two_phase_prune(
    cand: DataFrame,
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    n_part: int,
    max_ranges_per_query: int = 512,
    block_size: int = 128,
) -> DataFrame:
    """PLAN-LEVEL shuffle pruning (two-phase fetch): drop non-essential
    terms' blocks BEFORE the per-query repartition, so hot (stopword) terms'
    block bytes never ride the big shuffle.

    Phase 1 — ONE metadata-only aggregation over the term-pruned block scan
    (no posting decode, no Python workers): per (qid, term) collect the
    total upper bound w·max(max_tfn), the k largest block max_tfn values,
    and up to ``max_ranges_per_query`` block [first, last] ranges. Then
    driver-side:

    * θ_q = w·(kth-largest block max_tfn) of the strongest-UB term. Valid
      lower bound of the true kth total: the term's blocks are
      docid-DISJOINT, so its k best block maxima are achieved by k distinct
      docs, each with total ≥ its partial ≥ θ_q.
    * essential split (mirrors _pruned_query step 2): terms ordered by UB
      ascending — the maximal prefix with UB-sum < θ_q is non-essential; a
      doc appearing only in those lists scores < θ_q and can't reach top-k.
    * essential terms' block ranges merge into per-query intervals.

    Phase 2 (the filter): keep every essential block; keep a non-essential
    block only if its [docid_first, docid_last] overlaps some essential
    interval of that query. Safe: candidates live in essential posting
    lists, so any block holding a candidate posting overlaps an essential
    block's range — dropped blocks contain only postings of docs whose FULL
    totals are < θ_q ≤ true kth. The downstream kernel therefore returns
    identical top-k (tested, incl. controls where nothing may be pruned).

    Degrades to the unpruned plan per query when: the strongest term has
    < k blocks (θ unavailable → genuinely unprunable: ranks below the rare
    term's df are decided by the hot terms), UBs are homogeneous, or an
    essential term's ranges exceed the cap. Pays when rare terms are
    docid-CLUSTERED (one repo's identifier) — scattered rare terms span one
    giant block range and keep everything, correctly.

    The candidate set is persisted (MEMORY_AND_DISK) so the metadata agg
    and the final scoring job scan the term-pruned blocks once, not twice —
    measured ~25% off the two-phase overhead; exactly ONE candidate set
    stays cached per session (see _TP_CACHE / release_two_phase_cache).

    SCALE — bounded aggregation state (VERDICT r03 ask #3): the r03 version
    collect_list'ed EVERY block's range per (qid, term) before slicing —
    unbounded state for a stopword term at 10^6+ blocks. Phase 1 now
    pre-coarsens blocks into docid CELLS of width 64·block_size before any
    list aggregation:

    * cell agg (qid, term, cell): min/max range, count, and the cell's
      top-k block max_tfn. A term's blocks are docid-disjoint and each
      spans ≥ block_size docids, so a cell holds ≤ ~65 blocks per bucket
      by construction — the collect_list state is bounded by geometry, not
      by blocks-per-term.
    * two row_number windows over (qid, term) rank cells by cell-max and
      by lo; the term-level agg then collect_lists ONLY rows ranked ≤ k
      (resp. ≤ cap+1) — ≤ k arrays of ≤ k floats + cap+1 structs of state
      per group, regardless of term size.

    θ is unchanged: the global top-k block maxima all lie in the union of
    the top-k cells' per-cell top-k lists (a block outside it is beaten by
    ≥ k distinct blocks), so the kth value — and every prune decision — is
    identical to the uncoarsened version. Essential-term intervals use the
    per-cell [lo, hi] coarsening — a superset covering, so the overlap
    filter keeps a superset of the uncoarsened keep-set: safe. Terms whose
    CELL count exceeds the cap skip pruning (ship all), as before — but
    since cells ≤ blocks, pruning now applies to more shapes."""
    from pyspark.sql.window import Window

    release_two_phase_cache()
    cand = cand.persist()
    _TP_CACHE.append(cand)
    spark = cand.sparkSession

    cap = max_ranges_per_query
    cell_width = max(int(block_size), 1) * 64
    cells = (
        cand.groupBy(
            "qid",
            "term",
            F.floor(F.col("docid_first") / cell_width).alias("cell"),
        )
        .agg(
            F.min("docid_first").alias("lo"),
            F.max("docid_last").alias("hi"),
            F.count("*").alias("nb"),
            F.slice(
                F.reverse(F.array_sort(F.collect_list("max_tfn"))), 1, k
            ).alias("ctop"),
            F.first("w").alias("w"),
        )
        .withColumn("cmax", F.element_at("ctop", 1))
    )
    wkey = Window.partitionBy("qid", "term")
    cells = cells.withColumn(
        "rmax",
        F.row_number().over(wkey.orderBy(F.desc("cmax"), F.asc("lo"))),
    ).withColumn("rlo", F.row_number().over(wkey.orderBy(F.asc("lo"))))
    stats = (
        cells.groupBy("qid", "term")
        .agg(
            F.max(F.col("w") * F.col("cmax")).alias("ub"),
            F.sum("nb").alias("nb"),
            F.count("*").alias("ncells"),
            F.first("w").alias("w"),
            F.slice(
                F.reverse(
                    F.array_sort(
                        F.flatten(
                            F.collect_list(
                                F.when(F.col("rmax") <= k, F.col("ctop"))
                            )
                        )
                    )
                ),
                1,
                k,
            ).alias("topmax"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("rlo") <= cap + 1, F.struct("lo", "hi"))
                )
            ).alias("ranges"),
        )
        .collect()
    )
    by_q: dict[str, list] = {}
    for r in stats:
        by_q.setdefault(r["qid"], []).append(r)
    ne_pairs: list[tuple[str, str]] = []
    intervals: list[tuple[str, int, int]] = []
    for q, ts in by_q.items():
        if len(ts) <= 1:
            continue
        strongest = max(ts, key=lambda r: r["ub"])
        if len(strongest["topmax"]) < k:
            continue  # θ bound unavailable → unprunable (see docstring)
        theta = float(strongest["w"]) * float(strongest["topmax"][k - 1])
        if theta <= 0.0:
            continue
        acc = 0.0
        q_ne: list[str] = []
        for r in sorted(ts, key=lambda r: r["ub"]):
            if acc + r["ub"] < theta and r["term"] != strongest["term"]:
                acc += r["ub"]
                q_ne.append(r["term"])
            else:
                break
        if not q_ne:
            continue
        # merged intervals over the ESSENTIAL terms' cell-coarsened ranges
        ess = [r for r in ts if r["term"] not in set(q_ne)]
        if any(r["ncells"] > cap for r in ess):
            continue  # ranges truncated → can't prove safety; ship all
        rs = sorted(
            (int(x["lo"]), int(x["hi"]))
            for r in ess
            for x in r["ranges"]
        )
        merged: list[list[int]] = []
        for lo, hi in rs:
            if merged and lo <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        if len(merged) > cap:
            continue
        ne_pairs.extend((q, t) for t in q_ne)
        intervals.extend((q, m[0], m[1]) for m in merged)
    if not ne_pairs or not intervals:
        return cand

    ne_df = spark.createDataFrame(ne_pairs, ["qid", "term"])
    ness = cand.join(F.broadcast(ne_df), ["qid", "term"], "left_semi")
    ess_rows = cand.join(F.broadcast(ne_df), ["qid", "term"], "left_anti")
    iv = spark.createDataFrame(intervals, "qid string, lo long, hi long")
    kept_ne = ness.alias("bk").join(
        F.broadcast(iv).alias("rg"),
        (F.col("bk.qid") == F.col("rg.qid"))
        & (F.col("bk.docid_first") <= F.col("rg.hi"))
        & (F.col("bk.docid_last") >= F.col("rg.lo")),
        "left_semi",
    )
    return ess_rows.unionByName(kept_ne.select(*ess_rows.columns))


def _two_phase_auto_decide(
    qt_stats: list,
    k: int,
    block_size: int,
    threshold_bytes: int,
) -> bool:
    """Cheap dictionary-only predictor of whether the two-phase prune's
    fixed cost (one extra metadata job + a persist, ~1 s) will be repaid by
    shuffle savings (VERDICT r03 ask #4). No block scan: per query, mimic
    the essential split with ub ≈ w (max_tfn ceiling assumed uniform) and
    θ ≈ 0.5·w_strongest, then sum the NON-ESSENTIAL terms' posting counts
    (df) — the volume the prune could keep off the shuffle. Engage only
    when the estimated prunable bytes (≈4 B/posting across the varint
    streams) exceed ``threshold_bytes``. At sandbox scale (≤ a few M
    postings) this predicts OFF — matching the measured wall-time loss of
    always-on two-phase on in-memory-local shuffles; at cluster scale hot
    terms carry GB–TB of postings and it engages. Mispredictions only cost
    performance, never correctness (the real prune re-verifies safety from
    true block metadata)."""
    by_q: dict[str, list] = {}
    for qid, term, w, df in qt_stats:
        by_q.setdefault(qid, []).append((w, df))
    prunable_postings = 0
    for ts in by_q.values():
        if len(ts) <= 1:
            continue
        ts = sorted(ts)
        w_strong, df_strong = ts[-1]
        if (df_strong + block_size - 1) // block_size < k:
            continue  # θ likely unavailable (too few blocks)
        theta_est = 0.5 * w_strong
        acc = 0.0
        for w, df in ts[:-1]:
            if acc + w < theta_est:
                acc += w
                prunable_postings += df
            else:
                break
    return prunable_postings * 4 > threshold_bytes


def candidate_block_plan(
    seg: SegmentIndex,
    queries: DataFrame,
    k: int = 10,
    qid_col: str = "query_id",
    query_col: str = "query",
    num_partitions: int | None = None,
    two_phase: bool | str = False,
    qterms: DataFrame | None = None,
):
    """The pre-shuffle block plan shared by wand_topk (and measurable on its
    own — bench counts its rows to record shuffle-block reduction):
    term-IN() pushdown + bucket partition pruning + broadcast qt_idf join
    [+ the optional two-phase prune] → (cand DF, n_part, doc_layout)."""
    cfg = seg.config
    k1, b = cfg.k1, cfg.b
    avgdl = seg.avgdl_effective
    spark = queries.sparkSession

    # ``qterms`` overrides tokenization with a precomputed (qid, term, qtf)
    # set — the hook that runs multi-term EXPANSIONS (prefix / fuzzy /
    # wildcard / MLT term selections) on this scale path. An optional
    # ``boost`` column (Lucene term^boost — query.boosted_query_terms)
    # scales that term's stream weight w; every kernel bound (block-max
    # UBs, θ, essential split) is computed FROM w, so boosted pruning
    # stays score-safe with no kernel changes.
    has_boost = qterms is not None and "boost" in qterms.columns
    qt = (
        qterms.select(
            "qid", "term", "qtf", *(["boost"] if has_boost else [])
        )
        if qterms is not None
        else query_terms(queries, qid_col, query_col)
    )
    if has_boost:
        # boost contract on this path: strictly positive (w == 0.0 is the
        # MUST_NOT marker, and the kernels' upper bounds assume w > 0).
        # A zero boost means "term contributes nothing" — dropping the
        # stream IS that semantics; a negative-boost token ('term^-2')
        # does not match the parse regex, so it survives as the literal
        # term with boost 1.0 — no negative weight can reach the kernel.
        qt = qt.filter(
            (F.col("qtf") == 0) | (F.coalesce(F.col("boost"), F.lit(1.0)) != 0)
        )

    # the query's term set is tiny and known up front — push it as a literal
    # IN() into the block scan (parquet row-group + dictionary-page skipping)
    # and prune bucket partitions (the persisted layout is partitionBy(bucket),
    # so whole directories are skipped). O(#query-terms) driver work only.
    # In 'auto' mode the SAME collect also carries the dictionary's df/idf
    # stats the engage heuristic needs — one job either way, no extra pass
    # (an OOV term has no blocks, so dropping it from the IN() is harmless).
    qt_stats: list | None = None
    if two_phase == "auto":
        rows = (
            seg.dictionary.join(F.broadcast(qt), "term")
            .select(
                "qid", "term", "qtf", "idf", "df",
                *(["boost"] if has_boost else []),
            )
            .collect()
        )
        qt_stats = [
            (
                r["qid"],
                r["term"],
                float(r["qtf"]) * float(r["idf"]) * (k1 + 1.0)
                * (float(r["boost"] or 1.0) if has_boost else 1.0),
                int(r["df"]),
            )
            for r in rows
        ]
        terms = sorted({r["term"] for r in rows})
    else:
        # driver-originated query/qterm sets (the serving/bench shape)
        # resolve the distinct-term IN() pushdown without touching the
        # cluster; distributed inputs fall back to the collect job
        from flagembedding_spark.operators.query import driver_local_rows

        local_qt = driver_local_rows(qt)
        if local_qt is not None:
            terms = sorted({r["term"] for r in local_qt})
        else:
            terms = [
                r["term"] for r in qt.select("term").distinct().collect()
            ]
    blocks = seg.blocks
    doc_layout = getattr(seg, "layout", "term") == "doc"
    if 0 < len(terms) <= 10_000:
        blocks = blocks.filter(F.col("term").isin(terms))
        # bucket pruning only applies to the term-hash layout; in the doc
        # layout every bucket can hold any term. The bucket of each term is
        # computed DRIVER-SIDE with the pytest-verified xxhash64 twin — the
        # old createDataFrame+collect spent a whole Spark job hashing a
        # handful of strings on every query batch.
        if not doc_layout and "bucket" in blocks.columns:
            from flagembedding_spark.functions.hashing import pmod_xxhash64_py

            buckets = sorted(
                {pmod_xxhash64_py(t, cfg.term_buckets) for t in terms}
            )
            blocks = blocks.filter(F.col("bucket").isin(buckets))

    qt_idf = seg.dictionary.join(F.broadcast(qt), "term").select(
        "qid", "term", "qtf", "idf", *(["boost"] if has_boost else [])
    )
    w_expr = F.col("qtf") * F.col("idf") * F.lit(k1 + 1.0)
    if has_boost:
        w_expr = w_expr * F.coalesce(F.col("boost"), F.lit(1.0))
    cand = blocks.join(F.broadcast(qt_idf), "term").withColumn("w", w_expr)
    n_part = num_partitions or min(
        max(spark.sparkContext.defaultParallelism, 4), 64
    )
    if two_phase == "auto":
        # decide from the dictionary stats already collected above —
        # no block scan, no extra job
        thresh = int(
            os.environ.get("FES_TWOPHASE_AUTO_BYTES", str(256 << 20))
        )
        two_phase = _two_phase_auto_decide(
            qt_stats or [], k, cfg.block_size, thresh
        )
    if two_phase:
        # plan-level prune BEFORE the big repartition: hot non-essential
        # terms' blocks that can't intersect any candidate never ride the
        # shuffle (applies to either layout; identity-tested)
        cand = _two_phase_prune(
            cand, k1, b, avgdl, k, n_part, block_size=cfg.block_size
        )
    return cand, n_part, doc_layout


def wand_topk(
    seg: SegmentIndex,
    queries: DataFrame,
    k: int = 10,
    use_wand: bool | str = True,
    qid_col: str = "query_id",
    query_col: str = "query",
    num_partitions: int | None = None,
    two_phase: bool | str = False,
    exclude_docids=None,
    min_should_match: int | str = 0,
    qterms: DataFrame | None = None,
    include_docids=None,
    must_not: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25 over the merged segment index.

    ``use_wand``: 'auto' (default for True — per-query pick between pruned
    and exact from the term-UB spread), 'pruned' (vectorized union-bound
    pruning with candidate rescoring), 'daat' (classic per-pivot block-max
    WAND), or False/'exact' (decode everything). All modes return identical
    top-k (tested); 'auto' is the scale default — pruning wins on skewed-idf
    queries (rare term + stopwords), exact wins when every term's UB is
    comparable and nothing is prunable.

    ``num_partitions`` bounds the per-query scoring tasks (default: the
    cluster's parallelism, capped — a 200-partition session default would
    spin 200 Python workers for a handful of queries).

    ``two_phase`` enables the plan-level shuffle prune (_two_phase_prune):
    identical top-k, fewer block bytes through the big repartition — wins
    when queries mix rare terms with hot ones. ``'auto'`` engages it only
    when the dictionary-stats heuristic predicts the prunable shuffle
    volume repays the extra metadata job (threshold via
    FES_TWOPHASE_AUTO_BYTES, default 256 MB) — off at sandbox scale, on
    for cluster-scale hot-term volumes.

    ``exclude_docids``: live tombstones (operators/deletes.py — Lucene
    live-docs semantics: deleted docs vanish from results, surviving
    scores keep the index's STALE stats). Masked IN-KERNEL immediately
    after decode (_mask_dead) so every θ/bound reflects survivors —
    score-safe with no over-fetch. Incompatible with two_phase=True
    (disjunctive-θ assumption; 'auto' degrades to off).

    ``include_docids``: metadata-filtered search (Lucene filter clause) —
    restricts candidates to the given docids, scores keep GLOBAL index
    statistics (a filter never rescores). Accepts a (docid) DataFrame,
    a deletes.DocidBitmap, or an iterable; masked in-kernel with the
    same survivor-aware hook as deletes (non-included docs cease to
    exist before θ bootstrap — score-safe, pruning only tightens).
    Same two_phase incompatibility as exclude_docids. Filter sets are
    selection-sized; a hot recurring filter belongs in the index layout.

    ``must_not``: Lucene BooleanClause.MUST_NOT — a (qid, term)
    DataFrame. Prohibited terms ride the same block plan flagged w=0;
    the kernel decodes them into a per-query drop set BEFORE scoring
    (posting-iterator subtraction, task-local in both layouts), so docs
    containing any prohibited term never reach θ/bounds/match counts.
    A term both scored and prohibited follows MUST_NOT precedence.
    Incompatible with two_phase=True ('auto' degrades to off).

    ``min_should_match``: same Boolean semantics as the DataFrame engine
    (query.py) — int n keeps docs matching ≥ n distinct query terms,
    ``'all'`` is conjunctive AND (OOV term ⇒ empty). Routes every query
    through the conjunctive exact kernel (the WAND union-bound is a
    DISJUNCTIVE bound and cannot prune under a match-count constraint),
    term-docid-disjointness making the match count one extra vectorized
    accumulate. Works in both layouts (a doc's postings are task-local in
    each)."""
    cfg = seg.config
    k1, b = cfg.k1, cfg.b
    avgdl = seg.avgdl_effective
    spark = queries.sparkSession
    # Two-phase's θ is a disjunctive bound witnessed by live docs: the kth
    # block-max of the strongest term may be witnessed entirely by
    # tombstoned docs (masked only later, in-kernel), and min_should_match
    # re-scopes which docs can reach top-k at all — either combination can
    # silently drop surviving results. Explicit two_phase=True with either
    # is an error; 'auto' degrades to off (the prune simply never engages).
    if must_not is not None:
        # MUST_NOT on the segment path: prohibited terms ride the SAME
        # block plan as scoring terms, flagged by qtf=0 → w=0.0 (a scoring
        # term's w is strictly positive: qtf ≥ 1 and idf > 0 by the BM25+1
        # formula). The kernel decodes w=0 streams into a per-query drop
        # set BEFORE any scoring/pruning — Lucene's posting-iterator
        # subtraction, task-local in both layouts (term layout: all of a
        # query's streams share its task; doc layout: a doc's postings for
        # every term share its bucket).
        _hb = qterms is not None and "boost" in qterms.columns
        qt_base = (
            qterms.select(
                "qid", "term", "qtf", *(["boost"] if _hb else [])
            )
            if qterms is not None
            else query_terms(queries, qid_col, query_col)
        )
        neg_qt = must_not.select("qid", "term").distinct()
        neg_rows = neg_qt.withColumn("qtf", F.lit(0).cast("long"))
        if _hb:
            neg_rows = neg_rows.withColumn("boost", F.lit(1.0))
        # MUST_NOT precedence (Lucene): a term both scored and prohibited
        # scores no doc — every doc containing it is excluded — so its
        # positive row is dropped rather than letting the (qid, term)
        # streams collide in the kernel's per-term packing
        qterms = qt_base.join(neg_qt, ["qid", "term"], "left_anti").unionByName(
            neg_rows
        )
    if two_phase and (
        exclude_docids is not None
        or include_docids is not None
        or must_not is not None
        or min_should_match
    ):
        if two_phase == "auto":
            two_phase = False
        else:
            raise ValueError(
                "two_phase=True is incompatible with exclude_docids / "
                "include_docids / must_not / min_should_match (the prune's "
                "θ-preservation argument assumes disjunctive scoring over "
                "live, unrestricted docs); use two_phase='auto' or False, "
                "or compact_store first"
            )
    cand, n_part, doc_layout = candidate_block_plan(
        seg, queries, k, qid_col, query_col, num_partitions, two_phase,
        qterms,
    )
    if doc_layout:
        # doc layout: co-locate by docid bucket — a hot query's blocks spread
        # over every doc partition instead of one task per query; per-doc
        # scores stay task-local so partition-local top-k is globally exact
        cand = cand.repartition(n_part, "bucket")
    else:
        cand = cand.repartition(n_part, "qid")

    # tombstones are masked IN-KERNEL immediately after decode (_mask_dead),
    # so every θ/bound already reflects survivors — no over-fetch needed
    # (the r4-initial k+|deleted| over-fetch cost 1.6× at 2 M docs with a
    # 1000-doc tombstone set because pruning thresholds collapsed). No size
    # cap: large sets ride a roaring-shaped DocidBitmap whose compressed
    # containers ship once in the task closure (broadcast by Spark).
    dead_arr = None
    if exclude_docids is not None:
        from flagembedding_spark.operators.deletes import DocidBitmap

        if isinstance(exclude_docids, DocidBitmap):
            dead_arr = exclude_docids if len(exclude_docids) else None
        else:
            arr = np.unique(np.asarray(
                exclude_docids if isinstance(exclude_docids, np.ndarray)
                else list(exclude_docids), dtype=np.int64))
            # bitmap beats np.isin well below the container cutover: isin
            # re-sorts dead∪decoded on EVERY block stream, the bitmap is
            # one searchsorted over container keys (10M probe: 1M-bitmap
            # leg outran the 1k-isin leg). Keep raw arrays only when tiny.
            if arr.size > 64:
                dead_arr = DocidBitmap.from_array(arr)
            elif arr.size:
                dead_arr = arr
    if include_docids is not None:
        from flagembedding_spark.operators.deletes import (
            DocidBitmap,
            DocidMask,
        )

        if isinstance(include_docids, DocidBitmap):
            inc = include_docids
        elif isinstance(include_docids, DataFrame):
            # guard the driver materialization: a filter set past this cap
            # (40 MB of docids) is not a metadata selection — the limit
            # probe costs one extra row instead of a count job
            cap = INCLUDE_DOCIDS_DF_CAP
            pdf = include_docids.select("docid").limit(cap + 1).toPandas()
            if len(pdf) > cap:
                raise ValueError(
                    f"include_docids exceeds {cap} rows; a filter set this "
                    "large belongs in the index layout — materialize a "
                    "hot-filter sub-store (layout."
                    "build_filter_partitioned_store) or pass a DocidBitmap"
                )
            inc = DocidBitmap.from_array(
                np.asarray(pdf["docid"], dtype=np.int64)
            )
        else:
            inc = DocidBitmap.from_array(np.asarray(
                include_docids if isinstance(include_docids, np.ndarray)
                else list(include_docids), dtype=np.int64))
        dead_arr = DocidMask(exclude=dead_arr, include=inc)
    # ship big masks via an EXPLICIT broadcast: a closure-captured bitmap
    # serializes into every task's binary (n_part redundant copies of a
    # potentially tens-of-MB include set); TorrentBroadcast ships it once
    # per executor. Tiny arrays stay in the closure — cheaper than the
    # broadcast round-trip.
    dead_bc = None
    if dead_arr is not None and not (
        isinstance(dead_arr, np.ndarray) and dead_arr.size <= 4096
    ):
        dead_bc = spark.sparkContext.broadcast(dead_arr)
        _MASK_BC.append(dead_bc)  # released via release_mask_broadcasts()
        dead_arr = None
    kk = k
    if use_wand is True:
        mode = "auto"
    elif use_wand is False:
        mode = "exact"
    else:
        mode = use_wand
    if mode not in ("auto", "pruned", "daat", "exact"):
        raise ValueError(f"unknown mode {mode!r}")
    msm_of: dict[str, int] = {}
    if min_should_match == "all":
        # required = the query's DISTINCT term count incl. OOV terms
        # (an OOV term makes the equality unsatisfiable → empty, as
        # Lucene AND); query-set-sized collect
        if qterms is not None:
            # qtf=0 rows are MUST_NOT markers and boost=0 terms are
            # defined ABSENT (query.py applies the same rule) — neither
            # is a requirable match
            _qt_for_m = qterms.filter(F.col("qtf") > 0)
            if "boost" in qterms.columns:
                _qt_for_m = _qt_for_m.filter(
                    F.coalesce(F.col("boost"), F.lit(1.0)) != 0
                )
            _qt_for_m = _qt_for_m.select("qid", "term")
        else:
            _qt_for_m = query_terms(queries, qid_col, query_col)
        msm_of = {
            r["qid"]: int(r["m"])
            for r in _qt_for_m.groupBy("qid")
            .agg(F.count("*").alias("m"))
            .collect()
        }
        mode = "conjunctive"
    elif min_should_match:
        if int(min_should_match) < 0:
            raise ValueError("min_should_match must be >= 0 or 'all'")
        mode = "conjunctive"
    if (
        dead_arr is not None or dead_bc is not None or must_not is not None
    ) and mode == "daat":
        # the classic per-pivot cursor has no mask hook; the vectorized
        # pruned kernel is mask-aware and at least as fast
        mode = "pruned"
    if doc_layout and mode == "daat":
        # the DAAT cursor assumes per-term blocks are docid-disjoint; in the
        # doc layout a task may hold several buckets with overlapping ranges
        raise ValueError("mode='daat' requires the term-bucketed layout")

    def score_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # resolve the mask once per task: broadcast value for big sets,
        # closure-captured tiny array otherwise
        base_dead = dead_bc.value if dead_bc is not None else dead_arr
        per_q: dict[str, dict] = {}
        for batch in batches:
            qids = batch.column("qid").to_pylist()
            terms = batch.column("term").to_pylist()
            ws = batch.column("w").to_pylist()
            firsts = batch.column("docid_first").to_pylist()
            lasts = batch.column("docid_last").to_pylist()
            ubs = batch.column("max_tfn").to_pylist()
            docs = batch.column("docs").to_pylist()
            tfs = batch.column("tfs").to_pylist()
            dls = batch.column("dls").to_pylist()
            for i, q in enumerate(qids):
                tb = per_q.setdefault(q, {})
                ent = tb.setdefault(terms[i], [ws[i], [], [], [], []])
                ent[1].append(firsts[i])
                ent[2].append(lasts[i])
                ent[3].append(ubs[i])
                ent[4].append((firsts[i], docs[i], tfs[i], dls[i], k1, b, avgdl))
        rows = []
        for q, tb in per_q.items():
            packed = {
                t: (
                    e[0],
                    np.asarray(e[1], dtype=np.int64),
                    np.asarray(e[2], dtype=np.int64),
                    np.asarray(e[3], dtype=np.float64),
                    e[4],
                )
                for t, e in tb.items()
            }
            # MUST_NOT streams (w == 0.0 — see the qtf=0 marker contract):
            # decode to a per-query drop set BEFORE scoring so prohibited
            # docs cease to exist for θ bootstrap, bounds, and match counts
            dead_q = base_dead
            neg_terms = [t for t, e in packed.items() if e[0] == 0.0]
            if neg_terms:
                dead_q = _neg_drop_set(
                    [packed.pop(t)[4] for t in neg_terms], base_dead
                )
            if mode == "conjunctive":
                m_req = (
                    msm_of.get(q, 0)
                    if msm_of
                    else -int(min_should_match)
                )
                rows.extend(
                    _conjunctive_query(q, packed, kk, m_req, dead_q)
                )
            elif mode == "daat":
                rows.extend(_wand_query(q, packed, kk))
            else:
                fn = {
                    "auto": _auto_query,
                    "pruned": _pruned_query,
                    "exact": _exact_query,
                }[mode]
                rows.extend(fn(q, packed, kk, dead_q))
        if rows:
            cols = list(zip(*rows))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], pa.string()),
                    pa.array(cols[1], pa.int64()),
                    pa.array(cols[2], pa.float64()),
                    pa.array(cols[3], pa.int32()),
                ],
                schema=_RESULT_PA,
            )

    out = cand.select(
        "qid", "term", "w", "docid_first", "docid_last", "max_tfn",
        "docs", "tfs", "dls",
    ).mapInArrow(score_partition, RESULT_DDL)
    if doc_layout:
        # per-task results are LOCAL top-k (exact for the task's doc subset);
        # the global top-k is a tiny window over ≤ n_part·k rows per query
        from pyspark.sql.window import Window

        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
        out = (
            out.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= kk)
            .select("qid", "docid", "score", "rank")
        )
    return out
