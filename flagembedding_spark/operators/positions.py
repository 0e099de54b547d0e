"""Positional postings + exact phrase matching.

The reference's Anserini index is built with ``-storePositions
-storeDocvectors`` (research/llm_embedder/src/retrieval/modeling_bm25.py:
102-107) — BM25 never reads them, but phrase/proximity queries do. This is
that surface, Spark-native:

- positional_postings: (docid, term, tf, positions) via posexplode +
  groupBy — ONE shuffle keyed like the tf aggregation, positions kept as a
  sorted int array (the columnar docvector/positions analog; at the segment
  layer these would varint-encode next to tfs).
- phrase_occurrences: exact adjacent-phrase matching by positional-list
  intersection — start positions of the phrase are
  pos(t0) ∩ (pos(t1)−1) ∩ … ∩ (pos(t_{m−1})−(m−1)), computed with
  array_intersect/transform (JVM expressions), joins only the phrase's own
  m posting lists (broadcast-sized per phrase at any corpus scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flagembedding_spark.functions.tokenize import whitespace_tokens


def positional_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (docid, term, tf, positions array<long> ascending, 0-based).
    Positions are long so the cross-engine value hash matches DuckDB's
    BIGINT lists element-type-exactly."""
    toks = whitespace_tokens(text_col)
    return (
        df.select(
            F.col(id_col).alias("docid"),
            F.posexplode(toks).alias("pos", "term"),
        )
        .groupBy("docid", "term")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.sort_array(F.collect_list(F.col("pos").cast("long"))).alias(
                "positions"
            ),
        )
    )


def positional_postings_full(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Segment-ready positional postings: (term, docid, tf, dl, positions).
    Same ONE shuffle as the tf aggregation — dl (unfiltered token count)
    rides along as a grouping key it is functionally dependent on. Feed to
    segments.build_segments(..., store_positions=True)."""
    toks = whitespace_tokens(text_col)
    return (
        df.select(
            F.col(id_col).alias("docid"),
            F.size(toks).cast("long").alias("dl"),
            F.posexplode(toks).alias("pos", "term"),
        )
        .groupBy("docid", "term", "dl")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.sort_array(F.collect_list(F.col("pos").cast("long"))).alias(
                "positions"
            ),
        )
        .select("term", "docid", "tf", "dl", "positions")
    )


# positions-per-doc bound for the packed (doc, start) intersection key.
# Raw docids do NOT fit: lineage ids are chunk·2^40 + i, and id·2^22
# overflows int64 — so every kernel first remaps the query's touched docids
# to DENSE indices (np.unique + searchsorted) and packs those instead;
# dense-index space is bounded by the query terms' posting count.
_POS_KEY = 1 << 22


def check_position_bound(pflat):
    """Guard the 22-bit position field of the packed (dense_doc, position)
    intersection key: a document longer than 2^22 (~4.19M) tokens would
    silently collide into the next dense docid and corrupt phrase/proximity
    results (ADVICE r03). Vectorized O(n) max check; raises instead of
    corrupting. Split oversized documents upstream (the reference corpus
    shards documents far below this bound)."""
    if pflat.size and int(pflat.max()) >= _POS_KEY:
        raise ValueError(
            f"position {int(pflat.max())} >= 2^22: document too long for "
            "the packed phrase/proximity key — split oversized documents "
            "before indexing with store_positions"
        )
    return pflat


PHRASE_RESULT_DDL = "qid string, docid long, n_occ long"


def phrase_match_segments(
    seg,
    phrases: list[tuple[str, str]],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact adjacent-phrase matching THROUGH the compressed segment store
    (reads varint position streams; never re-derives positions from the
    corpus) → (qid, docid, n_occ). The Anserini index answers phrase
    queries from its own -storePositions postings
    (modeling_bm25.py:102-107); this is that read path, Spark-native.

    Plan mirrors wand_topk: literal IN(term) pushed into the block scan +
    bucket partition pruning (term layout), broadcast the tiny
    (qid, idx, m, term) phrase table, repartition by qid so one task holds
    one query's blocks, then a vectorized kernel intersects per-term
    (docid, pos−idx) key sets — start positions of the phrase are the keys
    surviving all m intersections."""
    import numpy as np
    import pyarrow as pa

    from flagembedding_spark.operators.segments import (
        decode_blocks_batch,
        decode_positions,
    )

    if not seg.has_positions:
        raise ValueError(
            "segment index was built without positions "
            "(store_positions=True required for phrase queries)"
        )
    spark = seg.blocks.sparkSession
    qt_rows = []
    for qid, phrase in phrases:
        terms = phrase.split(" ")
        if not terms or terms == [""]:
            raise ValueError(f"empty phrase for qid {qid!r}")
        for i, t in enumerate(terms):
            qt_rows.append((qid, i, len(terms), t))
    qt = spark.createDataFrame(
        qt_rows, "qid string, idx int, m int, term string"
    )
    all_terms = sorted({r[3] for r in qt_rows})
    blocks = seg.blocks.filter(F.col("term").isin(all_terms))
    if getattr(seg, "layout", "term") == "term" and "bucket" in blocks.columns:
        buckets = sorted(
            {
                r["b"]
                for r in spark.createDataFrame([(t,) for t in all_terms], ["term"])
                .select(
                    F.pmod(F.xxhash64("term"), F.lit(seg.config.term_buckets))
                    .cast("int")
                    .alias("b")
                )
                .collect()
            }
        )
        blocks = blocks.filter(F.col("bucket").isin(buckets))
    cand = blocks.join(F.broadcast(qt), "term")
    n_part = num_partitions or min(
        max(spark.sparkContext.defaultParallelism, 4), 64
    )
    cand = cand.repartition(n_part, "qid")

    out_pa = pa.schema(
        [
            pa.field("qid", pa.string()),
            pa.field("docid", pa.int64()),
            pa.field("n_occ", pa.int64()),
        ]
    )

    def match_partition(batches):
        per: dict[str, dict[int, list]] = {}
        m_of: dict[str, int] = {}
        for batch in batches:
            qids = batch.column("qid").to_pylist()
            idxs = batch.column("idx").to_pylist()
            ms = batch.column("m").to_pylist()
            firsts = batch.column("docid_first").to_pylist()
            docs = batch.column("docs").to_pylist()
            tfs = batch.column("tfs").to_pylist()
            dls = batch.column("dls").to_pylist()
            poss = batch.column("poss").to_pylist()
            for i, q in enumerate(qids):
                m_of[q] = ms[i]
                per.setdefault(q, {}).setdefault(idxs[i], []).append(
                    (firsts[i], docs[i], tfs[i], dls[i], poss[i])
                )
        o_q, o_d, o_n = [], [], []
        for q, groups in per.items():
            m = m_of[q]
            if len(groups) < m:
                continue  # some phrase position's term is absent entirely
            decoded = []
            for idx in range(m):
                g = groups[idx]
                d, t, _l = decode_blocks_batch(
                    [x[0] for x in g], [x[1] for x in g],
                    [x[2] for x in g], [x[3] for x in g],
                )
                pflat = check_position_bound(
                    decode_positions(b"".join(x[4] for x in g), t)
                )
                decoded.append((np.repeat(d, t), pflat))
            # dense per-query docid remap: raw ids × 2^22 can overflow int64
            uniq = np.unique(np.concatenate([x[0] for x in decoded]))
            keys = None
            for idx in range(m):
                doc_rep, pflat = decoded[idx]
                dense = np.searchsorted(uniq, doc_rep)
                mask = pflat >= idx
                k = dense[mask] * _POS_KEY + (pflat[mask] - idx)
                keys = (
                    k
                    if keys is None
                    else np.intersect1d(keys, k, assume_unique=True)
                )
                if keys.size == 0:
                    break
            if keys is None or keys.size == 0:
                continue
            ud, counts = np.unique(keys // _POS_KEY, return_counts=True)
            o_q.extend([q] * ud.size)
            o_d.extend(int(uniq[x]) for x in ud)
            o_n.extend(int(c) for c in counts)
        if o_q:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_q, pa.string()),
                    pa.array(o_d, pa.int64()),
                    pa.array(o_n, pa.int64()),
                ],
                schema=out_pa,
            )

    return cand.select(
        "qid", "idx", "m", "docid_first", "docs", "tfs", "dls", "poss"
    ).mapInArrow(match_partition, PHRASE_RESULT_DDL)


def phrase_occurrences(
    positional: DataFrame, phrase: str, qid: str | None = None
) -> DataFrame:
    """→ (docid, n_occ) for docs containing the exact adjacent ``phrase``
    (single-space tokenization, same as the index); n_occ counts every start
    position. With ``qid``, a constant qid column is prepended (for batched
    phrase sets)."""
    terms = phrase.split(" ")
    if not terms:
        raise ValueError("empty phrase")
    acc = None
    for i, t in enumerate(terms):
        side = positional.filter(F.col("term") == t).select(
            "docid",
            F.transform("positions", lambda p: p - F.lit(i)).alias(f"_p{i}"),
        )
        if acc is None:
            acc = side.withColumnRenamed("_p0", "_starts")
        else:
            acc = acc.join(side, "docid").withColumn(
                "_starts", F.array_intersect("_starts", f"_p{i}")
            ).drop(f"_p{i}")
    out = (
        acc.withColumn("n_occ", F.size("_starts").cast("long"))
        .filter(F.col("n_occ") > 0)
        .select("docid", "n_occ")
    )
    if qid is not None:
        out = out.select(F.lit(qid).alias("qid"), "docid", "n_occ")
    return out


def proximity_match_segments(
    seg,
    probes: list[tuple[str, str, str, int]],
    num_partitions: int | None = None,
) -> DataFrame:
    """Proximity matching THROUGH the compressed segment store (Lucene's
    sloppy-phrase-from-index shape): (qid, term_a, term_b, window) probes →
    (qid, docid, n_pairs), identical semantics to proximity_match_batch.
    Same plan as phrase_match_segments: term-IN pushdown + bucket pruning +
    broadcast probe table + per-qid repartition; the kernel counts, for
    each a-posting, the b-positions inside [pos−w, pos+w] with ONE
    searchsorted pass over packed (docid·2²² + pos) keys (windows never
    cross doc boundaries — w ≪ 2²²)."""
    import numpy as np
    import pyarrow as pa

    from flagembedding_spark.operators.segments import (
        decode_blocks_batch,
        decode_positions,
    )

    if not seg.has_positions:
        raise ValueError(
            "segment index was built without positions "
            "(store_positions=True required for proximity queries)"
        )
    spark = seg.blocks.sparkSession
    qt_rows = []
    for qid, a, b, w in probes:
        if w < 0:
            raise ValueError(f"negative window for qid {qid!r}")
        same = int(a == b)
        qt_rows.append((qid, 0, same, w, a))
        if not same:
            qt_rows.append((qid, 1, same, w, b))
    qt = spark.createDataFrame(
        qt_rows, "qid string, role int, same int, w int, term string"
    )
    all_terms = sorted({r[4] for r in qt_rows})
    blocks = seg.blocks.filter(F.col("term").isin(all_terms))
    if getattr(seg, "layout", "term") == "term" and "bucket" in blocks.columns:
        buckets = sorted(
            {
                r["b"]
                for r in spark.createDataFrame([(t,) for t in all_terms], ["term"])
                .select(
                    F.pmod(F.xxhash64("term"), F.lit(seg.config.term_buckets))
                    .cast("int")
                    .alias("b")
                )
                .collect()
            }
        )
        blocks = blocks.filter(F.col("bucket").isin(buckets))
    cand = blocks.join(F.broadcast(qt), "term")
    n_part = num_partitions or min(
        max(spark.sparkContext.defaultParallelism, 4), 64
    )
    cand = cand.repartition(n_part, "qid")

    out_pa = pa.schema(
        [
            pa.field("qid", pa.string()),
            pa.field("docid", pa.int64()),
            pa.field("n_pairs", pa.int64()),
        ]
    )

    def match_partition(batches):
        per: dict[str, dict[int, list]] = {}
        meta: dict[str, tuple[int, int]] = {}  # qid -> (same, w)
        for batch in batches:
            qids = batch.column("qid").to_pylist()
            roles = batch.column("role").to_pylist()
            sames = batch.column("same").to_pylist()
            ws = batch.column("w").to_pylist()
            firsts = batch.column("docid_first").to_pylist()
            docs = batch.column("docs").to_pylist()
            tfs = batch.column("tfs").to_pylist()
            dls = batch.column("dls").to_pylist()
            poss = batch.column("poss").to_pylist()
            for i, q in enumerate(qids):
                meta[q] = (sames[i], ws[i])
                per.setdefault(q, {}).setdefault(roles[i], []).append(
                    (firsts[i], docs[i], tfs[i], dls[i], poss[i])
                )
        o_q, o_d, o_n = [], [], []
        for q, groups in per.items():
            same, w = meta[q]
            need = {0} if same else {0, 1}
            if set(groups) < need:
                continue  # one side's term absent → no pairs

            def decode_role(role):
                g = groups[role]
                d, t, _l = decode_blocks_batch(
                    [x[0] for x in g], [x[1] for x in g],
                    [x[2] for x in g], [x[3] for x in g],
                )
                pflat = check_position_bound(
                    decode_positions(b"".join(x[4] for x in g), t)
                )
                return np.repeat(d, t), pflat

            da_raw, pos_a = decode_role(0)
            db_raw, pos_b = decode_role(0 if same else 1)
            # dense per-query docid remap (raw id × 2^22 overflows int64)
            uniq = np.unique(np.concatenate([da_raw, db_raw]))

            def keyed(doc_raw, pflat):
                dense = np.searchsorted(uniq, doc_raw)
                k = dense * _POS_KEY + pflat
                order = np.argsort(k, kind="stable")
                return k[order], dense[order], doc_raw[order]

            ka, dda, da = keyed(da_raw, pos_a)
            kb, _ddb, _db = keyed(db_raw, pos_b)
            base = dda * _POS_KEY
            # clamp the window at the doc's own key range: pos−w of an
            # early position must not dip into the previous doc's keys
            # (pos+w can't reach the next doc: positions ≪ 2²² − w)
            if same:
                lo = np.searchsorted(kb, ka + 1, side="left")
                hi = np.searchsorted(kb, ka + w, side="right")
            else:
                lo = np.searchsorted(
                    kb, np.maximum(ka - w, base), side="left"
                )
                hi = np.searchsorted(kb, ka + w, side="right")
            n_i = hi - lo
            keep = n_i > 0
            if not keep.any():
                continue
            ud, inv = np.unique(da[keep], return_inverse=True)
            totals = np.bincount(inv, weights=n_i[keep]).astype(np.int64)
            o_q.extend([q] * ud.size)
            o_d.extend(int(x) for x in ud)
            o_n.extend(int(x) for x in totals)
        if o_q:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_q, pa.string()),
                    pa.array(o_d, pa.int64()),
                    pa.array(o_n, pa.int64()),
                ],
                schema=out_pa,
            )

    return cand.select(
        "qid", "role", "same", "w", "docid_first", "docs", "tfs", "dls", "poss"
    ).mapInArrow(match_partition, "qid string, docid long, n_pairs long")


def proximity_occurrences(
    positional: DataFrame,
    term_a: str,
    term_b: str,
    window: int,
    qid: str | None = None,
    ordered: bool = False,
) -> DataFrame:
    """Proximity match: docs where ``term_a`` and ``term_b`` co-occur
    within ``window`` tokens → (docid, n_pairs) counting every
    (pos_a, pos_b) pair with |pos_a − pos_b| ≤ window (the sloppy-phrase /
    'terms near each other' query Lucene answers from its positions; ours
    reads the same positional lists). JVM higher-order functions only —
    O(tf_a·tf_b) per doc, no Python. Identical terms count unordered
    distinct pairs (a<b).

    ``ordered=True`` is the in-order SpanNearQuery form: only pairs where
    ``term_b`` FOLLOWS ``term_a`` count (1 ≤ pos_b − pos_a ≤ window) —
    for identical terms this coincides with the unordered distinct-pair
    rule."""
    same = term_a == term_b
    a = positional.filter(F.col("term") == term_a).select(
        "docid", F.col("positions").alias("pa")
    )
    if same:
        joined = a.withColumn("pb", F.col("pa"))
    else:
        b = positional.filter(F.col("term") == term_b).select(
            "docid", F.col("positions").alias("pb")
        )
        joined = a.join(b, "docid")
    w = F.lit(window)
    if same or ordered:
        count = F.aggregate(
            "pa",
            F.lit(0).cast("long"),
            lambda acc, p: acc
            + F.size(F.filter("pb", lambda q: (q > p) & (q - p <= w))),
        )
    else:
        count = F.aggregate(
            "pa",
            F.lit(0).cast("long"),
            lambda acc, p: acc
            + F.size(
                F.filter("pb", lambda q: F.abs(q - p) <= w)
            ),
        )
    out = (
        joined.withColumn("n_pairs", count.cast("long"))
        .filter(F.col("n_pairs") > 0)
        .select("docid", "n_pairs")
    )
    if qid is not None:
        out = out.select(F.lit(qid).alias("qid"), "docid", "n_pairs")
    return out


def proximity_match_batch(
    positional: DataFrame, probes: list[tuple[str, str, str, int]],
    ordered: bool = False,
) -> DataFrame:
    """Union of proximity_occurrences over (qid, term_a, term_b, window)
    probes → (qid, docid, n_pairs)."""
    outs = [
        proximity_occurrences(positional, a, b, w, qid, ordered=ordered)
        for qid, a, b, w in probes
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def phrase_match_batch(
    positional: DataFrame, phrases: list[tuple[str, str]]
) -> DataFrame:
    """Union of phrase_occurrences over (qid, phrase) pairs →
    (qid, docid, n_occ)."""
    outs = [phrase_occurrences(positional, p, qid) for qid, p in phrases]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
