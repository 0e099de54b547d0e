"""Segment index: varint codec, block roundtrip, salting invariance, merge
equivalence, and WAND-vs-exact / WAND-vs-DataFrame parity."""

import math

import numpy as np
import pytest

from flagembedding_spark.config import BM25Config
from flagembedding_spark.operators.index_build import build_index
from flagembedding_spark.operators.query import bm25_topk
from flagembedding_spark.operators.segments import (
    build_segments,
    decode_block,
    merge_segments,
    varint_decode,
    varint_encode,
)
from flagembedding_spark.operators.wand import wand_topk


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

def test_varint_roundtrip_edges():
    vals = np.array(
        [0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**32, 2**53, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_roundtrip_random():
    rng = np.random.default_rng(7)
    for scale in (100, 10_000, 2**40):
        vals = rng.integers(0, scale, size=5000, dtype=np.uint64)
        assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_compression_ratio():
    # typical small gaps should take ~1 byte each
    gaps = np.full(1000, 3, dtype=np.uint64)
    assert len(varint_encode(gaps)) == 1000


# ---------------------------------------------------------------------------
# segments
# ---------------------------------------------------------------------------

CFG = BM25Config(k1=1.2, b=0.75, use_avgdl=True, block_size=16,
                 salt_threshold_df=50, max_salt=4, term_buckets=8)


@pytest.fixture(scope="module")
def index(tiny_corpus):
    return build_index(tiny_corpus, CFG)


@pytest.fixture(scope="module")
def merged(index):
    return merge_segments(build_segments(index, num_partitions=6))


def _postings_from_blocks(seg):
    out = {}
    for r in seg.blocks.collect():
        d, t, l_ = decode_block(r["docid_first"], bytes(r["docs"]),
                                bytes(r["tfs"]), bytes(r["dls"]))
        out.setdefault(r["term"], []).append(
            (r["block_ord"], d.tolist(), t.tolist(), l_.tolist())
        )
    return out


def test_merged_blocks_reconstruct_postings(index, merged):
    want = {}
    for r in index.postings.collect():
        want.setdefault(r["term"], []).append((r["docid"], r["tf"], r["dl"]))
    for term in want:
        want[term].sort()

    got = {}
    by_term = _postings_from_blocks(merged)
    for term, blocks in by_term.items():
        blocks.sort()
        rows = []
        for _, d, t, l_ in blocks:
            rows.extend(zip(d, t, l_))
        got[term] = rows
    assert got == want


def test_merged_blocks_sorted_disjoint(merged):
    by_term = {}
    for r in merged.blocks.collect():
        by_term.setdefault(r["term"], []).append(
            (r["block_ord"], r["docid_first"], r["docid_last"], r["n"])
        )
    for term, blocks in by_term.items():
        blocks.sort()
        # block_ord contiguous from 0
        assert [b[0] for b in blocks] == list(range(len(blocks)))
        for i in range(1, len(blocks)):
            assert blocks[i][1] > blocks[i - 1][2], term  # disjoint, ordered
        for _, f, l_, n in blocks:
            assert f <= l_ and 1 <= n <= CFG.block_size


def test_block_max_is_upper_bound(merged):
    k1, b = CFG.k1, CFG.b
    avgdl = merged.avgdl_effective
    for r in merged.blocks.collect():
        d, t, l_ = decode_block(r["docid_first"], bytes(r["docs"]),
                                bytes(r["tfs"]), bytes(r["dls"]))
        tfn = t.astype(float) / (t + k1 * (1 - b + b * l_.astype(float) / avgdl))
        assert tfn.max() <= r["max_tfn"] + 1e-12


def test_salting_invariance(index):
    """salt=1 (threshold huge) vs aggressive salting → identical final index."""
    cfg_nosalt = BM25Config(k1=1.2, b=0.75, block_size=16,
                            salt_threshold_df=10**9, max_salt=1, term_buckets=8)
    # same underlying index, different salting configs at segment build time
    import dataclasses

    seg_salted = merge_segments(build_segments(index, num_partitions=6))
    unsalted_index = dataclasses.replace(index, config=cfg_nosalt)
    seg_plain = merge_segments(build_segments(unsalted_index, num_partitions=3))

    a = _postings_from_blocks(seg_salted)
    b_ = _postings_from_blocks(seg_plain)
    canon = lambda m: {  # noqa: E731
        t: sorted((o, tuple(d), tuple(x), tuple(l2)) for o, d, x, l2 in v)
        for t, v in m.items()
    }
    assert canon(a) == canon(b_)


# ---------------------------------------------------------------------------
# WAND query path
# ---------------------------------------------------------------------------

def _canon(rows, ndigits=9):
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append((round(r["score"], ndigits), r["docid"]))
    return {q: sorted(v, key=lambda x: (-x[0], x[1])) for q, v in by_qid.items()}


@pytest.mark.parametrize("mode", ["pruned", "daat", "auto"])
def test_wand_equals_exact(merged, tiny_queries, mode):
    w = wand_topk(merged, tiny_queries, k=10, use_wand=mode).collect()
    e = wand_topk(merged, tiny_queries, k=10, use_wand=False).collect()
    cw, ce = _canon(w), _canon(e)
    assert set(cw) == set(ce)
    for q in ce:
        assert len(cw[q]) == len(ce[q]), q
        for (ws, wd), (es, ed) in zip(cw[q], ce[q]):
            assert math.isclose(ws, es, rel_tol=1e-9, abs_tol=1e-12), q
            # docids must match except within float-tied levels
        lw = {}
        le = {}
        for s, d in cw[q]:
            lw.setdefault(round(s, 6), set()).add(d)
        for s, d in ce[q]:
            le.setdefault(round(s, 6), set()).add(d)
        assert lw == le, q


def test_wand_equals_dataframe_engine(index, merged, tiny_queries):
    seg_rows = wand_topk(merged, tiny_queries, k=10, use_wand=True).collect()
    df_rows = bm25_topk(index, tiny_queries, k=10).collect()
    cs, cd = _canon(seg_rows, 6), _canon(df_rows, 6)
    assert cs == cd


def test_wand_oov_query(merged, spark):
    q = spark.createDataFrame([("qx", "zz_never_seen zz_nope")], ["query_id", "query"])
    assert wand_topk(merged, q, k=10).count() == 0


def test_segment_persistence_roundtrip(spark, merged, tiny_queries, tmp_path):
    """save_segments → load_segments → identical query results; the persisted
    layout is partitioned by bucket (partition pruning surface)."""
    import os

    from flagembedding_spark.operators.segments import load_segments, save_segments

    root = str(tmp_path / "seg")
    save_segments(merged, root)
    # bucket-partitioned layout on disk
    assert any(d.startswith("bucket=") for d in os.listdir(f"{root}/blocks"))

    loaded = load_segments(spark, root)
    assert loaded.stats.n_docs == merged.stats.n_docs
    assert loaded.config.block_size == merged.config.block_size
    a = _canon(wand_topk(loaded, tiny_queries, k=10).collect(), 6)
    b = _canon(wand_topk(merged, tiny_queries, k=10).collect(), 6)
    assert a == b


def test_wand_all_modes_identical(merged, tiny_queries):
    outs = [
        _canon(wand_topk(merged, tiny_queries, k=10, use_wand=m).collect(), 6)
        for m in ("pruned", "daat", "exact", "auto")
    ]
    assert outs[0] == outs[1] == outs[2] == outs[3]


def test_wand_modes_identical_on_skewed_corpus(spark):
    """Needle-in-haystack fixture (rare high-idf terms + stopword-like head):
    every mode — including auto's per-query picks — returns identical top-k."""
    from flagembedding_spark.schemas import (
        distributed_synth_corpus_skewed,
        skewed_queries,
    )

    corpus = distributed_synth_corpus_skewed(spark, 3000, partitions=8)
    cfg = BM25Config(block_size=64, term_buckets=8)
    idx = build_index(corpus, cfg)
    seg = merge_segments(build_segments(idx))
    seg.blocks = seg.blocks.cache()
    qs = skewed_queries(spark)
    outs = {
        m: _canon(wand_topk(seg, qs, k=10, use_wand=m).collect(), 6)
        for m in ("pruned", "exact", "auto")
    }
    assert outs["pruned"] == outs["exact"] == outs["auto"]
    # the needles really are planted and retrievable
    assert any(q.startswith("sk") for q in outs["exact"])
    assert len(outs["exact"]) >= 9


def test_wand_rounded_boundary_margin(spark):
    """The wand oracle entry fetches k+50 unrounded then re-ranks on rounded
    scores; that is exact unless >50 docs round into a single 4-decimal tie
    straddling the k boundary. Assert the driver fixture's widest boundary
    tie group is far inside the margin."""
    import os

    from flagembedding_spark.entries import TOPK, _queries_df, build_doc_index

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    idx = build_doc_index(spark, sf_dir)
    deep = bm25_topk(idx, _queries_df(spark), k=10_000, round_scores=4)
    rows = deep.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["score"]))
    for qid, rs in by_q.items():
        rs.sort()
        if len(rs) <= TOPK:
            continue
        boundary = rs[TOPK - 1][1]
        tie = sum(1 for _, s in rs if s == boundary)
        assert tie <= 50, (qid, boundary, tie)


def test_hierarchical_merge_byte_identical(index):
    """Two-level merge (subset merges, then merge-of-merges) must produce
    byte-identical blocks to the single-level merge — the kernel re-sorts
    each term's full posting set at the final level, so composition order
    can't leak into the output."""
    from flagembedding_spark.operators.segments import merge_segments_hierarchical

    seg = build_segments(index)

    def canon(s):
        return sorted(
            (
                r["bucket"], r["term"], r["docid_first"], r["docid_last"],
                round(r["max_tfn"], 12),
                bytes(r["docs"]), bytes(r["tfs"]), bytes(r["dls"]),
            )
            for r in s.blocks.collect()
        )

    single = canon(merge_segments(seg))
    two_level = canon(merge_segments_hierarchical(seg, groups=3))
    assert two_level == single
    assert len(single) > 0


def test_serving_reader_matches_wand(spark, merged, tiny_queries, tmp_path):
    """The Spark-free serving reader must be rank-identical to wand_topk on
    the same persisted store (same kernels, pyarrow-pruned I/O)."""
    from flagembedding_spark.operators.segments import save_segments
    from flagembedding_spark.serving import SegmentReader

    root = str(tmp_path / "seg")
    save_segments(merged, root)
    reader = SegmentReader(root)

    want = _canon(wand_topk(merged, tiny_queries, k=10).collect(), 6)
    for q in tiny_queries.collect():
        got = [
            (round(s, 6), d)
            for d, s, _ in reader.topk(q["query"], k=10)
        ]
        got.sort(key=lambda x: (-x[0], x[1]))
        assert got == want.get(q["query_id"], []), q["query_id"]
    # OOV query → empty, no error
    assert reader.topk("zz_never_seen zz_nope", k=10) == []


def test_doc_partitioned_layout_matches_term_layout(index, merged, tiny_queries):
    """The docid-partitioned layout (hot-query parallelism) must return
    identical top-k to the term-bucketed layout and the DataFrame engine."""
    from flagembedding_spark.operators.segments import build_doc_partitioned_segments

    dseg = build_doc_partitioned_segments(index, n_parts=5)
    dseg.blocks = dseg.blocks.cache()
    for mode in ("exact", "pruned", "auto"):
        a = _canon(wand_topk(dseg, tiny_queries, k=10, use_wand=mode).collect(), 6)
        b = _canon(wand_topk(merged, tiny_queries, k=10, use_wand="exact").collect(), 6)
        assert a == b, mode
    c = _canon(bm25_topk(index, tiny_queries, k=10).collect(), 6)
    assert _canon(wand_topk(dseg, tiny_queries, k=10).collect(), 6) == c
    with pytest.raises(ValueError, match="term-bucketed"):
        wand_topk(dseg, tiny_queries, k=10, use_wand="daat").collect()


def test_doc_partitioned_blocks_doc_complete(index):
    """Every posting of a doc lives in exactly one bucket (the exactness
    precondition for partition-local top-k)."""
    from flagembedding_spark.operators.segments import build_doc_partitioned_segments

    dseg = build_doc_partitioned_segments(index, n_parts=5)
    seen = {}
    for r in dseg.blocks.collect():
        d, _, _ = decode_block(r["docid_first"], bytes(r["docs"]),
                               bytes(r["tfs"]), bytes(r["dls"]))
        for doc in d.tolist():
            assert seen.setdefault(doc, r["bucket"]) == r["bucket"], doc


def test_doc_layout_persistence_roundtrip(spark, index, tiny_queries, tmp_path):
    """Saved doc-layout stores reload with their layout (term-hash bucket
    pruning must NOT apply to them) and query identically; the serving
    reader refuses them."""
    from flagembedding_spark.operators.segments import (
        build_doc_partitioned_segments,
        load_segments,
        save_segments,
    )
    from flagembedding_spark.serving import SegmentReader

    dseg = build_doc_partitioned_segments(index, n_parts=5)
    root = str(tmp_path / "dseg")
    save_segments(dseg, root)
    loaded = load_segments(spark, root)
    assert loaded.layout == "doc"
    a = _canon(wand_topk(loaded, tiny_queries, k=10).collect(), 6)
    b = _canon(wand_topk(dseg, tiny_queries, k=10).collect(), 6)
    assert a == b
    with pytest.raises(ValueError, match="term-bucketed layout"):
        SegmentReader(root)


def test_decode_blocks_batch_equivalence():
    """Batched varint decode == per-block decode on random block sets,
    including single-posting blocks and out-of-order block lists."""
    from flagembedding_spark.operators.segments import (
        _emit_term_blocks,
        decode_blocks_batch,
    )

    rng = np.random.default_rng(11)
    rows = []
    for _ in range(50):
        n = int(rng.integers(1, 40))
        d = np.cumsum(rng.integers(1, 1000, size=n)).astype(np.int64) + int(
            rng.integers(0, 2**40)
        )
        t = rng.integers(1, 90, size=n).astype(np.int64)
        l_ = rng.integers(n, 4000, size=n).astype(np.int64)
        out = []
        _emit_term_blocks(0, "t", d, t, l_, 16, 1.2, 0.75, 100.0, out)
        for r in out:
            rows.append((r[4], r[7], r[8], r[9]))
    rng.shuffle(rows)

    bd, bt, bl = decode_blocks_batch(
        [r[0] for r in rows], [r[1] for r in rows],
        [r[2] for r in rows], [r[3] for r in rows],
    )
    ed, et, el = [], [], []
    for f, docs, tfs, dls in rows:
        d2, t2, l2 = decode_block(f, docs, tfs, dls)
        ed.append(d2); et.append(t2); el.append(l2)
    assert np.array_equal(bd, np.concatenate(ed))
    assert np.array_equal(bt, np.concatenate(et))
    assert np.array_equal(bl, np.concatenate(el))
    assert np.array_equal(
        *(x[0] for x in [decode_blocks_batch([], [], [], [])]),
        np.empty(0, dtype=np.int64),
    )


def _clustered_rare_corpus(spark, n_docs=2000, lo=600, hi=1000):
    """Hot tokens everywhere; 'rare_x' planted only in docids [lo, hi) —
    the CLUSTERED-rare shape (one repo's identifier) where two-phase block
    pruning pays: the essential term's block ranges are narrow, so most hot
    blocks can't overlap them. 400 planted docs / block_size 64 ≈ 7 blocks —
    enough for the metadata θ bound (needs ≥ k blocks on the rare term)."""
    stop = "def self ( ) = { } : if for class return"
    rows = [
        (
            i,
            stop + (" rare_x rare_x" if lo <= i < hi else "") + f" tok{i % 97}",
        )
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_two_phase_identity_and_shuffle_reduction(spark):
    """two_phase=True returns IDENTICAL top-k while shipping strictly fewer
    blocks through the per-query shuffle on the clustered-rare fixture."""
    from flagembedding_spark.operators.wand import candidate_block_plan

    corpus = _clustered_rare_corpus(spark)
    cfg = BM25Config(block_size=64, term_buckets=8)
    idx = build_index(
        corpus, cfg, content_col="text", docid_long="doc_id", method="sql"
    )
    seg = merge_segments(build_segments(idx))
    seg.blocks = seg.blocks.cache()
    qs = spark.createDataFrame(
        [
            ("tq0", "rare_x def self ( ) = { } : if for class return"),
            ("tq_hot", "def return class"),   # nothing prunable — control
            ("tq_oov", "zz_nope qq_nada"),    # empty — control
        ],
        "query_id string, query string",
    )
    base = _canon(wand_topk(seg, qs, k=5, use_wand="exact").collect(), 6)
    two = _canon(
        wand_topk(seg, qs, k=5, use_wand="auto", two_phase=True).collect(), 6
    )
    assert two == base
    n_all = candidate_block_plan(seg, qs, k=5)[0].count()
    n_two = candidate_block_plan(seg, qs, k=5, two_phase=True)[0].count()
    # tq0's hot-term blocks outside the rare cluster must be gone
    assert n_two < n_all * 0.7, (n_two, n_all)


def test_two_phase_identity_on_scattered_needles(spark):
    """Scattered needles (df < k): θ bootstraps to 0, nothing is provably
    prunable, and the plan must stay byte-for-byte CORRECT (ranks 4-10 come
    from stopword-only docs — pruning stopwords here would be a bug)."""
    from flagembedding_spark.schemas import (
        distributed_synth_corpus_skewed,
        skewed_queries,
    )

    corpus = distributed_synth_corpus_skewed(spark, 3000, partitions=8)
    cfg = BM25Config(block_size=64, term_buckets=8)
    idx = build_index(corpus, cfg)
    seg = merge_segments(build_segments(idx))
    seg.blocks = seg.blocks.cache()
    qs = skewed_queries(spark)
    base = _canon(wand_topk(seg, qs, k=10, use_wand="exact").collect(), 6)
    two = _canon(
        wand_topk(seg, qs, k=10, use_wand="auto", two_phase=True).collect(), 6
    )
    assert two == base


def test_two_phase_identity_small_corpus(index, merged, tiny_queries):
    """On the homogeneous tiny corpus two-phase may prune nothing — but must
    stay exactly identical (incl. all-OOV and single-term queries)."""
    base = _canon(wand_topk(merged, tiny_queries, k=10, use_wand="exact").collect(), 6)
    two = _canon(
        wand_topk(merged, tiny_queries, k=10, use_wand="auto", two_phase=True).collect(),
        6,
    )
    assert two == base


def test_two_phase_identity_doc_layout(index, tiny_queries):
    from flagembedding_spark.operators.segments import (
        build_doc_partitioned_segments,
    )

    dseg = build_doc_partitioned_segments(index, n_parts=4)
    base = _canon(wand_topk(dseg, tiny_queries, k=10, use_wand="exact").collect(), 6)
    two = _canon(
        wand_topk(dseg, tiny_queries, k=10, use_wand="auto", two_phase=True).collect(),
        6,
    )
    assert two == base


def test_merge_stores_matches_single_shot(spark, tmp_path):
    """Two generations with disjoint docid spaces merged at the BLOCK level
    == the single-shot index over the full corpus: global df/idf/avgdl are
    recomputed, so scores match to rounding and ranks are identical —
    including terms that span both generations."""
    from flagembedding_spark.operators.segments import (
        merge_stores,
        save_segments,
    )
    from flagembedding_spark.schemas import synth_corpus

    from pyspark.sql import functions as F

    corpus = synth_corpus(spark, 300, seed=21).cache()
    cfg = BM25Config(block_size=16, term_buckets=8)

    full = merge_segments(build_segments(build_index(corpus, cfg)))

    # generations: first 150 / last 150 rows by a deterministic key split,
    # ids preserved by building each half with the SAME docid assignment
    # (assign over the full corpus, then filter)
    idx_full = build_index(corpus, cfg)
    ids = idx_full.doc_stats.select("docid", "docid_str")
    import dataclasses

    halves = []
    for pred in (F.col("docid") < 150, F.col("docid") >= 150):
        keep = ids.filter(pred)
        post = idx_full.postings.join(keep.select("docid"), "docid")
        stats_row = (
            idx_full.doc_stats.join(keep.select("docid"), "docid")
            .agg(F.count("*").alias("n"), F.avg("dl").alias("a"))
            .collect()[0]
        )
        from flagembedding_spark.operators.index_build import CorpusStats

        nn = float(stats_row["n"])
        dic = (
            post.groupBy("term").agg(F.count("*").alias("df"))
            .withColumn(
                "idf",
                F.log((F.lit(nn) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
            )
        )
        half_idx = dataclasses.replace(
            idx_full,
            postings=post,
            dictionary=dic,
            stats=CorpusStats(int(stats_row["n"]), float(stats_row["a"])),
        )
        halves.append(merge_segments(build_segments(half_idx)))

    r1, r2, rout = (str(tmp_path / x) for x in ("g1", "g2", "merged"))
    save_segments(halves[0], r1)
    save_segments(halves[1], r2)
    merged = merge_stores(spark, [r1, r2], rout)

    assert merged.stats.n_docs == full.stats.n_docs
    assert abs(merged.stats.avgdl - full.stats.avgdl) < 1e-9

    from flagembedding_spark.schemas import synth_queries

    qs = synth_queries(spark, 30, seed=5)
    a = _canon(wand_topk(merged, qs, k=10, use_wand="auto").collect(), 6)
    b = _canon(wand_topk(full, qs, k=10, use_wand="auto").collect(), 6)
    assert a == b


def test_merge_stores_rejects_overlap_and_config_mismatch(spark, tmp_path):
    from flagembedding_spark.operators.segments import (
        merge_stores,
        save_segments,
    )
    from flagembedding_spark.schemas import synth_corpus

    cfg = BM25Config(block_size=16, term_buckets=8)
    seg = merge_segments(build_segments(build_index(synth_corpus(spark, 60), cfg)))
    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    save_segments(seg, r1)
    save_segments(seg, r2)  # identical store → overlapping docids
    with pytest.raises(ValueError, match="overlap"):
        merge_stores(spark, [r1, r2])

    other = merge_segments(
        build_segments(
            build_index(synth_corpus(spark, 60), BM25Config(k1=0.9, term_buckets=8, block_size=16))
        )
    )
    r3 = str(tmp_path / "c")
    save_segments(other, r3)
    with pytest.raises(ValueError, match="config"):
        merge_stores(spark, [r1, r3], check_disjoint=False)


def test_merge_stores_doc_target_and_doc_generation(spark, tmp_path):
    """Cross-LAYOUT merge: one term-layout and one doc-layout generation
    decode back to postings (no re-tokenize) and rebuild as either target
    layout — query results equal the single-shot build over everything."""
    import dataclasses

    from pyspark.sql import functions as F

    from flagembedding_spark.operators.index_build import CorpusStats
    from flagembedding_spark.operators.segments import (
        build_doc_partitioned_segments,
        merge_stores,
        postings_from_segments,
        save_segments,
    )
    from flagembedding_spark.schemas import synth_corpus, synth_queries

    corpus = synth_corpus(spark, 200, seed=31).cache()
    cfg = BM25Config(block_size=16, term_buckets=8)
    idx_full = build_index(corpus, cfg)

    halves = []
    for pred in (F.col("docid") < 100, F.col("docid") >= 100):
        keep = idx_full.doc_stats.filter(pred).select("docid")
        post = idx_full.postings.join(keep, "docid")
        srow = (
            idx_full.doc_stats.join(keep, "docid")
            .agg(F.count("*").alias("n"), F.avg("dl").alias("a"))
            .collect()[0]
        )
        nn = float(srow["n"])
        dic = (
            post.groupBy("term").agg(F.count("*").alias("df"))
            .withColumn(
                "idf",
                F.log((F.lit(nn) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
            )
        )
        halves.append(
            dataclasses.replace(
                idx_full, postings=post, dictionary=dic,
                stats=CorpusStats(int(srow["n"]), float(srow["a"])),
            )
        )

    r1, r2 = str(tmp_path / "t1"), str(tmp_path / "d2")
    save_segments(merge_segments(build_segments(halves[0])), r1)       # term
    save_segments(build_doc_partitioned_segments(halves[1], n_parts=4), r2)  # doc

    qs = synth_queries(spark, 20, seed=9)
    want = _canon(
        wand_topk(merge_segments(build_segments(idx_full)), qs, k=10).collect(), 6
    )
    for layout in ("term", "doc"):
        merged = merge_stores(
            spark, [r1, r2], str(tmp_path / f"m_{layout}"),
            target_layout=layout,
        )
        assert getattr(merged, "layout", "term") == layout
        got = _canon(wand_topk(merged, qs, k=10).collect(), 6)
        assert got == want, layout

    # postings decode roundtrip: store → postings == the half's own postings
    dec = postings_from_segments(
        merge_segments(build_segments(halves[0]))
    )
    a = sorted(map(tuple, dec.collect()))
    b = sorted(
        map(tuple, halves[0].postings.select("term", "docid", "tf", "dl").collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# round 4: bounded two-phase state, auto-engage, cache slot, empty-gen merge
# ---------------------------------------------------------------------------

def test_two_phase_bounded_state_many_blocks_per_term(spark):
    """Essential (rare) term with MORE BLOCKS THAN THE RANGE CAP: the r03
    implementation skipped pruning whenever an essential term's block count
    exceeded the 512-range cap (and built unbounded collect_list state to
    find out). The cell-coarsened phase 1 keeps state bounded by geometry
    and prunes this shape: 625 rare blocks collapse to ~20 cells ≤ cap.
    Top-k must stay identical AND pruning must actually engage."""
    from flagembedding_spark.operators.wand import candidate_block_plan

    n_docs, lo, hi = 12_000, 3_000, 8_000
    stop = "def self ( ) = { } : if for class return"
    rows = [
        (i, stop + (" rare_x rare_x" if lo <= i < hi else "") + f" tok{i % 7}")
        for i in range(n_docs)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = BM25Config(block_size=8, term_buckets=8)  # 5000/8 = 625 rare blocks
    idx = build_index(
        corpus, cfg, content_col="text", docid_long="doc_id", method="sql"
    )
    seg = merge_segments(build_segments(idx))
    seg.blocks = seg.blocks.cache()
    qs = spark.createDataFrame(
        [("bq0", "rare_x " + stop)], "query_id string, query string"
    )
    base = _canon(wand_topk(seg, qs, k=5, use_wand="exact").collect(), 6)
    two = _canon(
        wand_topk(seg, qs, k=5, use_wand="auto", two_phase=True).collect(), 6
    )
    assert two == base
    n_all = candidate_block_plan(seg, qs, k=5)[0].count()
    n_two = candidate_block_plan(seg, qs, k=5, two_phase=True)[0].count()
    assert n_two < n_all * 0.8, (n_two, n_all)


def test_two_phase_cache_single_slot(spark):
    """Repeated two-phase calls must hold at most ONE persisted candidate
    set (ADVICE r03: unbounded cache accumulation), and
    release_two_phase_cache frees it."""
    from flagembedding_spark.operators import wand as wand_mod

    corpus = _clustered_rare_corpus(spark)
    cfg = BM25Config(block_size=64, term_buckets=8)
    idx = build_index(
        corpus, cfg, content_col="text", docid_long="doc_id", method="sql"
    )
    seg = merge_segments(build_segments(idx))
    seg.blocks = seg.blocks.cache()
    qs = spark.createDataFrame(
        [("cq0", "rare_x def self ( ) = { } : if for class return")],
        "query_id string, query string",
    )
    wand_mod.release_two_phase_cache()
    for _ in range(3):
        wand_topk(seg, qs, k=5, two_phase=True).count()
        assert len(wand_mod._TP_CACHE) <= 1
    wand_mod.release_two_phase_cache()
    assert not wand_mod._TP_CACHE


def test_two_phase_auto_decide_heuristic():
    """Unit: the dictionary-stats predictor engages on cluster-scale hot
    terms and stays off at sandbox scale."""
    from flagembedding_spark.operators.wand import _two_phase_auto_decide

    k, bs, thresh = 10, 128, 256 << 20
    # sandbox scale: hot terms ~100k postings → a few MB prunable → off
    small = [("q0", "rare", 8.0, 2_000)] + [
        ("q0", f"hot{i}", 0.2, 100_000) for i in range(10)
    ]
    assert _two_phase_auto_decide(small, k, bs, thresh) is False
    # cluster scale: hot terms ~10^9 postings → GBs prunable → on
    big = [("q0", "rare", 8.0, 2_000_000)] + [
        ("q0", f"hot{i}", 0.2, 1_000_000_000) for i in range(10)
    ]
    assert _two_phase_auto_decide(big, k, bs, thresh) is True
    # single-term and θ-unavailable queries never engage
    assert _two_phase_auto_decide([("q0", "only", 5.0, 10**9)], k, bs, thresh) is False
    assert (
        _two_phase_auto_decide(
            [("q0", "rare", 8.0, 50), ("q0", "hot", 0.2, 10**9)], k, bs, thresh
        )
        is False
    )


def test_two_phase_auto_mode_identity(spark):
    """two_phase='auto' through the public API: identical top-k (at sandbox
    scale it predicts OFF, so it must match exact and 'on' alike)."""
    corpus = _clustered_rare_corpus(spark)
    cfg = BM25Config(block_size=64, term_buckets=8)
    idx = build_index(
        corpus, cfg, content_col="text", docid_long="doc_id", method="sql"
    )
    seg = merge_segments(build_segments(idx))
    seg.blocks = seg.blocks.cache()
    qs = spark.createDataFrame(
        [("aq0", "rare_x def self ( ) = { } : if for class return"),
         ("aq1", "zz_nope")],
        "query_id string, query string",
    )
    base = _canon(wand_topk(seg, qs, k=5, use_wand="exact").collect(), 6)
    auto = _canon(
        wand_topk(seg, qs, k=5, use_wand="auto", two_phase="auto").collect(), 6
    )
    assert auto == base


def test_merge_stores_empty_generation_disjoint_check(spark, tmp_path):
    """An EMPTY generation (zero blocks → None docid range) must not crash
    the disjointness check (ADVICE r03: None vs int TypeError in sort)."""
    from flagembedding_spark.operators.segments import (
        merge_stores,
        save_segments,
    )
    from flagembedding_spark.schemas import synth_corpus

    corpus = synth_corpus(spark, 60, seed=3).cache()
    cfg = BM25Config(block_size=16, term_buckets=8)
    full = merge_segments(build_segments(build_index(corpus, cfg)))
    empty_idx = build_index(
        spark.createDataFrame([], "doc_id long, text string"),
        cfg, content_col="text", docid_long="doc_id", method="sql",
    )
    empty_seg = merge_segments(build_segments(empty_idx))
    r1, r2 = str(tmp_path / "full"), str(tmp_path / "empty")
    save_segments(full, r1)
    save_segments(empty_seg, r2)
    merged = merge_stores(spark, [r1, r2], check_disjoint=True)
    assert merged.stats.n_docs == full.stats.n_docs


def test_two_phase_auto_engages_with_low_threshold(spark, monkeypatch):
    """'auto' must ENGAGE the prune (not just predict off) when the byte
    threshold says so — forced via FES_TWOPHASE_AUTO_BYTES=1 — and stay
    identical to exact."""
    from flagembedding_spark.operators.wand import candidate_block_plan

    corpus = _clustered_rare_corpus(spark)
    cfg = BM25Config(block_size=64, term_buckets=8)
    idx = build_index(
        corpus, cfg, content_col="text", docid_long="doc_id", method="sql"
    )
    seg = merge_segments(build_segments(idx))
    seg.blocks = seg.blocks.cache()
    qs = spark.createDataFrame(
        [("fq0", "rare_x def self ( ) = { } : if for class return")],
        "query_id string, query string",
    )
    monkeypatch.setenv("FES_TWOPHASE_AUTO_BYTES", "1")
    n_all = candidate_block_plan(seg, qs, k=5)[0].count()
    n_auto = candidate_block_plan(seg, qs, k=5, two_phase="auto")[0].count()
    assert n_auto < n_all, (n_auto, n_all)  # the prune actually ran
    base = _canon(wand_topk(seg, qs, k=5, use_wand="exact").collect(), 6)
    auto = _canon(
        wand_topk(seg, qs, k=5, use_wand="auto", two_phase="auto").collect(), 6
    )
    assert auto == base


def test_merge_passthrough_canonical_form(spark):
    """The merge's single-run pass-through must leave every term in exact
    canonical form — ords contiguous from 0, every block full except the
    last, ranges strictly increasing — indistinguishable from a re-encode
    (mixed fixture: salted hot terms exercise the k-way merge branch,
    the vocabulary tail exercises the pass-through)."""
    from flagembedding_spark.schemas import synth_corpus

    corpus = synth_corpus(spark, 300, seed=7)
    cfg = BM25Config(block_size=8, salt_threshold_df=40, max_salt=4,
                     term_buckets=8)
    idx = build_index(corpus, cfg)
    seg = merge_segments(build_segments(idx))
    rows = seg.blocks.collect()
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    n_multi = 0
    for term, bs in by_term.items():
        bs.sort(key=lambda r: r["block_ord"])
        assert [b["block_ord"] for b in bs] == list(range(len(bs))), term
        for i, b in enumerate(bs):
            if i < len(bs) - 1:
                assert b["n"] == cfg.block_size, (term, i)
                assert bs[i + 1]["docid_first"] > b["docid_last"], (term, i)
            assert b["docid_first"] <= b["docid_last"], (term, i)
        if len(bs) > 1:
            n_multi += 1
    assert n_multi > 0  # fixture non-vacuous: some terms span blocks
