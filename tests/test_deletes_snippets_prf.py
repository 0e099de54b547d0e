"""Round-4 operators: live tombstone deletes (Lucene live-docs semantics),
compaction, Boolean min_should_match, snippet extraction, PRF expansion."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flagembedding_spark.config import BM25Config
from flagembedding_spark.operators.deletes import (
    DocidBitmap,
    clear_tombstones,
    compact_store,
    load_tombstones,
    write_tombstones,
)
from flagembedding_spark.operators.index_build import build_index
from flagembedding_spark.operators.query import bm25_topk
from flagembedding_spark.operators.segments import (
    build_segments,
    merge_segments,
    save_segments,
)
from flagembedding_spark.operators.wand import wand_topk

CFG = BM25Config(k1=1.2, b=0.75, block_size=16, salt_threshold_df=50,
                 max_salt=4, term_buckets=8)


@pytest.fixture(scope="module")
def corpus(spark):
    from flagembedding_spark.schemas import synth_corpus

    c = synth_corpus(spark, 200, seed=13)
    return c.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("text"),
    ).cache()


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, CFG, content_col="text", docid_long="doc_id")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(
        # terms from the synthetic CODE corpus vocabulary (schemas.py) —
        # an off-vocabulary query set here would make every test vacuous
        [("q1", "get_er_0 set_er_1 merge_er_6"), ("q2", "public const"),
         ("q3", "class import")],
        ["query_id", "query"],
    )


def _rows(df):
    return sorted(
        (r["qid"], int(r["docid"]), round(float(r["score"]), 6), int(r["rank"]))
        for r in df.collect()
    )


# ---------------------------------------------------------------------------
# tombstones
# ---------------------------------------------------------------------------

def test_tombstone_file_roundtrip(tmp_path):
    root = str(tmp_path)
    assert load_tombstones(root).size == 0
    got = write_tombstones(root, [5, 3, 5, 9])
    assert got.tolist() == [3, 5, 9]
    got = write_tombstones(root, [1, 9])  # idempotent union
    assert got.tolist() == [1, 3, 5, 9]
    assert load_tombstones(root).tolist() == [1, 3, 5, 9]
    clear_tombstones(root)
    assert load_tombstones(root).size == 0


def test_dataframe_deletes_stale_scores(index, queries):
    """Deleted docs vanish; every surviving (doc, score) pair is EXACTLY the
    pre-delete pair (stale stats — a delete must not rescore survivors)."""
    full = bm25_topk(index, queries, k=50)
    full_scores = {
        (r["qid"], int(r["docid"])): float(r["score"]) for r in full.collect()
    }
    assert full_scores  # queries must hit the corpus (non-vacuous test)
    dead = [int(r["docid"]) for r in full.filter("rank <= 2").collect()]
    assert dead
    got = bm25_topk(index, queries, k=10, exclude_docids=dead)
    for r in got.collect():
        assert int(r["docid"]) not in dead
        assert float(r["score"]) == pytest.approx(
            full_scores[(r["qid"], int(r["docid"]))], abs=0
        )
    # rank sequence stays dense 1..k per query
    for q in ("q1", "q2", "q3"):
        ranks = [int(r["rank"]) for r in got.filter(F.col("qid") == q).collect()]
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_wand_deletes_match_dataframe(index, queries):
    seg = merge_segments(build_segments(index))
    seg.blocks = seg.blocks.cache()
    dead = [3, 7, 11, 42]
    want = _rows(bm25_topk(index, queries, k=10, exclude_docids=dead))
    assert want  # non-vacuous
    got = _rows(wand_topk(seg, queries, k=10, exclude_docids=dead))
    assert got == want
    # mid-sized set (> the 64-element bitmap cutover): auto-converts to a
    # DocidBitmap in-kernel, must stay identical to the DataFrame path
    dead_mid = list(range(0, 300, 2))
    want_mid = _rows(bm25_topk(index, queries, k=10, exclude_docids=dead_mid))
    got_mid = _rows(wand_topk(seg, queries, k=10, exclude_docids=dead_mid))
    assert want_mid and got_mid == want_mid


def test_docid_bitmap_matches_isin_reference():
    """Roaring-shaped DocidBitmap: membership identical to np.isin over a
    mixed sparse/dense docid set (array + bitmap containers both hit)."""
    rng = np.random.default_rng(7)
    # dense region (bitmap containers): 60k ids inside two 65 536-ranges,
    # sparse region (array containers): scattered high ids
    dense = rng.choice(131_072, size=60_000, replace=False).astype(np.int64)
    sparse = rng.integers(1 << 33, 1 << 40, size=5_000).astype(np.int64)
    dead = np.concatenate([dense, sparse])
    bm = DocidBitmap.from_array(dead)
    assert bm.size == np.unique(dead).size
    assert (bm.kinds == 1).any() and (bm.kinds == 0).any()  # both container kinds
    probe = np.concatenate([
        rng.integers(0, 1 << 40, size=50_000).astype(np.int64),
        dead[::7],  # guaranteed hits
    ])
    want = np.isin(probe, dead)
    got = bm.contains(probe)
    assert np.array_equal(got, want)
    assert np.array_equal(np.sort(bm.to_array()), np.unique(dead))
    # scalar + union
    assert bm.contains_scalar(int(dead[0]))
    assert not bm.contains_scalar(int(np.setdiff1d(np.arange(200_000), dead)[0]))
    bm2 = bm.union([1 << 41])
    assert bm2.size == bm.size + 1 and bm2.contains_scalar(1 << 41)


def test_docid_bitmap_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    dead = np.concatenate([
        rng.choice(70_000, size=20_000, replace=False).astype(np.int64),
        rng.integers(1 << 30, 1 << 35, size=1_000).astype(np.int64),
    ])
    bm = DocidBitmap.from_array(dead)
    path = str(tmp_path / "t.npz")
    bm.save(path)
    back = DocidBitmap.load(path)
    probe = rng.integers(0, 1 << 35, size=10_000).astype(np.int64)
    assert back.size == bm.size
    assert np.array_equal(back.contains(probe), bm.contains(probe))


def test_wand_million_tombstones(index, queries, tmp_path):
    """The 10k query-time cap is retired: a ≥1M-tombstone set rides the
    roaring bitmap through wand_topk with bounded memory, and masking is
    identical to querying the compacted (tombstone-free) store's surviving
    docid set with stale-stats scores."""
    seg = merge_segments(build_segments(index))
    seg.blocks = seg.blocks.cache()
    full = _rows(wand_topk(seg, queries, k=20))
    assert full
    real_dead = sorted({d for _, d, _, _ in full})[:3]
    # 1M+ tombstones: 3 real docids + a dense synthetic range far above the
    # corpus (exercises bitmap containers at full scale; semantically a
    # no-op for absent ids, exactly like Lucene deleting unknown ids)
    dead = np.concatenate([
        np.asarray(real_dead, dtype=np.int64),
        np.arange(1 << 30, (1 << 30) + 1_000_000, dtype=np.int64),
    ])
    bm = DocidBitmap.from_array(dead)
    assert bm.size >= 1_000_003
    got = _rows(wand_topk(seg, queries, k=10, exclude_docids=bm))
    want = _rows(
        wand_topk(seg, queries, k=10, exclude_docids=real_dead)
    )
    assert got == want  # the million absent ids change nothing
    for _, d, _, _ in got:
        assert d not in real_dead
    # identity vs compact_store's surviving corpus: same docids survive
    root, out = str(tmp_path / "store"), str(tmp_path / "compacted")
    save_segments(seg, root)
    write_tombstones(root, real_dead)
    compacted = compact_store(spark=queries.sparkSession, root=root,
                              out_root=out)
    surv = {int(r["docid"])
            for r in wand_topk(compacted, queries, k=10).collect()}
    assert not surv & set(real_dead)


def test_serving_million_tombstones(spark, index, tmp_path):
    """Serving reader end-to-end on a ≥1M tombstone store: results match
    the 3-real-delete store bit-for-bit (stale stats), absent ids no-op."""
    from flagembedding_spark.serving import SegmentReader

    seg = merge_segments(build_segments(index))
    root = str(tmp_path / "store")
    save_segments(seg, root)
    rd = SegmentReader(root, n_threads=1)
    full = rd.topk("get_er_0 set_er_1 merge_er_6", k=20)
    assert len(full) > 5
    real_dead = [d for d, _, _ in full[:3]]
    write_tombstones(root, real_dead)
    small = SegmentReader(root, n_threads=1).topk(
        "get_er_0 set_er_1 merge_er_6", k=10
    )
    merged = write_tombstones(
        root, np.arange(1 << 30, (1 << 30) + 1_000_000, dtype=np.int64)
    )
    assert merged.size >= 1_000_003
    # large sets drop the JSON twin and persist only the compressed bitmap
    import os

    assert os.path.exists(f"{root}/tombstones.npz")
    assert not os.path.exists(f"{root}/tombstones.json")
    big = SegmentReader(root, n_threads=1).topk(
        "get_er_0 set_er_1 merge_er_6", k=10
    )
    assert big == small
    assert all(d not in set(real_dead) for d, _, _ in big)


def test_wand_include_filter_matches_dataframe(index, corpus, queries):
    """include_docids on the segment path (in-kernel DocidMask) must be
    rank- and score-identical to the DataFrame path's filter-clause
    semantics: candidates restricted, scores from GLOBAL stats."""
    from flagembedding_spark.operators.segments import (
        build_doc_partitioned_segments,
    )

    seg = merge_segments(build_segments(index))
    seg.blocks = seg.blocks.cache()
    keep_df = corpus.filter("doc_id % 3 != 0").select(
        F.col("doc_id").alias("docid")
    )
    want = _rows(bm25_topk(index, queries, k=10, include_docids=keep_df))
    assert want  # non-vacuous
    got = _rows(wand_topk(seg, queries, k=10, include_docids=keep_df))
    assert got == want
    # every result obeys the filter
    assert all(d % 3 != 0 for _, d, _, _ in got)
    # doc-partitioned layout shares the mask hook
    dseg = build_doc_partitioned_segments(index, n_parts=4)
    got_doc = _rows(wand_topk(dseg, queries, k=10, include_docids=keep_df))
    assert got_doc == want
    # combined include + exclude: tombstones compose with the filter
    dead = sorted({d for _, d, _, _ in want})[:2]
    want2 = _rows(bm25_topk(index, queries, k=10, include_docids=keep_df,
                            exclude_docids=dead))
    got2 = _rows(wand_topk(seg, queries, k=10, include_docids=keep_df,
                           exclude_docids=dead))
    assert want2 and got2 == want2
    with pytest.raises(ValueError, match="two_phase"):
        wand_topk(seg, queries, k=10, two_phase=True,
                  include_docids=keep_df)


def test_two_phase_rejects_delete_and_msm_combos(index, queries):
    """two_phase's θ is a disjunctive bound witnessed by LIVE docs — its
    safety argument breaks under exclude_docids (witnesses may all be
    tombstoned) and min_should_match (re-scopes admissible docs). Explicit
    two_phase=True with either must raise; 'auto' degrades to off with
    parity vs the plain path."""
    seg = merge_segments(build_segments(index))
    seg.blocks = seg.blocks.cache()
    with pytest.raises(ValueError, match="two_phase"):
        wand_topk(seg, queries, k=10, two_phase=True, exclude_docids=[1])
    with pytest.raises(ValueError, match="two_phase"):
        wand_topk(seg, queries, k=10, two_phase=True, min_should_match=2)
    want = _rows(wand_topk(seg, queries, k=10, exclude_docids=[3, 7]))
    got = _rows(wand_topk(seg, queries, k=10, two_phase="auto",
                          exclude_docids=[3, 7]))
    assert want and got == want
    want2 = _rows(wand_topk(seg, queries, k=10, min_should_match=2))
    got2 = _rows(wand_topk(seg, queries, k=10, two_phase="auto",
                           min_should_match=2))
    assert want2 and got2 == want2


def test_serving_reader_honors_tombstones(spark, index, tmp_path):
    from flagembedding_spark.serving import SegmentReader

    seg = merge_segments(build_segments(index))
    root = str(tmp_path / "store")
    save_segments(seg, root)
    rd = SegmentReader(root, n_threads=1)
    full = rd.topk("get_er_0 set_er_1 merge_er_6", k=20)
    assert len(full) > 5
    dead = [d for d, _, _ in full[:3]]
    write_tombstones(root, dead)
    rd2 = SegmentReader(root, n_threads=1)
    got = rd2.topk("get_er_0 set_er_1 merge_er_6", k=10)
    full_scores = dict((d, s) for d, s, _ in full)
    assert [d for d, _, _ in got] == [
        d for d, _, _ in full if d not in set(dead)
    ][:10]
    for d, s, r in got:
        assert s == full_scores[d]  # stale stats: scores bit-identical
    assert [r for _, _, r in got] == list(range(1, len(got) + 1))


def test_compact_store_recomputes_stats(spark, corpus, index, queries, tmp_path):
    """expungeDeletes: the compacted store must answer queries like a FRESH
    index built over the surviving corpus (df/idf/avgdl recomputed)."""
    seg = merge_segments(build_segments(index))
    root, out = str(tmp_path / "store"), str(tmp_path / "compacted")
    save_segments(seg, root)
    dead = [int(r["doc_id"]) for r in corpus.filter("doc_id % 11 = 2").collect()]
    write_tombstones(root, dead)
    compacted = compact_store(spark, root, out)
    assert load_tombstones(out).size == 0

    survivors = corpus.filter(~F.col("doc_id").isin(dead))
    fresh_idx = build_index(
        survivors, CFG, content_col="text", docid_long="doc_id"
    )
    fresh = merge_segments(build_segments(fresh_idx))
    want = _rows(wand_topk(fresh, queries, k=10))
    assert want  # non-vacuous
    got = _rows(wand_topk(compacted, queries, k=10))
    assert got == want
    assert compacted.stats.n_docs == fresh_idx.stats.n_docs
    assert compacted.stats.avgdl == pytest.approx(fresh_idx.stats.avgdl)


def test_serving_phrase_proximity_honor_tombstones(spark, tmp_path):
    from flagembedding_spark.operators.index_build import index_from_postings
    from flagembedding_spark.operators.positions import positional_postings_full
    from flagembedding_spark.serving import SegmentReader

    rows = [(0, "a b c"), (1, "a b d"), (2, "a x b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = index_from_postings(positional_postings_full(docs), CFG)
    seg = merge_segments(build_segments(idx, store_positions=True))
    root = str(tmp_path / "pstore")
    save_segments(seg, root)
    write_tombstones(root, [1])
    rd = SegmentReader(root, n_threads=1)
    assert [d for d, _ in rd.phrase("a b")] == [0]
    assert all(d != 1 for d, _ in rd.proximity("a", "b", window=2))


# ---------------------------------------------------------------------------
# min_should_match / conjunctive
# ---------------------------------------------------------------------------

def test_min_should_match_all_and_int(spark, index, corpus):
    qs = spark.createDataFrame(
        [("c1", "get_er_0 merge_er_6 read_er_4"), ("c2", "get_er_0 zz_oov_token")],
        ["query_id", "query"],
    )
    toks = F.split("text", " ", -1)
    # ground truth: docs containing every term of c1
    want = sorted(
        int(r["doc_id"])
        for r in corpus.filter(
            F.array_contains(toks, "get_er_0")
            & F.array_contains(toks, "merge_er_6")
            & F.array_contains(toks, "read_er_4")
        ).collect()
    )
    assert want  # non-vacuous: the conjunction must have matches
    got = bm25_topk(index, qs, k=1000, min_should_match="all")
    assert sorted(
        int(r["docid"]) for r in got.filter("qid = 'c1'").collect()
    ) == want
    # conjunctive with an OOV term matches nothing (Lucene AND)
    assert got.filter("qid = 'c2'").count() == 0
    # msm=2: at least two distinct terms
    got2 = bm25_topk(index, qs, k=1000, min_should_match=2)
    for r in got2.filter("qid = 'c1'").collect():
        row = corpus.filter(F.col("doc_id") == int(r["docid"])).collect()[0]
        n = sum(
            t in row["text"].split(" ")
            for t in ("get_er_0", "merge_er_6", "read_er_4")
        )
        assert n >= 2
    # disjunctive default is unchanged and a superset
    base = bm25_topk(index, qs, k=1000)
    assert base.filter("qid = 'c1'").count() >= len(want)


# ---------------------------------------------------------------------------
# snippets
# ---------------------------------------------------------------------------

def test_snippet_hand_checked(spark):
    from flagembedding_spark.operators.snippets import extract_snippets

    docs = spark.createDataFrame(
        [
            (0, "t0 t1 t2 needle t4 t5 t6 t7 t8 t9 t10"),
            (1, "needle right at start of this document here"),
            (2, "no match here at all in this text"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([("s1", "needle")], ["query_id", "query"])
    res = spark.createDataFrame(
        [("s1", 0, 1), ("s1", 1, 2)], "qid string, docid long, rank int"
    )
    got = {
        (r["qid"], int(r["docid"])): r["snippet"]
        for r in extract_snippets(docs, res, qs, width=7, before=2).collect()
    }
    # anchor at token 4 (1-based) → start 2 → 7 tokens
    assert got[("s1", 0)] == "t1 t2 needle t4 t5 t6 t7"
    # anchor at token 1 → start clamps to 1
    assert got[("s1", 1)] == "needle right at start of this document"


# ---------------------------------------------------------------------------
# PRF expansion
# ---------------------------------------------------------------------------

def test_prf_hand_checked(spark):
    from flagembedding_spark.operators.index_build import build_index as _bi
    from flagembedding_spark.operators.prf import prf_expansion

    docs = spark.createDataFrame(
        [
            (0, "apple banana banana cherry"),
            (1, "apple banana date"),
            (2, "apple elderberry"),
            (3, "fig grape"),  # irrelevant to the query
        ],
        "doc_id long, text string",
    )
    idx = _bi(docs, CFG, content_col="text", docid_long="doc_id")
    qs = spark.createDataFrame([("p1", "apple")], ["query_id", "query"])
    got = [
        (r["term"], int(r["fb_df"]), int(r["fb_tf"]), int(r["rank"]))
        for r in prf_expansion(idx, qs, fb_k=3, n_terms=3)
        .orderBy("rank").collect()
    ]
    # feedback docs = the 3 'apple' docs; 'apple' itself excluded;
    # banana: df 2, tf 3; cherry/date/elderberry: df 1 tf 1 → term asc
    assert got == [
        ("banana", 2, 3, 1), ("cherry", 1, 1, 2), ("date", 1, 1, 3)
    ]


def test_prf_all_oov_query_absent(spark, index):
    from flagembedding_spark.operators.prf import prf_expansion

    qs = spark.createDataFrame(
        [("p2", "zz_nothing_matches qq_nada")], ["query_id", "query"]
    )
    assert prf_expansion(index, qs, fb_k=5, n_terms=3).count() == 0


def test_include_docids_filter_never_rescores(spark, index, corpus, queries):
    """Filtered search (Lucene filter clause): candidates restricted to the
    include set, every surviving (doc, score) identical to unfiltered."""
    keep = corpus.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("docid")
    )
    keep_ids = {int(r["docid"]) for r in keep.collect()}
    full = bm25_topk(index, queries, k=1000)
    full_scores = {
        (r["qid"], int(r["docid"])): float(r["score"]) for r in full.collect()
    }
    got = bm25_topk(index, queries, k=10, include_docids=keep)
    rows = got.collect()
    assert rows
    for r in rows:
        assert int(r["docid"]) in keep_ids
        assert float(r["score"]) == full_scores[(r["qid"], int(r["docid"]))]
    for q in ("q1", "q2", "q3"):
        ranks = [int(r["rank"]) for r in rows if r["qid"] == q]
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


# ---------------------------------------------------------------------------
# MoreLikeThis
# ---------------------------------------------------------------------------

def test_mlt_hand_checked(spark):
    from flagembedding_spark.operators.mlt import mlt_terms, more_like_this

    docs = spark.createDataFrame(
        [
            (0, "rare_term common common filler0"),
            (1, "rare_term common other filler1"),
            (2, "common common common filler2"),
            (3, "unrelated stuff here filler3"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs, CFG, content_col="text", docid_long="doc_id")
    seeds = spark.createDataFrame([(0,)], "docid long")
    terms = [
        (r["term"], int(r["rank"]))
        for r in mlt_terms(idx, seeds, m_terms=2).orderBy("rank").collect()
    ]
    # rare_term (df=2) outweighs common (df=3, even at tf=2) and filler0
    # shares rare_term's idf but has tf 1 < rare's... both df... check:
    # idf(rare_term, df=2) == idf(filler0, df=1 higher) — filler0 idf larger
    assert terms[0][0] in ("filler0", "rare_term")
    got = more_like_this(idx, seeds, m_terms=3, k=5)
    rows = got.collect()
    assert rows
    for r in rows:
        assert r["qid"] == "0" and int(r["docid"]) != 0  # seed excluded
    # doc 1 shares rare_term+common with the seed → must be the top hit
    top = min(rows, key=lambda r: r["rank"])
    assert int(top["docid"]) == 1


def test_mlt_seed_never_in_results(spark, index, corpus):
    from flagembedding_spark.operators.mlt import more_like_this

    seeds = corpus.limit(5).select(F.col("doc_id").alias("docid"))
    got = more_like_this(index, seeds, m_terms=5, k=10)
    assert got.count() > 0
    assert got.filter(F.col("qid") == F.col("docid").cast("string")).count() == 0


# ---------------------------------------------------------------------------
# BM25F
# ---------------------------------------------------------------------------

def test_bm25f_single_field_weight1_equals_bm25(spark, corpus, index, queries):
    """BM25F with one field at weight 1 IS standard BM25 — full identity."""
    from flagembedding_spark.operators.bm25f import bm25f_topk

    want = _rows(bm25_topk(index, queries, k=10, round_scores=4))
    assert want
    got = _rows(
        bm25f_topk(corpus, queries, fields=[("text", 1)], k=10,
                   config=CFG, round_scores=4)
    )
    assert got == want


def test_bm25f_title_weight_boosts(spark):
    """Same term, same doc lengths: the doc carrying it in the weighted
    title field must outrank the doc carrying it in the body."""
    from flagembedding_spark.operators.bm25f import bm25f_topk

    docs = spark.createDataFrame(
        [
            (0, "needle pad1", "pad2 pad3 pad4"),
            (1, "pad1 pad5", "needle pad3 pad4"),
        ],
        "doc_id long, title string, body string",
    )
    qs = spark.createDataFrame([("b1", "needle")], ["query_id", "query"])
    got = {
        int(r["docid"]): int(r["rank"])
        for r in bm25f_topk(
            docs, qs, fields=[("title", 3), ("body", 1)], k=10, config=CFG
        ).collect()
    }
    assert got[0] == 1 and got[1] == 2  # title hit (tf'=3) beats body (tf'=1)


def test_bm25f_combined_tf_hand_computed(spark):
    """tf' and dl' combine with integer weights before saturation: check
    one score against the formula computed by hand."""
    import math

    from flagembedding_spark.operators.bm25f import build_bm25f_index

    docs = spark.createDataFrame(
        [(0, "x y", "x z"), (1, "a b", "c d")],
        "doc_id long, title string, body string",
    )
    idx = build_bm25f_index(docs, [("title", 2), ("body", 1)], config=CFG)
    p = {
        (r["term"], int(r["docid"])): (int(r["tf"]), int(r["dl"]))
        for r in idx.postings.collect()
    }
    # x: title tf 1 ×2 + body tf 1 ×1 = 3; dl' = 2·2 + 1·2 = 6
    assert p[("x", 0)] == (3, 6)
    assert p[("y", 0)] == (2, 6)
    assert p[("z", 0)] == (1, 6)
    assert idx.stats.avgdl == pytest.approx(6.0)
    d = {r["term"]: (int(r["df"]), float(r["idf"])) for r in idx.dictionary.collect()}
    assert d["x"][0] == 1
    assert d["x"][1] == pytest.approx(math.log((2 - 1 + 0.5) / 1.5 + 1.0))


# ---------------------------------------------------------------------------
# prefix / fuzzy multi-term queries
# ---------------------------------------------------------------------------

def test_prefix_expansion_and_search(spark):
    from flagembedding_spark.operators.termquery import (
        expand_prefix,
        prefix_search_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "get_x get_x get_y other"),
            (1, "get_y set_z pad"),
            (2, "unrelated words only"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs, CFG, content_col="text", docid_long="doc_id")
    ps = spark.createDataFrame([("p1", "get_")], ["query_id", "prefix"])
    terms = sorted(
        r["term"] for r in expand_prefix(idx, ps, max_expansions=10).collect()
    )
    assert terms == ["get_x", "get_y"]
    hits = {
        int(r["docid"]) for r in prefix_search_topk(idx, ps, k=10).collect()
    }
    assert hits == {0, 1}
    # expansion cap: max_expansions=1 keeps the highest-df term only
    one = [r["term"] for r in expand_prefix(idx, ps, max_expansions=1).collect()]
    assert len(one) == 1 and one[0] in ("get_x", "get_y")


def test_fuzzy_expansion_and_search(spark):
    from flagembedding_spark.operators.termquery import (
        expand_fuzzy,
        fuzzy_search_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark spark pad0"),
            (1, "spork pad1 pad2"),
            (2, "sparkle pad3 pad4"),   # distance 2 — must NOT match
            (3, "park pad5 pad6"),      # distance 1 (deletion)
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs, CFG, content_col="text", docid_long="doc_id")
    ts = spark.createDataFrame([("f1", "spark")], ["query_id", "qterm"])
    terms = sorted(
        r["term"] for r in expand_fuzzy(idx, ts, max_edits=1).collect()
    )
    assert terms == ["park", "spark", "spork"]  # exact term included
    hits = {
        int(r["docid"]) for r in fuzzy_search_topk(idx, ts, k=10).collect()
    }
    assert hits == {0, 1, 3}


def test_wildcard_expansion_and_regex(spark):
    from flagembedding_spark.operators.termquery import (
        expand_wildcard,
        wildcard_to_regex,
    )

    assert wildcard_to_regex("sp*") == "^sp.*$"
    assert wildcard_to_regex("?ash") == "^.ash$"
    assert wildcard_to_regex("a.b*") == "^a\\.b.*$"  # dot escaped literally
    docs = spark.createDataFrame(
        [(0, "spark spore hash cash wash a.bx"), (1, "spin dash rehash")],
        "doc_id long, text string",
    )
    idx = build_index(docs, CFG, content_col="text", docid_long="doc_id")
    ps = spark.createDataFrame(
        [("w1", "sp*"), ("w2", "?ash"), ("w3", "a.b*")],
        ["query_id", "pattern"],
    )
    got = {}
    for r in expand_wildcard(idx, ps).collect():
        got.setdefault(r["qid"], set()).add(r["term"])
    assert got["w1"] == {"spark", "spore", "spin"}
    assert got["w2"] == {"hash", "cash", "wash", "dash"}  # NOT rehash
    assert got["w3"] == {"a.bx"}


def test_proximity_ordered_vs_unordered(spark):
    from flagembedding_spark.operators.positions import (
        positional_postings,
        proximity_occurrences,
    )

    docs = spark.createDataFrame(
        [(0, "a x b"), (1, "b x a"), (2, "a b a")],
        "doc_id long, text string",
    )
    pos = positional_postings(docs)
    un = {
        int(r["docid"]): int(r["n_pairs"])
        for r in proximity_occurrences(pos, "a", "b", 2).collect()
    }
    od = {
        int(r["docid"]): int(r["n_pairs"])
        for r in proximity_occurrences(
            pos, "a", "b", 2, ordered=True
        ).collect()
    }
    # doc0: a@0 b@2 → both; doc1: b@0 a@2 → unordered only;
    # doc2: a@0 b@1 a@2 → unordered pairs (0,1),(1,2)=2; ordered only (0,1)
    assert un == {0: 1, 1: 1, 2: 2}
    assert od == {0: 1, 2: 1}


def test_wand_min_should_match_matches_dataframe(spark, index, corpus, queries):
    """Segment-path conjunctive/min_should_match == DataFrame engine, both
    layouts."""
    from flagembedding_spark.operators.segments import (
        build_doc_partitioned_segments,
    )

    seg = merge_segments(build_segments(index))
    seg.blocks = seg.blocks.cache()
    dseg = build_doc_partitioned_segments(index, n_parts=4)
    qs = spark.createDataFrame(
        [("m1", "get_er_0 merge_er_6 read_er_4"),
         ("m2", "get_er_0 zz_oov_token"), ("m3", "public const")],
        ["query_id", "query"],
    )
    for msm in ("all", 2):
        want = _rows(bm25_topk(index, qs, k=10, min_should_match=msm))
        got_t = _rows(wand_topk(seg, qs, k=10, min_should_match=msm))
        got_d = _rows(wand_topk(dseg, qs, k=10, min_should_match=msm))
        assert got_t == want, ("term", msm)
        assert got_d == want, ("doc", msm)
    # non-vacuity: the 'all' case must produce SOME rows for m1/m3
    assert _rows(bm25_topk(index, qs, k=10, min_should_match="all"))


def test_bm25f_index_feeds_segment_path(spark):
    """A BM25F weighted-field index is a standard InvertedIndex — the
    segment build + WAND path must give the same top-k as the DataFrame
    engine over it."""
    from flagembedding_spark.operators.bm25f import build_bm25f_index

    docs = spark.createDataFrame(
        [
            (0, "needle alpha", "beta gamma delta"),
            (1, "alpha beta", "needle needle epsilon"),
            (2, "zeta eta", "theta iota kappa"),
            (3, "needle beta", "alpha alpha gamma"),
        ],
        "doc_id long, title string, body string",
    )
    idx = build_bm25f_index(docs, [("title", 2), ("body", 1)], config=CFG)
    qs = spark.createDataFrame(
        [("s1", "needle alpha"), ("s2", "theta")], ["query_id", "query"]
    )
    want = _rows(bm25_topk(idx, qs, k=10))
    assert want
    seg = merge_segments(build_segments(idx))
    got = _rows(wand_topk(seg, qs, k=10))
    assert got == want


def test_serving_reader_msm_prefix_fuzzy_parity(spark, tmp_path):
    """The Spark-free reader's conjunctive / prefix / fuzzy point queries
    must match the Spark batch operators."""
    from flagembedding_spark.operators.termquery import (
        fuzzy_search_topk,
        prefix_search_topk,
    )
    from flagembedding_spark.serving import SegmentReader

    docs = spark.createDataFrame(
        [
            (0, "spark spore hash needle alpha"),
            (1, "spin dash needle needle beta"),
            (2, "spark hash alpha alpha"),
            (3, "gamma delta epsilon"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs, CFG, content_col="text", docid_long="doc_id")
    seg = merge_segments(build_segments(idx))
    root = str(tmp_path / "store")
    save_segments(seg, root)
    rd = SegmentReader(root, n_threads=1)

    # conjunctive
    qs = spark.createDataFrame(
        [("c", "spark hash alpha")], ["query_id", "query"]
    )
    want = [
        (int(r["docid"]), round(float(r["score"]), 9), int(r["rank"]))
        for r in bm25_topk(idx, qs, k=10, min_should_match="all")
        .orderBy("rank").collect()
    ]
    got = [
        (d, round(s, 9), r)
        for d, s, r in rd.topk("spark hash alpha", k=10, min_should_match="all")
    ]
    assert want and got == want
    assert rd.topk("spark zz_oov", k=10, min_should_match="all") == []

    # prefix
    ps = spark.createDataFrame([("p", "sp")], ["query_id", "prefix"])
    want = [
        (int(r["docid"]), round(float(r["score"]), 9), int(r["rank"]))
        for r in prefix_search_topk(idx, ps, k=10).orderBy("rank").collect()
    ]
    got = [(d, round(s, 9), r) for d, s, r in rd.prefix_topk("sp", k=10)]
    assert want and got == want

    # fuzzy
    ts = spark.createDataFrame([("f", "spark")], ["query_id", "qterm"])
    want = [
        (int(r["docid"]), round(float(r["score"]), 9), int(r["rank"]))
        for r in fuzzy_search_topk(idx, ts, k=10).orderBy("rank").collect()
    ]
    got = [(d, round(s, 9), r) for d, s, r in rd.fuzzy_topk("spark", k=10)]
    assert want and got == want


def test_expansions_on_segment_path(spark):
    """Prefix/fuzzy expansions run on the segment/WAND path via the
    qterms override — identical to the DataFrame expansion engine."""
    from flagembedding_spark.operators.termquery import (
        expand_fuzzy,
        expand_prefix,
        fuzzy_search_topk,
        prefix_search_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark spore hash needle"),
            (1, "spin dash needle needle"),
            (2, "spark hash alpha alpha"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs, CFG, content_col="text", docid_long="doc_id")
    seg = merge_segments(build_segments(idx))
    ps = spark.createDataFrame([("p", "sp")], ["query_id", "prefix"])
    want = _rows(prefix_search_topk(idx, ps, k=10))
    got = _rows(
        wand_topk(seg, ps.select("query_id"), k=10,
                  qterms=expand_prefix(idx, ps))
    )
    assert want and got == want
    ts = spark.createDataFrame([("f", "spark")], ["query_id", "qterm"])
    want = _rows(fuzzy_search_topk(idx, ts, k=10))
    got = _rows(
        wand_topk(seg, ts.select("query_id"), k=10,
                  qterms=expand_fuzzy(idx, ts))
    )
    assert want and got == want


def test_bm25_explain_partials_sum_to_score(spark, index, queries):
    """explain() invariant: a doc's per-term partials sum to its total
    (within rounding of the emitted columns)."""
    from flagembedding_spark.operators.query import bm25_explain

    rows = bm25_explain(index, queries, k=3).collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        key = (r["qid"], int(r["docid"]))
        by_doc.setdefault(key, [0.0, float(r["score4"])])
        by_doc[key][0] += float(r["partial4"])
    for (qid, docid), (psum, total) in by_doc.items():
        assert abs(psum - total) < 5e-4 * max(1, len(rows)), (qid, docid)


def test_search_after_pages_tile_the_ranking(spark, index, queries):
    """searchAfter invariant: successive pages concatenate to exactly the
    full deep ranking — no gap, no overlap — across score-tie boundaries."""
    from flagembedding_spark.operators.query import bm25_search_after

    deep = [
        (r["qid"], int(r["docid"]))
        for r in bm25_topk(index, queries, k=15, round_scores=4)
        .orderBy("qid", "rank").collect()
    ]
    page1 = bm25_topk(index, queries, k=5, round_scores=4)
    cursors = page1.filter(F.col("rank") == 5).select(
        "qid",
        F.col("score").alias("after_score"),
        F.col("docid").alias("after_docid"),
    )
    page2 = bm25_search_after(index, queries, cursors, k=5, round_scores=4)
    cursors2 = page2.filter(F.col("rank") == 5).select(
        "qid",
        F.col("score").alias("after_score"),
        F.col("docid").alias("after_docid"),
    )
    page3 = bm25_search_after(index, queries, cursors2, k=5, round_scores=4)
    got = []
    for page in (page1, page2, page3):
        got.extend(
            (r["qid"], int(r["docid"]))
            for r in page.orderBy("qid", "rank").collect()
        )
    # group by qid and compare sequences
    from collections import defaultdict

    want_by, got_by = defaultdict(list), defaultdict(list)
    for q, d in deep:
        want_by[q].append(d)
    for q, d in got:
        got_by[q].append(d)
    assert any(len(v) > 10 for v in want_by.values())  # non-vacuous depth
    for q, docs in want_by.items():
        assert got_by[q][: len(docs)] == docs, q


# ---------------------------------------------------------------------------
# round-5 ADVICE fixes
# ---------------------------------------------------------------------------

def test_prefix_successor_unit():
    from flagembedding_spark.serving import _prefix_successor

    assert _prefix_successor("ab") == "ac"
    assert _prefix_successor("a") == "b"
    # surrogate gap skipped: U+D7FF + 1 → U+E000 (no valid string between)
    assert _prefix_successor("x퟿") == "x"
    # U+10FFFF carries into the previous position
    assert _prefix_successor("ab\U0010FFFF") == "ac"
    # all-max prefix: unbounded scan
    assert _prefix_successor("\U0010FFFF") is None
    assert _prefix_successor("\U0010FFFF\U0010FFFF") is None
    # every successor really bounds the prefix range
    for p in ["emo", "x퟿", "ab\U0010FFFF"]:
        succ = _prefix_successor(p)
        assert succ > p
        assert p + "\U0010FFFF" < succ  # max continuation still inside


def test_serving_prefix_supplementary_plane(spark, tmp_path):
    """A term whose first post-prefix codepoint is supplementary-plane
    (sorts above U+FFFF) must be found by prefix_topk — the old
    prefix+U+FFFF upper bound excluded it from the scan entirely."""
    from flagembedding_spark.serving import SegmentReader

    docs = spark.createDataFrame(
        [(0, "emo\U0001F600tail common x"), (1, "emoji common y"),
         (2, "emober common z"), (3, "other common w")],
        ["doc_id", "text"],
    )
    idx = build_index(docs, CFG, content_col="text", docid_long="doc_id")
    seg = merge_segments(build_segments(idx))
    root = str(tmp_path / "store")
    save_segments(seg, root)
    rd = SegmentReader(root, n_threads=1)
    got = rd.prefix_topk("emo", k=10)
    found_docs = {d for d, _, _ in got}
    assert 0 in found_docs  # the supplementary-plane term's doc
    assert {0, 1, 2} <= found_docs
    assert 3 not in found_docs


def test_bm25f_all_empty_field_doc_counts_in_n(spark):
    """A doc whose pre-tokenized array fields are ALL empty must still
    count in N and carry dl=0 (count-over-documents convention) — its
    exclusion would shift idf for every term (ADVICE r04)."""
    import math

    from flagembedding_spark.operators.bm25f import build_bm25f_index

    docs = spark.createDataFrame(
        [(0, ["alpha", "beta"], ["alpha"]),
         (1, ["beta"], ["gamma"]),
         (2, [], [])],
        ["doc_id", "title", "body"],
    )
    idx = build_bm25f_index(docs, [("title", 2), ("body", 1)], config=CFG)
    assert idx.stats.n_docs == 3
    stats = {int(r["docid"]): int(r["dl"]) for r in idx.doc_stats.collect()}
    assert stats == {0: 2 * 2 + 1, 1: 2 + 1, 2: 0}
    idf = {r["term"]: float(r["idf"]) for r in idx.dictionary.collect()}
    # beta: df=2 of N=3 → ln((3-2+0.5)/(2+0.5)+1)
    assert idf["beta"] == pytest.approx(math.log((3 - 2 + 0.5) / 2.5 + 1.0))
    assert idf["gamma"] == pytest.approx(math.log((3 - 1 + 0.5) / 1.5 + 1.0))


def test_snippet_no_match_emits_leading_window(spark):
    """A hit containing none of the query's terms anchors at position 1:
    the document's leading window, never a null snippet (defined contract
    for fused/filtered/expanded result rows)."""
    from flagembedding_spark.operators.snippets import extract_snippets

    docs = spark.createDataFrame(
        [(0, "t0 t1 t2 t3 t4 t5 t6 t7 t8"),
         (1, "hit term here t3 t4 t5 t6")],
        ["doc_id", "text"],
    )
    queries = spark.createDataFrame([("q1", "hit term")],
                                    ["query_id", "query"])
    results = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 0, 2)],  # doc 0: zero matching terms
        ["qid", "docid", "rank"],
    )
    got = {
        (r["qid"], int(r["docid"])): r["snippet"]
        for r in extract_snippets(docs, results, queries,
                                  width=4, before=1).collect()
    }
    assert got[("q1", 1)] == "hit term here t3"  # anchor 1, before clamps
    assert got[("q1", 0)] == "t0 t1 t2 t3"  # leading window fallback
