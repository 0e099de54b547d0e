"""Positions inside segment blocks (-storePositions analog): codec
roundtrip, merge carries positions byte-identically, and the phrase read
path through the compressed store matches the DataFrame-level operator."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flagembedding_spark.config import BM25Config
from flagembedding_spark.operators.index_build import index_from_postings
from flagembedding_spark.operators.positions import (
    phrase_match_batch,
    phrase_match_segments,
    positional_postings,
    positional_postings_full,
)
from flagembedding_spark.operators.segments import (
    build_doc_partitioned_segments,
    build_segments,
    decode_block,
    decode_positions,
    encode_positions,
    merge_segments,
    merge_segments_hierarchical,
)

CFG = BM25Config(k1=1.2, b=0.75, use_avgdl=True, block_size=16,
                 salt_threshold_df=50, max_salt=4, term_buckets=8)


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

def test_positions_codec_roundtrip():
    rng = np.random.default_rng(11)
    counts = rng.integers(1, 9, size=300).astype(np.int64)
    flat = np.concatenate(
        [np.sort(rng.choice(5000, size=c, replace=False)) for c in counts]
    ).astype(np.int64)
    got = decode_positions(encode_positions(flat, counts), counts)
    assert np.array_equal(got, flat)


def test_positions_codec_empty_and_single():
    assert encode_positions(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)) == b""
    flat = np.array([0], dtype=np.int64)
    counts = np.array([1], dtype=np.int64)
    assert np.array_equal(
        decode_positions(encode_positions(flat, counts), counts), flat
    )


# ---------------------------------------------------------------------------
# store build / merge
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    from flagembedding_spark.schemas import synth_corpus

    c = synth_corpus(spark, 120, seed=9)
    return c.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("text"),
    ).cache()


@pytest.fixture(scope="module")
def pos_index(docs):
    return index_from_postings(positional_postings_full(docs), CFG)


@pytest.fixture(scope="module")
def pos_seg(pos_index):
    return merge_segments(build_segments(pos_index, store_positions=True))


def _decode_all_positions(seg):
    """blocks → {(term, docid): tuple(positions)} decoded from poss."""
    out = {}
    for r in seg.blocks.collect():
        d, t, _l = decode_block(r["docid_first"], r["docs"], r["tfs"], r["dls"])
        flat = decode_positions(r["poss"], t)
        o = 0
        for i, docid in enumerate(d):
            out[(r["term"], int(docid))] = tuple(flat[o : o + t[i]])
            o += t[i]
    return out


def test_store_positions_match_dataframe_operator(docs, pos_seg):
    want = {
        (r["term"], int(r["docid"])): tuple(r["positions"])
        for r in positional_postings(docs).collect()
    }
    got = _decode_all_positions(pos_seg)
    assert got == want


def test_merge_preserves_positions_byte_identical(pos_index):
    pre = merge_segments(build_segments(pos_index, store_positions=True))
    hier = merge_segments_hierarchical(
        build_segments(pos_index, store_positions=True), groups=3
    )

    def canon(s):
        return sorted(
            (r["term"], r["block_ord"], r["docs"], r["tfs"], r["dls"], r["poss"])
            for r in s.blocks.collect()
        )

    assert canon(pre) == canon(hier)


def test_bm25_index_blocks_have_empty_poss(pos_index):
    seg = merge_segments(build_segments(pos_index))  # store_positions off
    assert not seg.has_positions
    assert all(r["poss"] == b"" for r in seg.blocks.collect())


# ---------------------------------------------------------------------------
# phrase read path
# ---------------------------------------------------------------------------

PHRASES = [
    ("p_rep", "x7 x7"),
    ("p_pair", "hash join"),
    ("p_tri", "select where group"),
    ("p_miss", "zz_not_a_token qq_nope"),
]


def _phrase_fixture(spark):
    rows = [
        (0, "hash join beats sort merge hash join sometimes"),
        (1, "x7 x7 x7 repeated token run"),
        (2, "select where group by having select where group"),
        (3, "where group select nothing adjacent here"),
        (4, "join hash reversed order no match"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_store_matches_dataframe(spark):
    docs = _phrase_fixture(spark)
    seg = merge_segments(
        build_segments(
            index_from_postings(positional_postings_full(docs), CFG),
            store_positions=True,
        )
    )
    got = sorted(
        (r["qid"], r["docid"], r["n_occ"])
        for r in phrase_match_segments(seg, PHRASES).collect()
    )
    want = sorted(
        (r["qid"], r["docid"], r["n_occ"])
        for r in phrase_match_batch(positional_postings(docs), PHRASES).collect()
    )
    assert got == want
    # sanity anchors: overlapping repeat counts 2 starts in doc 1; the
    # absent phrase matches nothing
    as_map = {(q, d): n for q, d, n in got}
    assert as_map[("p_rep", 1)] == 2
    assert not any(q == "p_miss" for q, _, _ in got)


def test_phrase_store_matches_dataframe_on_corpus(docs, pos_seg):
    # hot-token bigrams (def/return/self appear in ~45% of positions) plus
    # a single-term phrase (n_occ == tf) and an absent one
    phrases = [
        ("c1", "def return"), ("c2", "self ("), ("c3", "def"),
        ("c4", "zz_never_a_token def"),
    ]
    got = sorted(
        map(tuple, phrase_match_segments(pos_seg, phrases).collect())
    )
    want = sorted(
        map(tuple, phrase_match_batch(positional_postings(docs), phrases).collect())
    )
    assert got == want
    assert len(got) > 0  # the fixture really exercises matches


def test_phrase_doc_layout_matches_term_layout(docs, pos_index, pos_seg):
    dseg = build_doc_partitioned_segments(
        pos_index, n_parts=4, store_positions=True
    )
    phrases = [("c1", "def return"), ("c2", "self (")]
    got = sorted(map(tuple, phrase_match_segments(dseg, phrases).collect()))
    want = sorted(map(tuple, phrase_match_segments(pos_seg, phrases).collect()))
    assert got == want


def test_phrase_requires_positions(pos_index):
    seg = merge_segments(build_segments(pos_index))
    with pytest.raises(ValueError, match="store_positions"):
        phrase_match_segments(seg, [("q", "a b")])


# ---------------------------------------------------------------------------
# threaded serving reader (head queries)
# ---------------------------------------------------------------------------

def test_threaded_reader_rank_identical(spark, tmp_path):
    """SegmentReader with a thread pool must return bit-identical results to
    the single-threaded reader AND to wand_topk, on hot, mixed, rare, and
    OOV queries."""
    from flagembedding_spark.operators.index_build import build_index
    from flagembedding_spark.operators.segments import save_segments
    from flagembedding_spark.operators.wand import wand_topk
    from flagembedding_spark.schemas import (
        distributed_synth_corpus_skewed,
        skewed_queries,
    )
    from flagembedding_spark.serving import SegmentReader

    corpus = distributed_synth_corpus_skewed(spark, 4000, partitions=8)
    idx = build_index(corpus, CFG)
    seg = merge_segments(build_segments(idx))
    root = str(tmp_path / "seg")
    save_segments(seg, root)
    r1 = SegmentReader(root, n_threads=1)
    rmt = SegmentReader(root, n_threads=4)
    queries = [q for _, q in skewed_queries(spark).collect()] + [
        "zz_oov_only", "def",
    ]
    qdf = spark.createDataFrame(
        [(f"q{i}", q) for i, q in enumerate(queries)],
        "query_id string, query string",
    )
    wand = {}
    for r in wand_topk(seg, qdf, k=10, use_wand="auto").collect():
        wand.setdefault(r["qid"], []).append(
            (r["rank"], r["docid"], round(r["score"], 9))
        )
    for i, q in enumerate(queries):
        a = [(r, d, round(s, 9)) for d, s, r in r1.topk(q, k=10)]
        b = [(r, d, round(s, 9)) for d, s, r in rmt.topk(q, k=10)]
        assert a == b, q
        assert b == sorted(wand.get(f"q{i}", [])), q


# ---------------------------------------------------------------------------
# proximity matching
# ---------------------------------------------------------------------------

def test_proximity_hand_checked(spark):
    from flagembedding_spark.operators.positions import (
        positional_postings,
        proximity_match_batch,
    )

    rows = [
        (0, "a x x b a b"),       # a@{0,4}, b@{3,5}
        (1, "a x x x x b"),       # distance 5
        (2, "c c x c"),           # same-term: pairs (0,1),(0,3),(1,3)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pos = positional_postings(docs)
    probes = [
        ("w3", "a", "b", 3),      # doc0: |0-3|, |4-3|, |4-5| → 3 pairs
        ("w5", "a", "b", 5),      # doc0: +|0-5|... pairs: 4; doc1: 1
        ("cc", "c", "c", 3),      # doc2: (0,1),(0,3),(1,3) → 3
        ("cc1", "c", "c", 1),     # doc2: (0,1) only
    ]
    got = {
        (r["qid"], r["docid"]): r["n_pairs"]
        for r in proximity_match_batch(pos, probes).collect()
    }
    assert got == {
        ("w3", 0): 3,
        ("w5", 0): 4,
        ("w5", 1): 1,
        ("cc", 2): 3,
        ("cc1", 2): 1,
    }


def test_proximity_store_matches_dataframe(spark, docs, pos_seg):
    from flagembedding_spark.operators.positions import (
        positional_postings,
        proximity_match_batch,
        proximity_match_segments,
    )

    probes = [
        ("p1", "def", "return", 3),
        ("p2", "self", "(", 1),
        ("p3", "def", "def", 5),          # same-term
        ("p4", "zz_nope", "def", 4),      # absent side
    ]
    got = sorted(
        map(tuple, proximity_match_segments(pos_seg, probes).collect())
    )
    want = sorted(
        map(
            tuple,
            proximity_match_batch(positional_postings(docs), probes).collect(),
        )
    )
    assert got == want
    assert len(got) > 0


def test_proximity_store_window_edge_cases(spark):
    """Positions near 0 (window clamps at the doc key base) and w=0."""
    from flagembedding_spark.operators.index_build import index_from_postings
    from flagembedding_spark.operators.positions import (
        positional_postings,
        positional_postings_full,
        proximity_match_batch,
        proximity_match_segments,
    )
    from flagembedding_spark.operators.segments import (
        build_segments,
        merge_segments,
    )

    rows = [
        (0, "b a x x x"),   # b@0, a@1 — pos−w underflows doc base
        (1, "a b"),
        (2, "x a x b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    seg = merge_segments(
        build_segments(
            index_from_postings(positional_postings_full(docs)),
            store_positions=True,
        )
    )
    probes = [("e1", "a", "b", 1), ("e2", "a", "b", 0), ("e3", "a", "b", 2)]
    got = sorted(map(tuple, proximity_match_segments(seg, probes).collect()))
    want = sorted(
        map(
            tuple,
            proximity_match_batch(positional_postings(docs), probes).collect(),
        )
    )
    assert got == want
    as_map = {(q, d): n for q, d, n in got}
    assert as_map[("e1", 0)] == 1 and as_map[("e1", 1)] == 1
    assert ("e2", 0) not in as_map  # w=0 can never match distinct terms


def test_serving_phrase_and_proximity_match_spark_path(spark, docs, pos_seg, tmp_path):
    """Spark-free point phrase/proximity queries from the persisted store ==
    the Spark batch operators, including guard on a positions-less store."""
    from flagembedding_spark.operators.positions import (
        phrase_match_segments,
        proximity_match_segments,
    )
    from flagembedding_spark.operators.segments import save_segments
    from flagembedding_spark.serving import SegmentReader

    root = str(tmp_path / "posseg")
    save_segments(pos_seg, root)
    rd = SegmentReader(root)

    for phrase in ("def return", "self (", "def", "zz_nope def"):
        got = rd.phrase(phrase)
        want = sorted(
            (r["docid"], r["n_occ"])
            for r in phrase_match_segments(pos_seg, [("q", phrase)]).collect()
        )
        assert got == want, phrase

    for a, b, w in (("def", "return", 3), ("def", "def", 5), ("zz_nope", "def", 2)):
        got = rd.proximity(a, b, w)
        want = sorted(
            (r["docid"], r["n_pairs"])
            for r in proximity_match_segments(
                pos_seg, [("q", a, b, w)]
            ).collect()
        )
        assert got == want, (a, b, w)

    # a BM25-only store refuses positional queries loudly
    from flagembedding_spark.operators.segments import (
        build_segments,
        merge_segments,
    )
    from flagembedding_spark.operators.index_build import index_from_postings
    from flagembedding_spark.operators.positions import positional_postings_full

    plain = merge_segments(
        build_segments(index_from_postings(positional_postings_full(docs)))
    )
    root2 = str(tmp_path / "plain")
    save_segments(plain, root2)
    rd2 = SegmentReader(root2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positions"):
        rd2.phrase("def return")


def test_positional_kernels_with_lineage_scale_docids(spark, tmp_path):
    """chunk-dense lineage docids (chunk·2^40 + i) overflowed the packed
    int64 key before the dense remap — phrase/proximity through the store
    AND the serving reader must return correct raw docids at that scale."""
    from flagembedding_spark.operators.index_build import index_from_postings
    from flagembedding_spark.operators.positions import (
        phrase_match_batch,
        phrase_match_segments,
        positional_postings,
        positional_postings_full,
        proximity_match_batch,
        proximity_match_segments,
    )
    from flagembedding_spark.operators.segments import (
        build_segments,
        merge_segments,
        save_segments,
    )
    from flagembedding_spark.serving import SegmentReader

    base = [(1 << 40) * (2 + i // 3) + i for i in range(9)]
    rows = [
        (base[i], "hash join beats sort merge hash join run " + f"t{i}")
        for i in range(9)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    seg = merge_segments(
        build_segments(
            index_from_postings(positional_postings_full(docs)),
            store_positions=True,
        )
    )
    phrases = [("p", "hash join")]
    probes = [("x", "hash", "merge", 4), ("y", "hash", "hash", 6)]
    pos = positional_postings(docs)
    assert sorted(map(tuple, phrase_match_segments(seg, phrases).collect())) == \
        sorted(map(tuple, phrase_match_batch(pos, phrases).collect()))
    assert sorted(map(tuple, proximity_match_segments(seg, probes).collect())) == \
        sorted(map(tuple, proximity_match_batch(pos, probes).collect()))

    root = str(tmp_path / "bigid")
    save_segments(seg, root)
    rd = SegmentReader(root)
    want = sorted(
        (r["docid"], r["n_occ"])
        for r in phrase_match_batch(pos, phrases).collect()
    )
    got = rd.phrase("hash join")
    assert got == want
    assert all(d > 1 << 40 for d, _ in got)  # raw ids round-trip
    wantp = sorted(
        (r["docid"], r["n_pairs"])
        for r in proximity_match_batch(pos, [("x", "hash", "merge", 4)]).collect()
    )
    assert rd.proximity("hash", "merge", 4) == wantp


# ---------------------------------------------------------------------------
# round 4: positions survive the merge_stores decode path; key-width guard
# ---------------------------------------------------------------------------

def test_merge_stores_decode_path_carries_positions(spark, tmp_path):
    """ADVICE r03: target_layout='doc' (the decode path) used to DROP poss
    streams silently. Two positional generations merged to the doc layout
    must answer phrase queries identically to the single-shot positional
    store."""
    from flagembedding_spark.operators.segments import (
        merge_stores,
        save_segments,
    )

    rows = [
        (0, "a b c a b"),
        (1, "b c d"),
        (2, "a b a b a b"),
        (3, "x y z a b"),
        (4, "c a b c"),
        (5, "q r s"),
    ]
    docs_df = spark.createDataFrame(rows, "doc_id long, text string")
    full_idx = index_from_postings(positional_postings_full(docs_df), CFG)
    full_seg = merge_segments(build_segments(full_idx, store_positions=True))
    want = sorted(
        map(tuple, phrase_match_segments(full_seg, [("p", "a b")]).collect())
    )

    import dataclasses

    from flagembedding_spark.operators.index_build import CorpusStats

    halves = []
    for pred in (F.col("docid") < 3, F.col("docid") >= 3):
        post = full_idx.postings.filter(pred)
        srow = (
            post.select("docid", "dl").distinct()
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
        half = dataclasses.replace(
            full_idx, postings=post, dictionary=dic,
            stats=CorpusStats(int(srow["n"]), float(srow["a"])),
        )
        halves.append(merge_segments(build_segments(half, store_positions=True)))

    r1, r2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    save_segments(halves[0], r1)
    save_segments(halves[1], r2)
    for layout in ("doc", "term"):
        merged = merge_stores(
            spark, [r1, r2], str(tmp_path / f"m_{layout}"),
            target_layout="doc",
        )
        assert merged.has_positions
        got = sorted(
            map(tuple, phrase_match_segments(merged, [("p", "a b")]).collect())
        )
        assert got == want, layout


def test_merge_stores_mixed_positions_warns(spark, tmp_path):
    """One generation positional, one not → decode-path merge warns and
    builds WITHOUT positions (never silently half-carries them)."""
    import warnings as _w

    from flagembedding_spark.operators.segments import (
        merge_stores,
        save_segments,
    )

    d1 = spark.createDataFrame([(0, "a b c"), (1, "b c a")], "doc_id long, text string")
    d2 = spark.createDataFrame([(10, "c d e"), (11, "d e c")], "doc_id long, text string")
    i1 = index_from_postings(positional_postings_full(d1), CFG)
    i2 = index_from_postings(positional_postings_full(d2), CFG)
    s1 = merge_segments(build_segments(i1, store_positions=True))
    s2 = build_doc_partitioned_segments(i2, n_parts=2)  # no positions
    r1, r2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    save_segments(s1, r1)
    save_segments(s2, r2)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        merged = merge_stores(spark, [r1, r2], target_layout="term")
    assert not merged.has_positions
    assert any("positions" in str(x.message) for x in rec)


def test_position_key_width_guard():
    """ADVICE r03: positions ≥ 2^22 would silently corrupt the packed
    intersection key — the guard must raise instead."""
    from flagembedding_spark.operators.positions import (
        _POS_KEY,
        check_position_bound,
    )

    ok = np.array([0, 5, _POS_KEY - 1], dtype=np.int64)
    assert check_position_bound(ok) is ok
    assert check_position_bound(np.empty(0, dtype=np.int64)).size == 0
    with pytest.raises(ValueError, match="2\\^22"):
        check_position_bound(np.array([3, _POS_KEY], dtype=np.int64))


def test_postings_from_segments_with_positions_roundtrip(docs, pos_seg):
    """postings_from_segments(with_positions=True) must reproduce the exact
    per-posting position lists the DataFrame operator computes."""
    from flagembedding_spark.operators.segments import postings_from_segments

    want = {
        (r["term"], int(r["docid"])): tuple(r["positions"])
        for r in positional_postings(docs).collect()
    }
    got = {
        (r["term"], int(r["docid"])): tuple(r["positions"])
        for r in postings_from_segments(pos_seg, with_positions=True).collect()
    }
    assert got == want
