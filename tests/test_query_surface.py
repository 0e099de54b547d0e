"""Round-5 Lucene query-surface operators: MUST_NOT, term boosts,
field collapsing, facet counts, ClassicSimilarity, spell suggest."""

import math

import pytest
from pyspark.sql import functions as F

from flagembedding_spark.config import BM25Config
from flagembedding_spark.operators.index_build import build_index
from flagembedding_spark.operators.query import (
    bm25_topk,
    boosted_query_terms,
)

CFG = BM25Config(k1=1.2, b=0.75)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "alpha beta gamma", "py"),
            (1, "alpha alpha delta", "py"),
            (2, "beta delta epsilon", "go"),
            (3, "alpha beta beta table", "go"),
            (4, "gamma delta table", "rs"),
        ],
        ["doc_id", "text", "lang"],
    ).cache()


@pytest.fixture(scope="module")
def index(docs):
    return build_index(docs, CFG, content_col="text", docid_long="doc_id")


def _rows(df):
    return {
        (r["qid"], int(r["docid"])): (float(r["score"]), int(r["rank"]))
        for r in df.collect()
    }


def test_boosted_query_terms_parse(spark):
    qdf = spark.createDataFrame(
        [("q1", "a^2 b a"), ("q2", "c^0.5"), ("q3", "plain")],
        ["query_id", "query"],
    )
    qterms, boosts = boosted_query_terms(qdf)
    b = {(r["qid"], r["term"]): float(r["boost"]) for r in boosts.collect()}
    # duplicate occurrences sum their boosts: a^2 + a → 3.0
    assert b == {("q1", "a"): 3.0, ("q1", "b"): 1.0, ("q2", "c"): 0.5,
                 ("q3", "plain"): 1.0}
    qt = {(r["qid"], r["term"]): int(r["qtf"]) for r in qterms.collect()}
    assert all(v == 1 for v in qt.values())  # qtf folded into the boost sum


def test_boost_one_is_identity(spark, index):
    qdf = spark.createDataFrame(
        [("q1", "alpha beta"), ("q2", "delta delta gamma")],
        ["query_id", "query"],
    )
    want = _rows(bm25_topk(index, qdf, k=5))
    qterms, boosts = boosted_query_terms(qdf)
    got = _rows(bm25_topk(index, qdf, k=5, qterms=qterms, boosts=boosts))
    for key, (score, rank) in want.items():
        assert got[key][0] == pytest.approx(score, rel=1e-12)
        assert got[key][1] == rank


def test_boost_scales_term_contribution(spark, index):
    plain = spark.createDataFrame([("q", "alpha gamma")],
                                  ["query_id", "query"])
    boosted = spark.createDataFrame([("q", "alpha^2 gamma")],
                                    ["query_id", "query"])
    qterms, boosts = boosted_query_terms(boosted)
    got = _rows(bm25_topk(index, boosted, k=5, qterms=qterms, boosts=boosts))
    base = _rows(bm25_topk(index, plain, k=5))
    # recompute expected: doubled alpha partial + unchanged gamma partial.
    # doc 1 (alpha-only match): exactly 2× its plain score.
    assert got[("q", 1)][0] == pytest.approx(2 * base[("q", 1)][0], rel=1e-12)


def test_must_not_removes_and_never_rescores(spark, index, docs):
    qdf = spark.createDataFrame([("q1", "alpha delta")],
                                ["query_id", "query"])
    nt = spark.createDataFrame([("q1", "table")], ["qid", "term"])
    plain = _rows(bm25_topk(index, qdf, k=5))
    got = _rows(bm25_topk(index, qdf, k=5, must_not=nt))
    # docs 3 and 4 contain 'table' → gone; doc 0,1,2 survive, scores intact
    surviving = {d for (_, d) in got}
    assert surviving == {0, 1, 2}
    for key, (score, _) in got.items():
        assert score == pytest.approx(plain[key][0], rel=1e-12)
    # rank re-densifies 1..n
    assert sorted(r for _, r in got.values()) == [1, 2, 3]


def test_collapse_topk(spark, index, docs):
    from flagembedding_spark.operators.grouping import collapse_topk

    qdf = spark.createDataFrame([("q1", "alpha beta delta")],
                                ["query_id", "query"])
    meta = docs.select(F.col("doc_id").alias("docid"), "lang")
    got = collapse_topk(index, qdf, meta, "lang", k=10).collect()
    langs = [r["group"] for r in got]
    assert sorted(langs) == sorted(set(langs))  # one hit per group
    # each group's winner beats every other candidate of that group
    full = _rows(bm25_topk(index, qdf, k=10))
    lang_of = {int(r["doc_id"]): r["lang"] for r in docs.collect()}
    for r in got:
        g, s = r["group"], float(r["score"])
        for (_, d), (score, _) in full.items():
            if lang_of[d] == g:
                assert (score, -d) <= (s + 1e-12, -int(r["docid"]) + 1e-12) or \
                    score <= s + 1e-9
    # ranks dense over groups
    assert sorted(int(r["rank"]) for r in got) == list(range(1, len(got) + 1))


def test_facet_counts(spark, index, docs):
    from flagembedding_spark.operators.grouping import facet_counts

    qdf = spark.createDataFrame([("q1", "alpha"), ("q2", "epsilon")],
                                ["query_id", "query"])
    meta = docs.select(F.col("doc_id").alias("docid"), "lang")
    got = {
        (r["qid"], r["facet"]): int(r["n_docs"])
        for r in facet_counts(index, qdf, meta, "lang").collect()
    }
    # alpha in docs 0,1 (py) and 3 (go); epsilon in doc 2 (go)
    assert got == {("q1", "py"): 2, ("q1", "go"): 1, ("q2", "go"): 1}


def test_tfidf_classic_hand_computed(spark, index):
    from flagembedding_spark.operators.tfidf import classic_idf, tfidf_topk

    qdf = spark.createDataFrame([("q1", "alpha beta")],
                                ["query_id", "query"])
    got = _rows(tfidf_topk(index, qdf, k=5))
    n = 5
    idf_a = classic_idf(n, 3)  # alpha df=3
    idf_b = classic_idf(n, 3)  # beta df=3
    # doc 3 = "alpha beta beta table": dl=4, tf_a=1 tf_b=2, both matched
    want3 = (2 / 2) * (
        idf_a ** 2 * math.sqrt(1) / math.sqrt(4)
        + idf_b ** 2 * math.sqrt(2) / math.sqrt(4)
    )
    assert got[("q1", 3)][0] == pytest.approx(want3, rel=1e-9)
    # doc 1 = "alpha alpha delta": dl=3, tf_a=2, coord 1/2
    want1 = (1 / 2) * (idf_a ** 2 * math.sqrt(2) / math.sqrt(3))
    assert got[("q1", 1)][0] == pytest.approx(want1, rel=1e-9)


def test_spell_suggest(spark, index):
    from flagembedding_spark.operators.termquery import spell_suggest

    tdf = spark.createDataFrame(
        [("s1", "alpa"), ("s2", "beta"), ("s3", "alpa"), ("s3", "bta")],
        ["query_id", "qterm"],
    )
    got = [
        (r["qid"], r["qterm"], r["suggestion"], int(r["df"]), int(r["rank"]))
        for r in spell_suggest(index, tdf, max_edits=1, n_suggest=5).collect()
    ]
    s1 = [g for g in got if g[0] == "s1"]
    assert [g[2] for g in s1] == ["alpha"]  # 1 edit
    s2 = [g[2] for g in got if g[0] == "s2"]
    assert "beta" not in s2  # exact term excluded
    assert "delta" not in s2  # 2 edits > max_edits=1
    # per-term windows: a multi-misspelling query ranks each term's
    # suggestions independently (rank restarts at 1 per qterm)
    s3 = {(g[1], g[2]): g[4] for g in got if g[0] == "s3"}
    assert s3[("alpa", "alpha")] == 1
    assert s3[("bta", "beta")] == 1


def test_wand_must_not_matches_dataframe(spark, index, docs):
    """MUST_NOT on the segment path (w=0 streams → per-query drop set)
    must match the DataFrame engine in both layouts, compose with
    min_should_match, and obey MUST_NOT precedence for a term that is
    both scored and prohibited."""
    from flagembedding_spark.operators.segments import (
        build_doc_partitioned_segments,
        build_segments,
        merge_segments,
    )
    from flagembedding_spark.operators.wand import wand_topk

    seg = merge_segments(build_segments(index))
    dseg = build_doc_partitioned_segments(index, n_parts=3)
    qdf = spark.createDataFrame(
        [("q1", "alpha delta"), ("q2", "beta gamma")],
        ["query_id", "query"],
    )
    nt = spark.createDataFrame([("q1", "table"), ("q2", "epsilon")],
                               ["qid", "term"])

    def rows(df):
        return sorted(
            (r["qid"], int(r["docid"]), round(float(r["score"]), 6),
             int(r["rank"]))
            for r in df.collect()
        )

    want = rows(bm25_topk(index, qdf, k=5, must_not=nt))
    assert want  # non-vacuous
    got = rows(wand_topk(seg, qdf, k=5, must_not=nt))
    assert got == want
    got_doc = rows(wand_topk(dseg, qdf, k=5, must_not=nt))
    assert got_doc == want
    # compose with min_should_match (conjunctive kernel must not count
    # the w=0 marker streams as matches)
    want_m = rows(bm25_topk(index, qdf, k=5, must_not=nt,
                            min_should_match=2))
    got_m = rows(wand_topk(seg, qdf, k=5, must_not=nt, min_should_match=2))
    assert got_m == want_m
    # MUST_NOT precedence: 'alpha' both scored and prohibited → only docs
    # without alpha can appear, scored by delta alone
    nt2 = spark.createDataFrame([("q1", "alpha")], ["qid", "term"])
    want_p = rows(bm25_topk(index, qdf.filter("query_id='q1'"), k=5,
                            must_not=nt2))
    got_p = rows(wand_topk(seg, qdf.filter("query_id='q1'"), k=5,
                           must_not=nt2))
    assert got_p == want_p
    assert all(d in (2, 4) for _, d, _, _ in got_p)  # alpha docs 0,1,3 gone
    import pytest as _pt

    with _pt.raises(ValueError, match="two_phase"):
        wand_topk(seg, qdf, k=5, two_phase=True, must_not=nt)


def test_serving_must_not_matches_wand(spark, index, tmp_path):
    from flagembedding_spark.operators.segments import (
        build_segments,
        merge_segments,
        save_segments,
    )
    from flagembedding_spark.operators.wand import wand_topk
    from flagembedding_spark.serving import SegmentReader

    seg = merge_segments(build_segments(index))
    root = str(tmp_path / "store")
    save_segments(seg, root)
    rd = SegmentReader(root, n_threads=1)
    qdf = spark.createDataFrame([("q1", "alpha delta")],
                                ["query_id", "query"])
    nt = spark.createDataFrame([("q1", "table")], ["qid", "term"])
    want = sorted(
        (int(r["docid"]), round(float(r["score"]), 6), int(r["rank"]))
        for r in wand_topk(seg, qdf, k=5, must_not=nt).collect()
    )
    assert want
    got = sorted(
        (d, round(s, 6), r)
        for d, s, r in rd.topk("alpha delta", k=5, must_not=["table"])
    )
    assert got == want
    # MUST_NOT precedence + msm composition
    got_p = rd.topk("alpha delta", k=5, must_not=["alpha"])
    assert all(d in (2, 4) for d, _, _ in got_p)
    got_m = rd.topk("alpha delta", k=5, must_not=["table"],
                    min_should_match=2)
    want_m = sorted(
        (int(r["docid"]), round(float(r["score"]), 6), int(r["rank"]))
        for r in wand_topk(seg, qdf, k=5, must_not=nt,
                           min_should_match=2).collect()
    )
    assert sorted((d, round(s, 6), r) for d, s, r in got_m) == want_m


def test_wand_boosts_match_dataframe(spark, index):
    """Boosted qterms on the segment path (w scaled by boost; all kernel
    bounds derive from w, so pruning stays safe) must match the DataFrame
    engine in every mode; zero-boost streams drop without being mistaken
    for MUST_NOT markers."""
    from flagembedding_spark.operators.segments import (
        build_segments,
        merge_segments,
    )
    from flagembedding_spark.operators.wand import wand_topk

    seg = merge_segments(build_segments(index))
    qdf = spark.createDataFrame(
        [("q1", "alpha^3 delta"), ("q2", "beta gamma^0.25")],
        ["query_id", "query"],
    )
    qterms, boosts = boosted_query_terms(qdf)
    qt_boosted = qterms.join(boosts, ["qid", "term"])

    def rows(df):
        return sorted(
            (r["qid"], int(r["docid"]), round(float(r["score"]), 6),
             int(r["rank"]))
            for r in df.collect()
        )

    want = rows(bm25_topk(index, qdf, k=5, qterms=qterms, boosts=boosts))
    assert want
    for mode in ("auto", "exact", "pruned"):
        got = rows(wand_topk(seg, qdf, k=5, qterms=qt_boosted,
                             use_wand=mode))
        assert got == want, mode
    # zero boost == term absent (not a MUST_NOT marker)
    qz = spark.createDataFrame([("q1", "alpha^0 delta")],
                               ["query_id", "query"])
    qt0, b0 = boosted_query_terms(qz)
    got0 = rows(wand_topk(seg, qz, k=5, qterms=qt0.join(b0, ["qid", "term"])))
    plain = spark.createDataFrame([("q1", "delta")], ["query_id", "query"])
    assert got0 == rows(wand_topk(seg, plain, k=5))
    # boost composes with must_not on the segment path
    nt = spark.createDataFrame([("q1", "table")], ["qid", "term"])
    want_n = rows(bm25_topk(index, qdf.filter("query_id='q1'"), k=5,
                            qterms=qterms, boosts=boosts, must_not=nt))
    got_n = rows(wand_topk(seg, qdf.filter("query_id='q1'"), k=5,
                           qterms=qt_boosted, must_not=nt))
    assert got_n == want_n


def test_serving_include_filter_matches_wand(spark, index, tmp_path):
    from flagembedding_spark.operators.segments import (
        build_segments,
        merge_segments,
        save_segments,
    )
    from flagembedding_spark.operators.wand import wand_topk
    from flagembedding_spark.serving import SegmentReader

    seg = merge_segments(build_segments(index))
    root = str(tmp_path / "store")
    save_segments(seg, root)
    rd = SegmentReader(root, n_threads=1)
    qdf = spark.createDataFrame([("q1", "alpha delta")],
                                ["query_id", "query"])
    keep = [0, 2, 4]
    keep_df = spark.createDataFrame([(d,) for d in keep], ["docid"])
    want = sorted(
        (int(r["docid"]), round(float(r["score"]), 6), int(r["rank"]))
        for r in wand_topk(seg, qdf, k=5, include_docids=keep_df).collect()
    )
    assert want
    got = sorted(
        (d, round(s, 6), r)
        for d, s, r in rd.topk("alpha delta", k=5, include_docids=keep)
    )
    assert got == want
    assert all(d in keep for d, _, _ in got)
    # composes with must_not: include {0,2,4} minus docs containing gamma
    got2 = rd.topk("alpha delta", k=5, include_docids=keep,
                   must_not=["gamma"])
    assert all(d == 2 for d, _, _ in got2)  # doc0,4 contain gamma


def test_must_not_precedence_msm_cross_engine(spark, index):
    """Review r5: a term both scored and prohibited, combined with
    min_should_match='all' — both engines must apply MUST_NOT precedence
    BEFORE the required-count (the prohibited term is not requirable),
    so survivors matching every remaining term are returned."""
    from flagembedding_spark.operators.segments import (
        build_segments,
        merge_segments,
    )
    from flagembedding_spark.operators.wand import wand_topk

    seg = merge_segments(build_segments(index))
    qdf = spark.createDataFrame([("q1", "alpha delta")],
                                ["query_id", "query"])
    nt = spark.createDataFrame([("q1", "alpha")], ["qid", "term"])

    def rows(df):
        return sorted(
            (r["qid"], int(r["docid"]), round(float(r["score"]), 6),
             int(r["rank"]))
            for r in df.collect()
        )

    want = rows(bm25_topk(index, qdf, k=5, must_not=nt,
                          min_should_match="all"))
    got = rows(wand_topk(seg, qdf, k=5, must_not=nt,
                         min_should_match="all"))
    # docs 2 ('beta delta epsilon') and 4 ('gamma delta table') contain
    # delta and not alpha — both engines must return exactly those
    assert {d for _, d, _, _ in want} == {2, 4}
    assert got == want


def test_zero_boost_msm_cross_engine(spark, index):
    """Review r5: boost == 0 means the term is ABSENT on every engine —
    no zero-score candidates, not a requirable match under
    min_should_match='all'."""
    from flagembedding_spark.operators.segments import (
        build_segments,
        merge_segments,
    )
    from flagembedding_spark.operators.wand import wand_topk

    seg = merge_segments(build_segments(index))
    qdf = spark.createDataFrame([("q1", "alpha^0 delta")],
                                ["query_id", "query"])
    qterms, boosts = boosted_query_terms(qdf)

    def rows(df):
        return sorted(
            (r["qid"], int(r["docid"]), round(float(r["score"]), 6),
             int(r["rank"]))
            for r in df.collect()
        )

    # plain disjunctive: alpha-only docs must NOT appear as 0-score rows
    df_plain = rows(bm25_topk(index, qdf, k=5, qterms=qterms, boosts=boosts))
    wd_plain = rows(wand_topk(seg, qdf, k=5,
                              qterms=qterms.join(boosts, ["qid", "term"])))
    delta_docs = {1, 2, 4}
    assert {d for _, d, _, _ in df_plain} == delta_docs
    assert df_plain == wd_plain
    # msm='all': required = {delta} only → all delta docs qualify
    df_all = rows(bm25_topk(index, qdf, k=5, qterms=qterms, boosts=boosts,
                            min_should_match="all"))
    wd_all = rows(wand_topk(seg, qdf, k=5,
                            qterms=qterms.join(boosts, ["qid", "term"]),
                            min_should_match="all"))
    assert {d for _, d, _, _ in df_all} == delta_docs
    assert df_all == wd_all


def test_docid_bitmap_union_accepts_bitmap(tmp_path):
    from flagembedding_spark.operators.deletes import (
        DocidBitmap,
        load_tombstones,
        write_tombstones,
    )

    a = DocidBitmap.from_array([1, 5, 9])
    b = DocidBitmap.from_array([5, 7])
    u = a.union(b)
    assert u.tolist() == [1, 5, 7, 9]
    root = str(tmp_path)
    write_tombstones(root, [1, 2])
    merged = write_tombstones(root, DocidBitmap.from_array([2, 3]))
    assert merged.tolist() == [1, 2, 3]
    assert load_tombstones(root).tolist() == [1, 2, 3]


def test_filter_layout_matches_include_docids(spark, index, docs, tmp_path):
    """Tier-3 filter (materialized per-value sub-store, operators/layout)
    must be rank- AND score-identical to tier-2 (in-kernel include mask
    over the full store): global stats preserved, filter never rescores.
    The serving reader on the sub-store inherits the filter for free."""
    from flagembedding_spark.operators.layout import (
        build_filter_partitioned_store,
        load_filtered_store,
    )
    from flagembedding_spark.operators.segments import (
        build_segments,
        merge_segments,
    )
    from flagembedding_spark.operators.wand import wand_topk
    from flagembedding_spark.serving import SegmentReader

    root = str(tmp_path / "part_store")
    meta = docs.select(F.col("doc_id").alias("docid"), "lang")
    vals = build_filter_partitioned_store(index, meta, "lang", root)
    assert set(vals) == {"py", "go", "rs"}
    full = merge_segments(build_segments(index))
    qdf = spark.createDataFrame([("q1", "alpha beta delta")],
                                ["query_id", "query"])

    def rows(df):
        return sorted(
            (r["qid"], int(r["docid"]), round(float(r["score"]), 6),
             int(r["rank"]))
            for r in df.collect()
        )

    for lang in ("py", "go"):
        keep = docs.filter(F.col("lang") == lang).select(
            F.col("doc_id").alias("docid")
        )
        want = rows(wand_topk(full, qdf, k=5, include_docids=keep))
        assert want  # non-vacuous
        sub = load_filtered_store(spark, root, "lang", lang)
        assert sub.stats.n_docs == index.stats.n_docs  # GLOBAL stats
        got = rows(wand_topk(sub, qdf, k=5))
        assert got == want
        # Spark-free reader on the sub-store: same implicit filter
        rd = SegmentReader(f"{root}/lang={lang}", n_threads=1)
        served = sorted(
            ("q1", d, round(s, 6), r)
            for d, s, r in rd.topk("alpha beta delta", k=5)
        )
        assert served == want
