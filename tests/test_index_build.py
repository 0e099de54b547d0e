"""Index-build aggregates vs brute-force Python on the tiny fixture corpus."""

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from flagembedding_spark.config import BM25Config
from flagembedding_spark.operators.index_build import (
    build_index,
    docid_expr,
    verify_content_sha,
)
from flagembedding_spark.schemas import synth_corpus_rows


@pytest.fixture(scope="module")
def index(tiny_corpus):
    return build_index(tiny_corpus, BM25Config())


@pytest.fixture(scope="module")
def brute():
    rows = synth_corpus_rows(200, seed=42)
    docs = {f"{r[0]}:{r[1]}@{r[2]}": r[4].split(" ") for r in rows}
    tf = {d: Counter(toks) for d, toks in docs.items()}
    df = defaultdict(int)
    for d, c in tf.items():
        for t in c:
            df[t] += 1
    dl = {d: len(toks) for d, toks in docs.items()}
    return docs, tf, dict(df), dl


def test_doc_ids_dense_insertion_order(index):
    """Arrow path: dense 0..N-1 ids in corpus insertion order — the
    reference's enumeration semantics (modeling_bm25.py:163)."""
    rows = index.doc_stats.select("docid", "docid_str").orderBy("docid").collect()
    ids = [r["docid"] for r in rows]
    assert ids == list(range(len(ids)))
    gen = synth_corpus_rows(200, seed=42)
    want = [f"{r[0]}:{r[1]}@{r[2]}" for r in gen]
    assert [r["docid_str"] for r in rows] == want


def test_sql_path_ids_dense_and_key_ordered(tiny_corpus):
    idx = build_index(tiny_corpus, BM25Config(), method="sql")
    rows = idx.doc_stats.select("docid", "docid_str").orderBy("docid").collect()
    ids = [r["docid"] for r in rows]
    assert ids == list(range(len(ids)))
    keys = [r["docid_str"] for r in rows]
    assert keys == sorted(keys)  # sql path: dense ids follow docid_str order


def test_arrow_and_sql_paths_build_identical_index(tiny_corpus):
    """Same (term, docid_str, tf, dl) postings and dictionary regardless of
    build path — only the docid numbering scheme differs."""
    a = build_index(tiny_corpus, BM25Config(), method="arrow")
    s = build_index(tiny_corpus, BM25Config(), method="sql")

    def canon(idx):
        id2s = {r["docid"]: r["docid_str"] for r in idx.doc_stats.collect()}
        return sorted(
            (r["term"], id2s[r["docid"]], r["tf"], r["dl"])
            for r in idx.postings.collect()
        )

    assert canon(a) == canon(s)
    da = {(r["term"], r["df"]) for r in a.dictionary.collect()}
    ds = {(r["term"], r["df"]) for r in s.dictionary.collect()}
    assert da == ds
    assert a.stats.n_docs == s.stats.n_docs
    assert abs(a.stats.avgdl - s.stats.avgdl) < 1e-9


def test_doc_lengths(index, brute):
    _, _, _, dl = brute
    got = {r["docid_str"]: r["dl"] for r in index.doc_stats.collect()}
    assert got == dl


def test_tf_postings(index, brute):
    _, tf, _, _ = brute
    id_map = {r["docid"]: r["docid_str"] for r in index.doc_stats.collect()}
    got = defaultdict(dict)
    for r in index.postings.collect():
        got[id_map[r["docid"]]][r["term"]] = r["tf"]
    want = {d: dict(c) for d, c in tf.items()}
    assert dict(got) == want


def test_df_dictionary(index, brute):
    _, _, df, _ = brute
    got = {r["term"]: r["df"] for r in index.dictionary.collect()}
    assert got == df


def test_corpus_stats(index, brute):
    _, _, _, dl = brute
    assert index.stats.n_docs == 200
    assert abs(index.stats.avgdl - sum(dl.values()) / len(dl)) < 1e-9


def test_postings_carry_dl(index, brute):
    _, _, _, dl = brute
    id_map = {r["docid"]: r["docid_str"] for r in index.doc_stats.collect()}
    bad = [
        r
        for r in index.postings.select("docid", "dl").distinct().collect()
        if dl[id_map[r["docid"]]] != r["dl"]
    ]
    assert not bad


def test_content_sha_invariant(index, tiny_corpus):
    assert verify_content_sha(index, tiny_corpus) == 0


def test_sha_detects_mutation(tiny_corpus):
    idx = build_index(tiny_corpus, BM25Config())
    mutated = tiny_corpus.withColumn(
        "content",
        F.when(F.col("path").contains("file_0."), F.lit("tampered")).otherwise(
            F.col("content")
        ),
    )
    assert verify_content_sha(idx, mutated) > 0


def test_stop_tokens_drop_from_postings_not_dl(tiny_corpus):
    cfg = BM25Config(stop_tokens=frozenset({"def", "("}))
    idx = build_index(tiny_corpus, cfg)
    terms = {r["term"] for r in idx.dictionary.select("term").collect()}
    assert "def" not in terms and "(" not in terms
    # dl unchanged vs unfiltered build
    base = build_index(tiny_corpus, BM25Config())
    a = {r["docid_str"]: r["dl"] for r in idx.doc_stats.collect()}
    b = {r["docid_str"]: r["dl"] for r in base.doc_stats.collect()}
    assert a == b


def test_docid_expr(tiny_corpus):
    row = tiny_corpus.select(docid_expr().alias("d"), "repo", "path", "commit").first()
    assert row["d"] == f"{row['repo']}:{row['path']}@{row['commit']}"


def test_docid_layout_drift_fails_loudly(tiny_corpus, monkeypatch):
    """If the counting pass and the map pass disagree on the partition
    layout, the build must raise — not silently assign colliding docids."""
    from flagembedding_spark.operators import arrow_postings as ap

    real = ap.partition_offsets

    def missing_pid(df):
        offsets, counts = real(df)
        # pretend the counting job never saw the last partition
        pid = max(counts)
        offsets.pop(pid)
        counts.pop(pid)
        return offsets, counts

    monkeypatch.setattr(ap, "partition_offsets", missing_pid)
    with pytest.raises(Exception, match="no offset from the counting pass"):
        build_index(tiny_corpus, BM25Config(), method="arrow").postings.count()

    def wrong_counts(df):
        offsets, counts = real(df)
        counts = {pid: c + 1 for pid, c in counts.items()}
        return offsets, counts

    monkeypatch.setattr(ap, "partition_offsets", wrong_counts)
    with pytest.raises(Exception, match="layout drift"):
        build_index(tiny_corpus, BM25Config(), method="arrow").postings.count()


def test_partition_counts_declaration(spark):
    """Declared per-partition counts (range_partition_counts) must match the
    counting job's ground truth for awkward (n, partitions) shapes, the
    declared-counts fast path must produce the identical index, and a WRONG
    declaration must fail loudly in the map stage (not mis-assign docids)."""
    from flagembedding_spark.operators.arrow_postings import partition_offsets
    from flagembedding_spark.schemas import (
        distributed_synth_corpus,
        range_partition_counts,
    )

    for n, p in ((100, 7), (1000, 16), (13, 16), (1, 3)):
        corpus = distributed_synth_corpus(spark, n, partitions=p)
        slim = corpus.select("path")
        _offs, counts = partition_offsets(slim)
        declared = {
            k: v for k, v in range_partition_counts(n, p).items() if v > 0
        }
        assert counts == declared, (n, p)

    # fast path == counting-job path, bit for bit
    cfg = BM25Config()
    corpus = distributed_synth_corpus(spark, 200, partitions=7)
    fast = build_index(corpus, cfg, cache=False)
    corpus2 = distributed_synth_corpus(spark, 200, partitions=7)
    del corpus2._fes_partition_counts
    slow = build_index(corpus2, cfg, cache=False)
    key = lambda df: sorted(  # noqa: E731
        (r["term"], r["docid"], r["tf"], r["dl"])
        for r in df.postings.collect()
    )
    assert key(fast) == key(slow)
    assert sorted(r["docid"] for r in fast.doc_stats.collect()) == sorted(
        r["docid"] for r in slow.doc_stats.collect()
    )

    # wrong declaration → loud failure
    bad = distributed_synth_corpus(spark, 200, partitions=7)
    bad._fes_partition_counts = {0: 200}
    with pytest.raises(Exception, match="docid assignment"):
        build_index(bad, cfg, cache=False).postings.count()
