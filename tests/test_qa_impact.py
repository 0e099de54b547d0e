import math

from flagembedding_spark.config import BM25Config
from flagembedding_spark.operators.index_build import (
    build_index,
    impact_postings,
    length_sorted,
)
from flagembedding_spark.operators.qa import (
    answer_containment,
    qa_recall_at_k,
    with_instruction,
)


def test_answer_containment_whole_token(spark):
    corpus = spark.createDataFrame(
        [(1, "the spark engine runs"), (2, "sparkly things"), (3, "no match")],
        ["doc_id", "text"],
    )
    run = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3)], ["qid", "docid", "rank"]
    )
    ans = spark.createDataFrame([("q1", "spark")], ["qid", "answer"])
    got = {r["docid"]: r["contains"] for r in
           answer_containment(run, ans, corpus).collect()}
    # whole-token: 'sparkly' must NOT match 'spark'
    assert got == {1: 1, 2: 0, 3: 0}


def test_qa_recall(spark):
    cont = spark.createDataFrame(
        [("q1", 1, 1, 0), ("q1", 2, 2, 1), ("q2", 3, 1, 0), ("q2", 4, 5, 0)],
        ["qid", "docid", "rank", "contains"],
    )
    got = {r["k"]: r["value"] for r in qa_recall_at_k(cont, [1, 2]).collect()}
    assert got == {1: 0.0, 2: 0.5}


def test_with_instruction(spark):
    q = spark.createDataFrame([("q1", "find this")], ["query_id", "query"])
    row = with_instruction(q, "Represent: ").first()
    assert row["query"] == "Represent: find this"


def test_impact_postings_quantization(spark, tiny_corpus):
    idx = build_index(tiny_corpus, BM25Config(k1=1.2, b=0.75))
    imp = impact_postings(idx, quantize=100)
    rows = imp.limit(200).collect()
    avgdl = idx.stats.avgdl
    post = {(r["term"], r["docid"]): (r["tf"], r["dl"]) for r in idx.postings.collect()}
    for r in rows:
        tf, dl = post[(r["term"], r["docid"])]
        tfn = tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        assert r["impact"] == math.ceil(tfn * 100)
        assert 1 <= r["impact"] <= 100


def test_length_sorted_partition_local(spark):
    df = spark.createDataFrame(
        [(i, "x" * ((i * 37) % 100 + 1)) for i in range(100)], ["id", "content"]
    ).repartition(2)
    out = length_sorted(df)
    # same rows, no shuffle: partition count unchanged
    assert out.rdd.getNumPartitions() == 2
    assert out.count() == 100
    # lengths non-decreasing within each partition
    parts = out.rdd.glom().collect()
    for p in parts:
        lens = [len(r["content"]) for r in p]
        assert lens == sorted(lens)


def test_impact_query_expansion_semantics(spark):
    """Token repeated ceil(w·quantize) times, sorted by term; a query whose
    expansion is empty becomes the literal '0'
    (step0-encode_query-and-corpus.py:143-166)."""
    from flagembedding_spark.operators.index_build import expand_impact_queries

    qw = spark.createDataFrame(
        [("q1", "beta", 0.5), ("q1", "alfa", 0.25), ("q2", "x", 0.0)],
        ["qid", "term", "weight"],
    )
    rows = {r["qid"]: r["query"]
            for r in expand_impact_queries(qw, quantize=4).collect()}
    assert rows["q1"] == "alfa beta beta"
    assert rows["q2"] == "0"


def test_impact_topk_integer_scoring(spark, tiny_corpus):
    """Σ qtf·impact with integer arithmetic; rank ties broken by docid."""
    from flagembedding_spark.config import BM25Config
    from flagembedding_spark.operators.index_build import (
        build_index,
        impact_postings,
        impact_topk,
    )

    idx = build_index(tiny_corpus, BM25Config())
    imps = impact_postings(idx)
    queries = spark.createDataFrame(
        [("q1", "def def import"), ("q2", "zz_oov")], ["qid", "query"]
    )
    got = impact_topk(imps, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r)
    assert "q2" not in by_q  # OOV query scores nothing
    # brute-force check for q1
    imp = {(r["term"], r["docid"]): r["impact"] for r in imps.collect()}
    scores = {}
    for (t, d), v in imp.items():
        w = {"def": 2, "import": 1}.get(t, 0)
        if w:
            scores[d] = scores.get(d, 0) + w * v
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["docid"], r["score"]) for r in
            sorted(by_q["q1"], key=lambda r: r["rank"])] == want
