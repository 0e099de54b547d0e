"""Metric operators vs hand-computed values; fusion / rerank-pairs /
hard-negative mining semantics."""

import math

import pytest
from pyspark.sql import functions as F

from flagembedding_spark.operators.hybrid import (
    fuse_runs,
    mine_hard_negatives,
    rerank_pairs,
)
from flagembedding_spark.operators.metrics import ir_metrics


@pytest.fixture(scope="module")
def run(spark):
    # two queries; scores descending by construction
    rows = [
        ("q1", "d1", 5.0), ("q1", "d2", 4.0), ("q1", "d3", 3.0), ("q1", "d4", 2.0),
        ("q2", "d5", 9.0), ("q2", "d1", 8.0), ("q2", "d6", 7.0),
    ]
    return spark.createDataFrame(rows, ["qid", "docid", "score"])


@pytest.fixture(scope="module")
def qrels(spark):
    rows = [
        ("q1", "d2", 2), ("q1", "d9", 1),            # d2 hit at rank 2; d9 missed
        ("q2", "d5", 3), ("q2", "d6", 1), ("q2", "d7", 2),  # hits at 1 and 3
    ]
    return spark.createDataFrame(rows, ["qid", "docid", "relevance"])


def test_ir_metrics_hand_checked(run, qrels):
    got = {
        (r["metric"], r["k"]): r["value"]
        for r in ir_metrics(run, qrels, k_values=[3]).collect()
    }
    # MRR@3: q1 first hit rank2 -> 0.5 ; q2 rank1 -> 1.0 ; mean 0.75
    assert got[("mrr", 3)] == 0.75
    # Recall@3: q1 1/2 ; q2 2/3 ; mean = (0.5 + 0.666667)/2 = 0.58333
    assert abs(got[("recall", 3)] - round((0.5 + 2 / 3) / 2, 5)) < 1e-9
    # R_cap@3: denominators min(2,3)=2 and min(3,3)=3 — same as recall here
    assert got[("r_cap", 3)] == got[("recall", 3)]
    # precision@3: q1 1/3, q2 2/3 -> 0.5
    assert got[("precision", 3)] == 0.5
    # nDCG@3 (linear gain, log2(rank+1) discount):
    dcg1 = 2 / math.log2(3)
    idcg1 = 2 / math.log2(2) + 1 / math.log2(3)
    dcg2 = 3 / math.log2(2) + 1 / math.log2(4)
    idcg2 = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    want = round((dcg1 / idcg1 + dcg2 / idcg2) / 2, 5)
    assert abs(got[("ndcg", 3)] - want) < 1e-9
    # MAP@3 (trec_eval map_cut): q1 AP = (1/2)/2 = 0.25 ;
    # q2 AP = (1/1 + 2/3)/3 = 0.555556 ; mean = 0.40278
    want_map = round(((1 / 2) / 2 + (1 + 2 / 3) / 3) / 2, 5)
    assert abs(got[("map", 3)] - want_map) < 1e-9


def test_ir_metrics_k1(run, qrels):
    got = {
        (r["metric"], r["k"]): r["value"]
        for r in ir_metrics(run, qrels, k_values=[1]).collect()
    }
    assert got[("mrr", 1)] == 0.5       # only q2 hits at rank 1
    assert got[("precision", 1)] == 0.5
    assert got[("r_cap", 1)] == 0.5     # q1: 0/min(2,1); q2: 1/min(3,1)


def test_fuse_runs(spark):
    a = spark.createDataFrame(
        [("q1", "d1", 10000.0), ("q1", "d2", 5000.0)], ["qid", "docid", "score"]
    )
    b = spark.createDataFrame(
        [("q1", "d2", 0.9), ("q1", "d3", 0.8)], ["qid", "docid", "score"]
    )
    got = {
        r["docid"]: (r["score"], r["rank"])
        for r in fuse_runs(a, b, w_a=0.3, w_b=0.7, scale_a=10000.0, k=10).collect()
    }
    # d1: 1.0*0.3 = 0.3 ; d2: 0.5*0.3 + 0.9*0.7 = 0.78 ; d3: 0.8*0.7 = 0.56
    assert abs(got["d2"][0] - 0.78) < 1e-12 and got["d2"][1] == 1
    assert abs(got["d3"][0] - 0.56) < 1e-12 and got["d3"][1] == 2
    assert abs(got["d1"][0] - 0.30) < 1e-12 and got["d1"][1] == 3


def test_rerank_pairs(spark, run):
    queries = spark.createDataFrame(
        [("q1", "alpha query"), ("q2", "beta query")], ["query_id", "query"]
    )
    corpus = spark.createDataFrame(
        [(f"d{i}", f"text {i}") for i in range(1, 10)], ["docid", "text"]
    )
    got = rerank_pairs(run, queries, corpus, rerank_top_k=2).collect()
    assert len(got) == 4  # 2 per query
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["docid"], r["query"], r["text"]))
    assert sorted(by_q["q1"])[0] == (1, "d1", "alpha query", "text 1")
    assert sorted(by_q["q2"])[0] == (1, "d5", "beta query", "text 5")


def test_mine_hard_negatives(spark):
    rows = [("q1", f"d{i}", 100.0 - i) for i in range(1, 31)]
    run = spark.createDataFrame(rows, ["qid", "docid", "score"])
    pos = spark.createDataFrame([("q1", "d12"), ("q1", "d15")], ["qid", "docid"])
    got = mine_hard_negatives(run, pos, range_start=10, range_end=25, n_negatives=5)
    rows = got.collect()
    assert len(rows) == 5
    for r in rows:
        assert 10 <= r["rank"] < 25
        assert r["docid"] not in ("d12", "d15")
    # deterministic across invocations
    again = mine_hard_negatives(run, pos, range_start=10, range_end=25, n_negatives=5)
    assert sorted(r["docid"] for r in rows) == sorted(r["docid"] for r in again.collect())


def test_retrieval_metrics_binary_matches_reference(spark):
    """Execute the reference RetrievalMetric.{mrr,recall,ndcg} closures
    (AST-extracted — the module's heavyweight imports stay out) on a small
    fixture and compare with the Spark operator."""
    import ast
    import inspect as _inspect
    import logging as _logging

    import numpy as np

    from flagembedding_spark.operators.metrics import retrieval_metrics_binary

    src = open(
        "/root/reference/research/llm_embedder/src/retrieval/metrics.py"
    ).read()
    tree = ast.parse(src)
    cls = next(
        n for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name == "RetrievalMetric"
    )
    keep = {"_clean_pred", "mrr", "recall", "ndcg"}
    cls.body = [
        n for n in cls.body
        if isinstance(n, ast.FunctionDef) and n.name in keep
    ]
    mod = ast.Module(body=[cls], type_ignores=[])
    ns = {
        "np": np, "inspect": _inspect,
        "logger": _logging.getLogger("ref_metrics"),
    }
    exec(compile(ast.fix_missing_locations(mod), "<ref>", "exec"), ns)
    RM = ns["RetrievalMetric"]

    labels = {"q1": [3, 7, 9], "q2": [1], "q3": [2, 4]}
    preds = {
        "q1": [5, 7, 3, -1, -1],   # first hit rank 2
        "q2": [9, 8, 6, 5, 2],     # no hit
        "q3": [2, 4, 1, 0, 6],     # hits at 1, 2
    }
    qids = sorted(preds)
    cutoffs = [1, 3, 5]
    want = {}
    for fn in (RM.mrr, RM.recall, RM.ndcg):
        want.update(
            fn(cutoffs=cutoffs)(qids, [preds[q] for q in qids], labels=labels)
        )

    res = spark.createDataFrame(
        [
            (q, d, r + 1)
            for q, ds in preds.items()
            for r, d in enumerate(ds) if d != -1
        ],
        "qid string, docid long, rank int",
    )
    lab = spark.createDataFrame(
        [(q, d) for q, ds in labels.items() for d in ds],
        "qid string, docid long",
    )
    got = {
        f"{r['metric']}@{r['k']}": r["value"]
        for r in retrieval_metrics_binary(res, lab, k_values=cutoffs).collect()
    }
    for key, v in want.items():
        assert abs(got[key] - v) < 5e-6, (key, got[key], v)


def test_lexical_matching_matches_reference_dict_semantics(spark):
    """score = Σ over shared tokens of qw·dw — the reference's sparse dict
    dot (m3.py:148-153), hand-checked."""
    from flagembedding_spark.operators.hybrid import (
        lexical_matching_scores,
        lexical_weights_from_text,
    )

    qdf = spark.createDataFrame(
        [(0, "a b b"), (1, "zz_only")], "doc_id long, text string"
    )
    ddf = spark.createDataFrame(
        [(7, "b c"), (8, "a a b"), (9, "c c")], "doc_id long, text string"
    )
    qw = lexical_weights_from_text(qdf).select(
        F.col("id").alias("qid"), "term", "weight"
    )
    dw = lexical_weights_from_text(ddf)
    got = {
        (r["qid"], r["docid"]): round(r["score"], 9)
        for r in lexical_matching_scores(qw, dw).collect()
    }
    # q0: a=1/3, b=2/3 ; d7: b=1/2, c=1/2 ; d8: a=2/3, b=1/3
    assert got[(0, 7)] == round(2 / 3 * 1 / 2, 9)
    assert got[(0, 8)] == round(1 / 3 * 2 / 3 + 2 / 3 * 1 / 3, 9)
    assert (0, 9) not in got  # no shared token
    assert not any(q == 1 for q, _ in got)  # OOV query matches nothing


def test_m3_ensemble_weighted_mean_and_missing_zero(spark):
    from flagembedding_spark.operators.hybrid import m3_ensemble_topk

    dense = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.5)], "qid long, docid long, score double"
    )
    sparse = spark.createDataFrame(
        [(0, 2, 1.0)], "qid long, docid long, score double"
    )
    colbert = spark.createDataFrame(
        [(0, 1, 0.2), (0, 3, 0.8)], "qid long, docid long, score double"
    )
    out = {
        r["docid"]: (round(r["score"], 6), r["rank"])
        for r in m3_ensemble_topk(
            dense, sparse, colbert, weights=(0.4, 0.2, 0.4), k=3
        ).collect()
    }
    assert out[1] == (round((0.4 * 0.9 + 0.4 * 0.2) / 1.0, 6), 1)
    assert out[2] == (round((0.4 * 0.5 + 0.2 * 1.0) / 1.0, 6), 2)
    assert out[3] == (round(0.4 * 0.8 / 1.0, 6), 3)


def test_rrf_fusion_hand_checked(spark):
    from flagembedding_spark.operators.hybrid import rrf_fusion

    ra = spark.createDataFrame(
        [("q", 1, 5.0, 1), ("q", 2, 4.0, 2), ("q", 3, 3.0, 3)],
        "qid string, docid long, score double, rank int",
    )
    rb = spark.createDataFrame(
        [("q", 2, 9.0, 1), ("q", 4, 8.0, 2)],
        "qid string, docid long, score double, rank int",
    )
    got = {
        int(r["docid"]): (int(r["rrf_score"]), int(r["rank"]))
        for r in rrf_fusion([ra, rb], k0=60, k=10).collect()
    }
    c = lambda r: round(1_000_000_000.0 / (60 + r))
    # doc2 appears in both runs (rank 2 + rank 1) → highest fused score
    assert got[2] == (c(2) + c(1), 1)
    assert got[1] == (c(1), 2)
    assert got[4] == (c(2), 3)
    assert got[3] == (c(3), 4)
