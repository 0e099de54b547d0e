"""Golden cross-check of ir_metrics against an INDEPENDENT pure-Python
evaluator that implements pytrec_eval / trec_eval semantics — the measures
the reference requests by name (`map_cut.K ndcg_cut.K recall.K P.K`) in
FlagEmbedding/abc/evaluation/utils.py:95-147, aggregated exactly as its
``evaluate_metrics`` does (per-query scores, mean over evaluated queries,
5 dp). pytrec_eval itself is not installable in this image (VERDICT r02
missing #2 / ask #9), so the twin below re-derives the trec_eval
definitions from scratch:

  ndcg_cut_k : Σ_{rel docs in top-k} rel/log2(rank+1), divided by the same
               sum over the ideal ordering (all relevant docs, rel desc)
               cut at k — LINEAR gains, trec_eval convention
  map_cut_k  : Σ_{i-th rel doc at rank r ≤ k} (i/r) / R,  R = #relevant
  recall_k   : |relevant ∩ top-k| / R
  P_k        : |relevant ∩ top-k| / k

trec_eval orders ties by (score desc, docno DESC-lexicographic); our canon
is docid ASC — the fixture uses strictly distinct scores so both orders
coincide and the comparison tests the measures, not the tie convention.
"""

import math
import random

import pytest


def _pytrec_like(qrels, results, k_values):
    """qrels: {qid: {docno: rel int}}, results: {qid: {docno: score}} →
    {f"{name}@{k}": mean} following evaluate_metrics' aggregation (mean over
    the queries pytrec_eval evaluates = queries present in results∩qrels)."""
    per = {m: {k: [] for k in k_values} for m in ("ndcg", "map", "recall", "precision")}
    for qid, run in results.items():
        if qid not in qrels:
            continue
        rels = {d: r for d, r in qrels[qid].items() if r > 0}
        # trec_eval result ordering: score desc (docno-desc tie-break is
        # moot — fixture scores are strictly distinct)
        ordered = sorted(run.items(), key=lambda x: -x[1])
        docs = [d for d, _ in ordered]
        R = len(rels)
        ideal = sorted(rels.values(), reverse=True)
        for k in k_values:
            top = docs[:k]
            hits = [(i + 1, d) for i, d in enumerate(top) if d in rels]
            dcg = sum(rels[d] / math.log2(r + 1) for r, d in hits)
            idcg = sum(
                g / math.log2(j + 2) for j, g in enumerate(ideal[:k])
            )
            per["ndcg"][k].append(dcg / idcg if idcg > 0 else 0.0)
            ap = (
                sum((i + 1) / r for i, (r, _) in enumerate(hits)) / R
                if R
                else 0.0
            )
            per["map"][k].append(ap)
            per["recall"][k].append(len(hits) / R if R else 0.0)
            per["precision"][k].append(len(hits) / k)
    out = {}
    for m, by_k in per.items():
        for k, vs in by_k.items():
            out[(m, k)] = sum(vs) / len(vs)
    return out


def _fixture():
    """Deterministic graded-relevance run with strictly distinct scores:
    12 queries × 25 retrieved docs over a 60-doc space, rel ∈ {1,2,3} for a
    seeded subset (incl. relevant docs NOT retrieved — exercises recall
    denominators and idcg cuts — and queries with a single relevant doc)."""
    rng = random.Random(20260816)
    qrels = {}
    results = {}
    for qi in range(12):
        qid = f"q{qi}"
        docs = rng.sample(range(60), 25)
        results[qid] = {
            f"d{d}": round(100.0 - i * 1.37 - qi * 0.011, 4)
            for i, d in enumerate(docs)
        }
        n_rel = rng.choice([1, 2, 3, 5, 8])
        rel_docs = rng.sample(range(60), n_rel)
        qrels[qid] = {f"d{d}": rng.choice([1, 2, 3]) for d in rel_docs}
    return qrels, results


KS = [1, 3, 5, 10]


@pytest.fixture(scope="module")
def frames(spark):
    from pyspark.sql import functions as F  # noqa: F401

    qrels, results = _fixture()
    res_rows = [
        (q, int(d[1:]), s) for q, run in results.items() for d, s in run.items()
    ]
    qrel_rows = [
        (q, int(d[1:]), r) for q, rl in qrels.items() for d, r in rl.items()
    ]
    res_df = spark.createDataFrame(res_rows, "qid string, docid long, score double")
    qrel_df = spark.createDataFrame(
        qrel_rows, "qid string, docid long, relevance int"
    )
    return qrels, results, res_df, qrel_df


def test_ir_metrics_match_pytrec_eval_semantics(spark, frames):
    from flagembedding_spark.operators.metrics import ir_metrics

    qrels, results, res_df, qrel_df = frames
    want = _pytrec_like(qrels, results, KS)
    got = {
        (r["metric"], r["k"]): r["value"]
        for r in ir_metrics(res_df, qrel_df, k_values=KS).collect()
    }
    for (m, k), v in want.items():
        # ours is rounded to 5dp (evaluate_metrics rounds the same means to
        # 5dp); allow the half-ulp the rounding can move
        assert abs(got[(m, k)] - v) <= 5.0001e-6, (m, k, got[(m, k)], v)


def test_reference_rounding_shape(frames):
    """The reference rounds the per-measure means to 5 dp
    (utils.py:141-146); assert our emitted values are already exactly
    5 dp-rounded numbers."""
    _, _, res_df, qrel_df = frames
    from flagembedding_spark.operators.metrics import ir_metrics

    for r in ir_metrics(res_df, qrel_df, k_values=KS).collect():
        assert abs(r["value"] - round(r["value"], 5)) < 1e-12
