"""Extended golden parity: the segments+WAND scale path and the code
tokenizer (T2 same-tokenizer pattern), both against goldens frozen from
executing the reference NaiveBM25Retriever."""

import json
import math
import os
import re

import pytest
from pyspark.sql import functions as F

from flagembedding_spark.config import BM25Config
from flagembedding_spark.functions.tokenize import CODE_TOKEN_RE, code_tokens
from flagembedding_spark.operators.index_build import build_index
from flagembedding_spark.operators.segments import build_segments, merge_segments
from flagembedding_spark.operators.wand import wand_topk
from flagembedding_spark.schemas import synth_corpus_rows

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden_topk.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def _golden_levels(rows, qid):
    """{rounded score level → set(doc_idx)} for one query (tie-tolerant)."""
    out = {}
    for r in rows:
        if r["qid"] == qid and r["doc_idx"] != -1:
            out.setdefault(round(r["score"], 4), set()).add(r["doc_idx"])
    return out


def _check_against_golden(got_rows, grows, id_map):
    by_qid = {}
    for r in got_rows:
        by_qid.setdefault(r["qid"], []).append((id_map[r["docid"]], r["score"]))
    qids = {r["qid"] for r in grows if r["doc_idx"] != -1}
    assert set(by_qid) == qids
    n = 0
    for qid in qids:
        want = _golden_levels(grows, qid)
        got = {}
        for d, s in by_qid[qid]:
            got.setdefault(round(s, 4), set()).add(d)
        assert got == want, qid
        n += sum(len(v) for v in want.values())
    assert n > 300
    return n


def test_segments_wand_matches_reference_goldens(spark, tiny_corpus, tiny_queries, golden):
    """The full scale path (salted segments → merge → varint blocks →
    block-max WAND) must be rank- and score-identical to the executed
    reference oracle (compat avgdl≡1 mode, pinned at segment build)."""
    cfg = BM25Config(
        k1=golden["config"]["k1"], b=golden["config"]["b"], use_avgdl=False,
        block_size=16, salt_threshold_df=50, max_salt=4, term_buckets=8,
    )
    idx = build_index(tiny_corpus, cfg)
    seg = merge_segments(build_segments(idx, num_partitions=6))
    got = wand_topk(seg, tiny_queries, k=golden["config"]["hits"]).collect()

    rows = synth_corpus_rows(200, seed=42)
    ref_idx = {f"{r[0]}:{r[1]}@{r[2]}": i for i, r in enumerate(rows)}
    id_map = {
        r["docid"]: ref_idx[r["docid_str"]]
        for r in idx.doc_stats.select("docid", "docid_str").collect()
    }
    _check_against_golden(got, golden["rows"], id_map)


def test_code_tokens_match_python_regex(spark, tiny_corpus):
    """Spark's code_tokens == Python re.findall(CODE_TOKEN_RE) — the contract
    that makes the frozen code-tokenizer goldens meaningful."""
    rx = re.compile(CODE_TOKEN_RE)
    rows = tiny_corpus.select("content", code_tokens("content").alias("t")).collect()
    for r in rows:
        assert r["t"] == rx.findall(r["content"])


def test_code_tokenizer_shared_with_oracle(spark, tiny_corpus, tiny_queries, golden):
    """T2 pattern: docs+queries pre-tokenized with the code tokenizer and
    space-joined; engine results must match the reference run on the same
    token streams (rows_code_tokenizer goldens)."""
    from flagembedding_spark.operators.query import bm25_topk

    cfg = BM25Config(
        k1=golden["config"]["k1"], b=golden["config"]["b"], use_avgdl=False
    )
    pre_docs = tiny_corpus.withColumn(
        "content", F.array_join(code_tokens("content"), " ")
    )
    pre_queries = tiny_queries.withColumn(
        "query", F.array_join(code_tokens("query"), " ")
    ).filter(F.length("query") > 0)
    idx = build_index(pre_docs, cfg)
    got = bm25_topk(idx, pre_queries, k=golden["config"]["hits"]).collect()

    rows = synth_corpus_rows(200, seed=42)
    ref_idx = {f"{r[0]}:{r[1]}@{r[2]}": i for i, r in enumerate(rows)}
    id_map = {
        r["docid"]: ref_idx[r["docid_str"]]
        for r in idx.doc_stats.select("docid", "docid_str").collect()
    }
    _check_against_golden(got, golden["rows_code_tokenizer"], id_map)
