"""Persisted embedding-shard store: roundtrip, per-shard resume (the
reference's skip-if-exists cache, searcher.py:121-146), and search parity
with the in-memory GEMM path."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from flagembedding_spark.operators.similarity import brute_force_cosine_topk
from flagembedding_spark.sources.embedding_store import (
    build_embedding_store,
    completed_shards,
    load_embedding_store,
    search_embedding_store,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture()
def tmproot():
    d = tempfile.mkdtemp(prefix="fes_embstore_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()


def _canon(df):
    return sorted((r["vec_id"], tuple(r["embedding"])) for r in df.collect())


def test_build_load_roundtrip(spark, emb, tmproot):
    counts = build_embedding_store(emb, tmproot, n_shards=4)
    assert sum(counts.values()) == emb.count()
    assert completed_shards(tmproot) == {0, 1, 2, 3}
    assert _canon(load_embedding_store(spark, tmproot)) == _canon(emb)


def test_incomplete_store_raises_and_resumes(spark, emb, tmproot):
    with pytest.raises(RuntimeError, match="injected failure"):
        build_embedding_store(
            emb, tmproot, n_shards=4, wave_size=1, fail_after_waves=2
        )
    assert len(completed_shards(tmproot)) == 2
    with pytest.raises(ValueError, match="incomplete"):
        load_embedding_store(spark, tmproot)
    # resume writes ONLY the missing shards
    counts = build_embedding_store(emb, tmproot, n_shards=4)
    assert set(counts) == {2, 3}
    assert _canon(load_embedding_store(spark, tmproot)) == _canon(emb)


def test_resume_skips_completed(spark, emb, tmproot):
    build_embedding_store(emb, tmproot, n_shards=4)
    counts = build_embedding_store(emb, tmproot, n_shards=4)
    assert counts == {}  # nothing to do — the skip-if-exists probe


def test_search_matches_inmemory_gemm(spark, emb, tmproot):
    build_embedding_store(emb.filter(F.col("vec_id") >= 10), tmproot, n_shards=4)
    q = emb.filter(F.col("vec_id") < 10)
    got = search_embedding_store(spark, tmproot, q, k=5, round_scores=4)
    want = brute_force_cosine_topk(
        q, emb.filter(F.col("vec_id") >= 10), k=5, round_scores=4, method="sql"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_ip_metric_search(spark, emb, tmproot):
    """METRIC_INNER_PRODUCT parity: on unit-normalized vectors ip == cosine
    ranking."""
    from flagembedding_spark.operators.similarity import _norm

    unit = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / _norm(F.col("embedding"))
        ).alias("embedding"),
    ).cache()
    build_embedding_store(unit.filter(F.col("vec_id") >= 10), tmproot, n_shards=2)
    q = unit.filter(F.col("vec_id") < 10)
    ip = search_embedding_store(spark, tmproot, q, k=5, metric="ip", round_scores=4)
    cos = search_embedding_store(spark, tmproot, q, k=5, metric="cosine", round_scores=4)
    a = sorted((r["qid"], r["docid"], r["rank"]) for r in ip.collect())
    b = sorted((r["qid"], r["docid"], r["rank"]) for r in cos.collect())
    assert a == b
