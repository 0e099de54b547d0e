"""Incremental ingest: two micro-batch waves must equal one batch build."""

import json
import os
import shutil
import tempfile

import pytest

from flagembedding_spark.config import BM25Config
from flagembedding_spark.operators.index_build import build_index
from flagembedding_spark.operators.query import bm25_topk
from flagembedding_spark.schemas import synth_corpus_rows
from flagembedding_spark.streaming.ingest import (
    load_incremental_index,
    start_incremental_ingest,
)


@pytest.fixture()
def tmproot():
    d = tempfile.mkdtemp(prefix="fes_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_wave(path: str, rows, name: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{name}.json", "w") as f:
        for repo, p, commit, lang, content in rows:
            f.write(
                json.dumps(
                    {"repo": repo, "path": p, "commit": commit,
                     "lang": lang, "content": content}
                ) + "\n"
            )


def test_incremental_ingest_two_waves(spark, tmproot):
    rows = synth_corpus_rows(120, seed=42)
    inp = f"{tmproot}/in"
    root = f"{tmproot}/idx"
    cfg = BM25Config()

    _write_wave(inp, rows[:60], "wave1")
    q = start_incremental_ingest(spark, inp, root, cfg)
    q.awaitTermination(120)
    idx1 = load_incremental_index(spark, root, cfg)
    assert idx1.stats.n_docs == 60

    _write_wave(inp, rows[60:], "wave2")
    q = start_incremental_ingest(spark, inp, root, cfg)
    q.awaitTermination(120)
    idx2 = load_incremental_index(spark, root, cfg)
    assert idx2.stats.n_docs == 120

    # logical equality with a one-shot batch build
    batch = build_index(
        spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string"),
        cfg,
    )

    def canon(idx):
        id2s = {r["docid"]: r["docid_str"] for r in idx.doc_stats.collect()}
        return sorted(
            (r["term"], id2s[r["docid"]], r["tf"], r["dl"])
            for r in idx.postings.collect()
        )

    assert canon(idx2) == canon(batch)

    # and the query engine runs over the incrementally-built index
    queries = spark.createDataFrame([("q1", "def import return")], ["query_id", "query"])
    res = bm25_topk(idx2, queries, k=5).collect()
    assert len(res) == 5


def test_ingest_idempotent_under_batch_replay(spark, tmproot):
    """Simulate the foreachBatch at-least-once failure mode: the parquet
    commit lands but the checkpoint offset commit is lost (here: checkpoint
    dir deleted), so the batch REPLAYS with the same batch_id. The dynamic
    partition overwrite on _batch must leave row counts unchanged."""
    rows = synth_corpus_rows(40, seed=7)
    inp = f"{tmproot}/in"
    root = f"{tmproot}/idx"
    _write_wave(inp, rows, "only")

    q = start_incremental_ingest(spark, inp, root)
    q.awaitTermination(120)
    n_rows_once = spark.read.parquet(f"{root}/stream").count()

    # lose the checkpoint → availableNow re-drains everything as batch 0 again
    shutil.rmtree(f"{root}/_checkpoint")
    q = start_incremental_ingest(spark, inp, root)
    q.awaitTermination(120)

    assert spark.read.parquet(f"{root}/stream").count() == n_rows_once
    idx = load_incremental_index(spark, root)
    assert idx.stats.n_docs == 40
    assert idx.doc_stats.select("docid_str").distinct().count() == 40


def test_ingest_exactly_once_on_rerun(spark, tmproot):
    rows = synth_corpus_rows(30, seed=1)
    inp = f"{tmproot}/in"
    root = f"{tmproot}/idx"
    _write_wave(inp, rows, "only")
    for _ in range(2):  # second drain sees no new files → no duplicate docs
        q = start_incremental_ingest(spark, inp, root)
        q.awaitTermination(120)
    idx = load_incremental_index(spark, root)
    assert idx.stats.n_docs == 30
    assert idx.doc_stats.select("docid_str").distinct().count() == 30


def test_ingest_generations_merge_into_one_store(spark, tmproot):
    """The full incremental story: each ingest wave becomes its OWN segment
    store (a generation — docids are batch-scoped so spaces are disjoint by
    construction), then merge_stores folds the generations into one
    canonical index whose query results equal the all-data build."""
    import dataclasses

    from pyspark.sql import functions as F

    from flagembedding_spark.operators.index_build import CorpusStats
    from flagembedding_spark.operators.segments import (
        build_segments,
        merge_segments,
        merge_stores,
        save_segments,
    )
    from flagembedding_spark.operators.wand import wand_topk
    from flagembedding_spark.schemas import synth_queries

    rows = synth_corpus_rows(120, seed=42)
    inp = f"{tmproot}/in"
    root = f"{tmproot}/idx"
    cfg = BM25Config(block_size=16, term_buckets=8)

    gen_roots = []
    for wave, chunk in enumerate((rows[:60], rows[60:])):
        _write_wave(inp, chunk, f"wave{wave}")
        q = start_incremental_ingest(spark, inp, root, cfg)
        q.awaitTermination(120)
        full = load_incremental_index(spark, root, cfg)
        # this generation = only the docids ingested by THIS wave
        batch_min = full.postings.agg(F.max("docid")).collect()[0][0] >> 40
        gen_post = full.postings.filter(
            F.shiftright("docid", 40) == batch_min
        )
        gen_docs = full.doc_stats.filter(F.shiftright("docid", 40) == batch_min)
        srow = gen_docs.agg(
            F.count("*").alias("n"), F.avg("dl").alias("a")
        ).collect()[0]
        nn = float(srow["n"])
        dic = (
            gen_post.groupBy("term").agg(F.count("*").alias("df"))
            .withColumn(
                "idf",
                F.log((F.lit(nn) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
            )
        )
        gen_idx = dataclasses.replace(
            full, postings=gen_post, doc_stats=gen_docs,
            dictionary=dic, stats=CorpusStats(int(srow["n"]), float(srow["a"])),
        )
        g = f"{tmproot}/gen{wave}"
        save_segments(merge_segments(build_segments(gen_idx)), g)
        gen_roots.append(g)

    merged = merge_stores(spark, gen_roots)
    all_idx = load_incremental_index(spark, root, cfg)
    single = merge_segments(build_segments(all_idx))
    qs = synth_queries(spark, 25, seed=3)

    def canon(rows_):
        by = {}
        for r in rows_:
            by.setdefault(r["qid"], []).append(
                (round(r["score"], 6), r["docid"])
            )
        return {k: sorted(v, key=lambda x: (-x[0], x[1])) for k, v in by.items()}

    assert canon(wand_topk(merged, qs, k=10).collect()) == canon(
        wand_topk(single, qs, k=10).collect()
    )
    assert merged.stats.n_docs == 120
