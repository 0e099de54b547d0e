"""Persisted embedding-shard store + batched search over it — the
distributed analog of the reference's dense-retrieval cache + Flat index
(S9):

- cache semantics: ``AbsEvalDenseRetriever.__call__`` saves corpus embeddings
  to ``doc.npy`` and LOADS them on re-run unless ``overwrite``
  (abc/evaluation/searcher.py:121-146);
- search semantics: a faiss ``Flat`` METRIC_INNER_PRODUCT index over the
  cached matrix, batched top-k (abc/evaluation/utils.py:150-228).

The single-node ``doc.npy`` becomes hash-sharded parquet: shard =
pmod(xxhash64(id), n_shards) — deterministic, independent of input
partitioning, so a resumed build writes exactly the missing shards with the
same content (the same chunking contract as plans/lineage.py). A manifest
records completed shards; ``build_embedding_store`` skips them (the
reference's skip-if-exists probe, made per-shard so 10^12-vector encodes
resume mid-way). Search runs the numpy-GEMM kernel per shard partition with
partition-local top-k — the Flat/IP index re-expressed as a scan, no
all-pairs shuffle.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_path(root: str) -> str:
    return f"{root}/manifest.json"


def completed_shards(root: str) -> set[int]:
    p = _manifest_path(root)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return set(json.load(f).get("done_shards", []))


def _mark_done(root: str, shards: set[int], meta: dict) -> None:
    os.makedirs(root, exist_ok=True)
    payload = {"done_shards": sorted(shards), **meta}
    with open(_manifest_path(root), "w") as f:
        json.dump(payload, f)


def build_embedding_store(
    embeddings: DataFrame,
    root: str,
    n_shards: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    overwrite: bool = False,
    wave_size: int | None = None,
    fail_after_waves: int | None = None,
) -> dict:
    """Persist (id, vector) into hash shards, skipping shards the manifest
    marks done (searcher.py:122-124 skip-if-exists, made per-shard). In a
    real deployment the ``embeddings`` plan is the encoder output — skipping
    a shard skips its (expensive) encode. Missing shards are written
    ``wave_size`` per source pass (default: all missing in ONE pass — the
    source is read O(1) times; shrink waves only to bound checkpoint loss).
    Dynamic partition overwrite makes a re-run of a crashed wave idempotent.
    ``fail_after_waves`` injects a crash for resume tests. Returns per-shard
    row counts for the shards written by this call."""
    spark = embeddings.sparkSession
    done = set() if overwrite else completed_shards(root)
    missing = [s for s in range(n_shards) if s not in done]
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    src = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        shard.alias("_shard"),
    )
    counts: dict[int, int] = {}
    step = max(wave_size or len(missing) or 1, 1)
    for w in range(0, len(missing), step):
        if fail_after_waves is not None and w // step >= fail_after_waves:
            raise RuntimeError(f"injected failure before wave {w // step}")
        wave = missing[w : w + step]
        t0 = time.perf_counter()
        part = src.filter(F.col("_shard").isin(wave))
        # writer-scoped dynamic overwrite (NOT a session conf set — that
        # would silently flip later overwrite writes in the same session
        # from truncate-all to dynamic; ADVICE r02)
        part.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("_shard").parquet(f"{root}/shards")
        wave_counts = {
            r["_shard"]: r["cnt"]
            for r in spark.read.parquet(f"{root}/shards")
            .filter(F.col("_shard").isin(wave))
            .groupBy("_shard").agg(F.count("*").alias("cnt")).collect()
        }
        for s in wave:
            counts[s] = int(wave_counts.get(s, 0))
        done.update(wave)
        _mark_done(root, done, {
            "n_shards": n_shards,
            "last_wave_sec": round(time.perf_counter() - t0, 3),
        })
    return counts


def load_embedding_store(spark: SparkSession, root: str) -> DataFrame:
    """→ (vec_id, embedding) over every completed shard; raises if the
    manifest says the store is incomplete (the envelope-consistency stance of
    sources/manifest.py)."""
    with open(_manifest_path(root)) as f:
        meta = json.load(f)
    missing = set(range(meta["n_shards"])) - set(meta["done_shards"])
    if missing:
        raise ValueError(f"embedding store incomplete: missing shards {sorted(missing)}")
    return spark.read.parquet(f"{root}/shards").select("vec_id", "embedding")


def search_embedding_store(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    k: int = 5,
    qid_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    round_scores: int | None = None,
) -> DataFrame:
    """Batched top-k over the persisted shards: broadcast query matrix, one
    float64 GEMM per Arrow batch, partition-local then global top-k — the
    reference's Flat/IP faiss search (utils.py:193-228) as a Spark scan.
    metric='ip' reproduces METRIC_INNER_PRODUCT exactly; 'cosine' normalizes
    both sides (identical ranking for unit vectors)."""
    from flagembedding_spark.operators.similarity import brute_force_cosine_topk

    corpus = load_embedding_store(spark, root)
    if metric == "cosine":
        return brute_force_cosine_topk(
            queries, corpus, k=k, qid_col=qid_col, cid_col="vec_id",
            vec_col=vec_col, round_scores=round_scores, method="numpy",
        )
    if metric != "ip":
        raise ValueError(f"unknown metric {metric!r}")
    return _ip_topk(queries, corpus, k, qid_col, vec_col, round_scores)


def _ip_topk(queries, corpus, k, qid_col, vec_col, round_scores):
    """Inner-product top-k (no normalization — faiss METRIC_INNER_PRODUCT)."""
    from collections.abc import Iterator

    import numpy as np
    import pyarrow as pa
    from pyspark.sql.window import Window

    qrows = queries.select(qid_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    spark = corpus.sparkSession
    bqm = spark.sparkContext.broadcast(qm)
    bqid = spark.sparkContext.broadcast(qids)

    def gemm(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        Q = bqm.value
        ids = bqid.value
        for batch in batches:
            docids = batch.column(0).to_numpy(zero_copy_only=False)
            vecs = np.array(batch.column(1).to_pylist(), dtype=np.float64)
            if vecs.size == 0:
                continue
            sims = Q @ vecs.T
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            o_q, o_d, o_s = [], [], []
            for qi in range(sims.shape[0]):
                kth = sims[qi, part[qi]].min()
                for ci in np.flatnonzero(sims[qi] >= kth):
                    o_q.append(ids[qi])
                    o_d.append(int(docids[ci]))
                    o_s.append(float(sims[qi, ci]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_q, pa.int64()),
                    pa.array(o_d, pa.int64()),
                    pa.array(o_s, pa.float64()),
                ],
                schema=pa.schema(
                    [
                        pa.field("qid", pa.int64()),
                        pa.field("docid", pa.int64()),
                        pa.field("score", pa.float64()),
                    ]
                ),
            )

    partial = corpus.select(
        F.col("vec_id").cast("long").alias("docid"), F.col("embedding").alias("v")
    ).mapInArrow(gemm, "qid long, docid long, score double")
    if round_scores is not None:
        partial = partial.withColumn("score", F.round("score", round_scores))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "score", "rank")
    )
