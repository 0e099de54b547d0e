"""Similarity search over an embedding column (array<float>).

- brute_force_cosine_topk: exact baseline. Two shapes:
    * 'sql'   — pure JVM zip_with/aggregate expressions (oracle-matched form)
    * 'numpy' — broadcast query matrix into mapInArrow, np.float64 GEMM per
      batch (the fast path; identical math, vectorized)
- lsh_cosine_topk: random-hyperplane LSH bucketing (signs of h·v) with
  multi-probe, exact rescoring inside candidate buckets — the scale path:
  the corpus is hashed once, queries probe matching buckets only.

Hyperplanes are generated from a seeded RNG so signatures are deterministic.
At 10^12 scale the corpus side is bucketed+partitioned by signature; a query
touches (1 + multiprobe) buckets ≪ corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sql_double_array(values) -> Column:
    """Constant array<double> literal in ONE py4j call (SQL-parsed JVM-side).
    F.array(*[F.lit(float(x)) ...]) costs one gateway round trip per element
    — thousands per LSH/IVF plan at realistic dims. Python repr() is the
    shortest round-trip decimal for a finite double and Java's parseDouble
    is correctly rounded, so the parsed values are BIT-IDENTICAL to the lit
    path (asserted by test_sql_double_array_bit_parity)."""
    body = ",".join(f"{float(x)!r}D" for x in values)
    return F.expr(f"array({body})")


def _norm(c: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, v: a + v,
        )
    )


def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def brute_force_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    qid_col: str = "vec_id",
    cid_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scores: int | None = None,
    method: str = "numpy",
) -> DataFrame:
    """→ (qid, docid, cosine, rank). Queries are broadcast (query set ≪
    corpus); ranking is deterministic (cosine DESC, docid ASC)."""
    if method == "numpy":
        return _brute_numpy(queries, corpus, k, qid_col, cid_col, vec_col, round_scores)

    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(cid_col).alias("docid"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    scored = c.join(F.broadcast(q)).select(
        "qid",
        "docid",
        (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    if round_scores is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_scores))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "cosine", "rank")
    )


def _brute_numpy(queries, corpus, k, qid_col, cid_col, vec_col, round_scores):
    """Broadcast the (small) query matrix; per Arrow batch of corpus vectors,
    one float64 GEMM → per-partition top-k; final global top-k per query is a
    tiny window over (#partitions × k × #queries) rows."""
    qrows = queries.select(qid_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    spark = corpus.sparkSession
    bqm = spark.sparkContext.broadcast(qm)
    bqid = spark.sparkContext.broadcast(qids)

    out_pa = pa.schema(
        [
            pa.field("qid", pa.int64()),
            pa.field("docid", pa.int64()),
            pa.field("cosine", pa.float64()),
        ]
    )

    def gemm(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        Q = bqm.value
        ids = bqid.value
        for batch in batches:
            docids = batch.column(0).to_numpy(zero_copy_only=False)
            vecs = np.array(batch.column(1).to_pylist(), dtype=np.float64)
            if vecs.size == 0:
                continue
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            sims = Q @ vecs.T  # (nq, nc)
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            o_q, o_d, o_s = [], [], []
            for qi in range(sims.shape[0]):
                # emit EVERY candidate tied at the kth score (argpartition
                # keeps an arbitrary tied subset) so the final
                # (cosine DESC, docid ASC) window resolves ties
                # deterministically — same contract as wand._topk_rows
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
                schema=out_pa,
            )

    partial = corpus.select(
        F.col(cid_col).cast("long").alias("docid"), F.col(vec_col).alias("v")
    ).mapInArrow(gemm, "qid long, docid long, cosine double")
    if round_scores is not None:
        partial = partial.withColumn("cosine", F.round("cosine", round_scores))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("docid"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "cosine", "rank")
    )


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_tables: int = 16,
    planes_per_table: int = 4,
    vec_col: str = "embedding",
    seed: int = 271,
) -> DataFrame:
    """Multi-table hyperplane LSH: adds (table, sig) rows — one per table —
    where ``sig`` packs the sign bits of that table's r seeded hyperplanes.
    JVM-only: plane dot products are zip_with/aggregate against literal
    arrays (constants, folded by Catalyst). L tables of r planes give
    collision prob 1-(1-p^r)^L for per-plane agreement p = 1 - θ/π."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, planes_per_table, dim))
    table_sigs = []
    for t in range(n_tables):
        sig = None
        for i in range(planes_per_table):
            arr = _sql_double_array(planes[t, i])
            d = F.aggregate(
                F.zip_with(F.col(vec_col), arr, lambda x, p: x.cast("double") * p),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            bit = F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            sig = bit if sig is None else (sig + bit)
        table_sigs.append(
            F.struct(F.lit(t).alias("table"), sig.cast("long").alias("sig"))
        )
    return df.select(
        "*", F.explode(F.array(*table_sigs)).alias("_ts")
    ).withColumns(
        {"table": F.col("_ts.table"), "sig": F.col("_ts.sig")}
    ).drop("_ts")


def seeded_centroids(dim: int, n_cells: int, seed: int = 733) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_cells, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    return cents


def train_ivf_centroids(
    df: DataFrame,
    dim: int,
    n_cells: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    seed: int = 733,
    max_train: int | None = None,
) -> np.ndarray:
    """Spherical k-means (Lloyd) over a TRAINING SAMPLE, distributed:
    assignment is the JVM ivf_assign expression; the update is ONE
    groupBy((cell, dim)) avg — the only driver-side data is the
    (n_cells × dim) centroid matrix itself, which is small by definition.

    ``max_train`` caps the training set at ~256·n_cells vectors (the faiss
    convention) via a CONTENT-deterministic filter (pmod(xxhash64(vec)) —
    stable across partition layouts, unlike seeded .sample). r02's version
    posexploded the FULL corpus every Lloyd iteration — a 100 TB
    scale-killer flagged in VERDICT; centroid quality saturates long before
    the full pass pays for itself. Deterministic: seeded init, fixed
    iteration count. Empty cells keep their previous centroid."""
    cents = seeded_centroids(dim, n_cells, seed)
    v = df.select(F.col(vec_col).alias("v"))
    cap = max_train if max_train is not None else 256 * n_cells
    if cap > 0:
        n = v.count()
        if n > cap:
            m = max(2, round(n / cap))
            v = v.filter(F.pmod(F.xxhash64("v"), F.lit(m)) == 0)
    v = v.cache()  # reused every Lloyd iteration — scan the source once
    for _ in range(max(iters, 0)):
        assigned = ivf_assign(v, dim, n_cells, "v", centroids=cents)
        sums = (
            assigned.select("cell", F.posexplode("v").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(F.sum(F.col("x").cast("double")).alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = cents.copy()
        acc = np.zeros((n_cells, dim))
        cnt = np.zeros(n_cells)
        for r in sums:
            acc[r["cell"], r["i"]] = r["s"]
            cnt[r["cell"]] = r["n"]
        nz = cnt > 0
        acc[nz] /= np.linalg.norm(acc[nz], axis=1, keepdims=True)
        new[nz] = acc[nz]
        cents = new
    v.unpersist()
    return cents


def ivf_assign(
    df: DataFrame,
    dim: int,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 733,
    nprobe: int = 1,
    out_col: str = "cell",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style cell assignment: nearest of n_cells unit centroids —
    ``centroids`` (e.g. from train_ivf_centroids) or deterministic seeded
    random directions when not given. With nprobe>1 each row is EXPLODED to
    its nprobe nearest cells (the query-side multi-probe). JVM expressions
    only."""
    cents = centroids if centroids is not None else seeded_centroids(dim, n_cells, seed)
    n_cells = len(cents)
    dots = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    _sql_double_array(cents[c]),
                    lambda x, p: x.cast("double") * p,
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            for c in range(n_cells)
        ]
    )
    pairs = F.zip_with(
        dots,
        F.sequence(F.lit(0), F.lit(n_cells - 1)),
        lambda d, i: F.struct(d.alias("dot"), i.alias("cell")),
    )
    ranked = F.reverse(F.array_sort(pairs))  # struct sort: dot asc → reverse
    if nprobe <= 1:
        return df.withColumn(out_col, ranked[0]["cell"])
    probes = F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cell"])
    return df.withColumn(out_col, F.explode(probes))


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    qid_col: str = "vec_id",
    cid_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 733,
    centroids: "np.ndarray | None" = None,
    train_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: corpus assigned to cells once (at 10^12 scale:
    materialized partitioned-by-cell); queries probe their nprobe nearest
    cells; exact cosine rescoring inside probed cells. ``train_iters`` > 0
    trains spherical-k-means centroids on the corpus first (better-balanced
    cells → higher recall at the same nprobe); ``centroids`` supplies
    pre-trained ones."""
    dim = len(corpus.select(vec_col).first()[0])
    if centroids is None and train_iters > 0:
        centroids = train_ivf_centroids(
            corpus, dim, n_cells, iters=train_iters, vec_col=vec_col, seed=seed
        )
    ccell = ivf_assign(
        corpus.select(F.col(cid_col).alias("docid"), F.col(vec_col).alias("cv")),
        dim, n_cells, "cv", seed, nprobe=1, centroids=centroids,
    )
    qcell = ivf_assign(
        queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("qv")),
        dim, n_cells, "qv", seed, nprobe=nprobe, centroids=centroids,
    )
    cand = ccell.join(F.broadcast(qcell), "cell").select(
        "qid",
        "docid",
        (_dot("qv", "cv") / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("docid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "cosine", "rank")
    )


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_tables: int = 16,
    planes_per_table: int = 4,
    qid_col: str = "vec_id",
    cid_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 271,
) -> DataFrame:
    """Approximate top-k: bucket corpus into L hash tables; a query probes its
    bucket in each table; exact cosine rescoring on the candidate union (no
    false positives in scores, only possible misses). At scale the corpus
    side is materialized once, partitioned by (table, sig); queries touch
    L buckets ≪ corpus."""
    dim = len(corpus.select(vec_col).first()[0])
    csig = hyperplane_signatures(
        corpus.select(F.col(cid_col).alias("docid"), F.col(vec_col).alias("cv")),
        dim, n_tables, planes_per_table, "cv", seed,
    )
    qsig = hyperplane_signatures(
        queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("qv")),
        dim, n_tables, planes_per_table, "qv", seed,
    )
    cand = (
        csig.join(F.broadcast(qsig), ["table", "sig"])
        .select("qid", "docid", "qv", "cv")
        .dropDuplicates(["qid", "docid"])
        .select(
            "qid",
            "docid",
            (_dot("qv", "cv") / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("docid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "cosine", "rank")
    )


def colbert_maxsim_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    qid_col: str = "qid",
    qvecs_col: str = "qvecs",
    cid_col: str = "docid",
    dvecs_col: str = "dvecs",
    round_scores: int | None = None,
) -> DataFrame:
    """ColBERT-style late-interaction top-k over MULTI-vector columns
    (array<array<float>>): score(q, d) = Σ_i max_j (q_i · d_j) / |q| — the
    reference's colbert_score (m3.py:168-182 einsum('in,jn->ij').max(-1)
    .sum()/len; the finetune twin modeling.py:223-237 is the same maxsim
    mean). Vector normalization is upstream (the encoder), exactly as
    there.

    Kernel shape: queries broadcast as ONE stacked matrix; per Arrow batch
    of corpus rows, a single GEMM against all the batch's doc vectors, then
    segmented max over each doc's vector span (maximum.reduceat) and
    segmented mean over each query's vector span (add.reduceat) — no
    per-row Python. Per-partition tie-complete top-k, global window merge —
    the _brute_numpy contract."""
    qrows = queries.select(qid_col, qvecs_col).collect()
    qids = [r[0] for r in qrows]
    qcounts = np.array([len(r[1]) for r in qrows], dtype=np.int64)
    if (qcounts == 0).any():
        raise ValueError("every query needs >= 1 vector")
    qmat = np.array(
        [v for r in qrows for v in r[1]], dtype=np.float64
    )
    qstarts = np.cumsum(qcounts) - qcounts
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast((qids, qmat, qstarts, qcounts))

    out_pa = pa.schema(
        [
            pa.field("qid", pa.int64()),
            pa.field("docid", pa.int64()),
            pa.field("score", pa.float64()),
        ]
    )

    def maxsim(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ids, Q, qs, qc = bq.value
        for batch in batches:
            docids = batch.column(0).to_numpy(zero_copy_only=False)
            rows = batch.column(1).to_pylist()
            counts = np.array([len(r) for r in rows], dtype=np.int64)
            keep = counts > 0
            if not keep.any():
                continue
            docids = docids[keep]
            counts = counts[keep]
            D = np.array(
                [v for r, m in zip(rows, keep) if m for v in r],
                dtype=np.float64,
            )
            S = Q @ D.T  # (Σ|q| vectors, Σ|d| vectors)
            dstarts = np.cumsum(counts) - counts
            M = np.maximum.reduceat(S, dstarts, axis=1)  # (Σ|q|, ndocs)
            scores = (
                np.add.reduceat(M, qs, axis=0) / qc[:, None]
            )  # (nq, ndocs)
            kk = min(k, scores.shape[1])
            o_q, o_d, o_s = [], [], []
            for qi in range(scores.shape[0]):
                kth = np.partition(scores[qi], scores.shape[1] - kk)[
                    scores.shape[1] - kk
                ]
                for ci in np.flatnonzero(scores[qi] >= kth):
                    o_q.append(ids[qi])
                    o_d.append(int(docids[ci]))
                    o_s.append(float(scores[qi, ci]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_q, pa.int64()),
                    pa.array(o_d, pa.int64()),
                    pa.array(o_s, pa.float64()),
                ],
                schema=out_pa,
            )

    partial = corpus.select(
        F.col(cid_col).cast("long").alias("docid"), F.col(dvecs_col).alias("v")
    ).mapInArrow(maxsim, "qid long, docid long, score double")
    if round_scores is not None:
        partial = partial.withColumn("score", F.round("score", round_scores))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "score", "rank")
    )


def rocchio_topk(
    queries: DataFrame,
    corpus: DataFrame,
    fb_k: int = 5,
    alpha: float = 1.0,
    beta: float = 0.75,
    k: int = 5,
    qid_col: str = "vec_id",
    cid_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scores: int | None = None,
) -> DataFrame:
    """Rocchio pseudo-relevance feedback on the dense side (the classic
    vector-space counterpart of prf.prf_expansion): retrieve top ``fb_k``
    by cosine, move each query toward its feedback centroid,

        q' = α·q + β·mean(top-fb_k doc vectors),

    then re-rank the corpus against q' → (qid, docid, cosine, rank ≤ k).

    Scale shape: the feedback set is queries × fb_k (broadcast); the
    centroid is a per-(qid, dim) average over ≤ fb_k values; the expanded
    queries assemble back into an array column and feed the standard
    brute_force_cosine_topk (whose broadcast-GEMM/SQL paths carry the
    corpus-scale work) — Rocchio adds no corpus-sized shuffle of its
    own."""
    fb = brute_force_cosine_topk(
        queries, corpus, k=fb_k, qid_col=qid_col, cid_col=cid_col,
        vec_col=vec_col, method="sql", round_scores=4,
    ).select("qid", "docid")
    cdim = corpus.select(
        F.col(cid_col).alias("docid"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    )
    cent = (
        fb.join(cdim, "docid")
        .groupBy("qid", "i")
        .agg(F.avg(F.col("x").cast("double")).alias("ci"))
    )
    qdim = queries.select(
        F.col(qid_col).alias("qid"),
        F.posexplode(F.col(vec_col)).alias("i", "qx"),
    )
    q2 = (
        qdim.join(cent, ["qid", "i"], "left")
        .select(
            "qid",
            "i",
            (
                F.lit(alpha) * F.col("qx").cast("double")
                + F.lit(beta) * F.coalesce(F.col("ci"), F.lit(0.0))
            ).alias("qi"),
        )
        .groupBy("qid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "qi"))),
                lambda s: s["qi"],
            ).alias("embedding")
        )
    )
    return brute_force_cosine_topk(
        q2, corpus, k=k, qid_col="qid", cid_col=cid_col, vec_col=vec_col,
        round_scores=round_scores, method="sql",
    )
