"""Structured-Streaming incremental index ingestion.

The reference is batch-only (SURVEY §1.1 — no streaming operators exist in
FlagEmbedding); this module is the engine's forward-looking ingest path: new
corpus files land in a directory, each micro-batch is tokenized through the
same mapInArrow kernel as the batch build and APPENDED to the persisted
postings stream — the LSM design (operators/segments.py merge job) is exactly
what makes appended runs cheap to fold into the queryable index.

foreachBatch alone is at-least-once (a crash between the parquet commit and
the checkpoint offset commit replays the batch), so each batch writes to its
own ``_batch=<id>`` partition with dynamic partition overwrite — a replayed
batch OVERWRITES its own partition instead of appending duplicates, making
the sink idempotent and the end-to-end pipeline effectively exactly-once.
Docids are (batch_id << 40 | local) so they never collide across
micro-batches — the same chunk-scoped scheme as the resumable batch build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flagembedding_spark.config import BM25Config
from flagembedding_spark.operators.index_build import CorpusStats, InvertedIndex

BATCH_ID_BITS = 40


def start_incremental_ingest(
    spark: SparkSession,
    input_path: str,
    index_root: str,
    config: BM25Config | None = None,
    schema: str = "repo string, path string, commit string, lang string, content string",
    content_col: str = "content",
    available_now: bool = True,
):
    """readStream(json dir) → tokenize+count → append parquet stream.
    Returns the StreamingQuery; with available_now it drains pending files
    then stops (test/batch-catchup mode); without, it runs continuously."""
    from flagembedding_spark.operators.arrow_postings import tokenize_count_stream

    config = config or BM25Config()
    src = spark.readStream.schema(schema).json(input_path)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stream = tokenize_count_stream(batch_df, config, content_col)
        stream = stream.withColumn(
            "docid",
            (F.lit(int(batch_id)).cast("long") * (1 << BATCH_ID_BITS)) + F.col("docid"),
        ).withColumn("_batch", F.lit(int(batch_id)))
        # idempotent under foreachBatch replay: overwrite only this batch's
        # partition (dynamic mode leaves every other _batch=* untouched)
        (
            stream.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(f"{index_root}/stream")
        )

    writer = (
        src.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", f"{index_root}/_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def load_incremental_index(
    spark: SparkSession, index_root: str, config: BM25Config | None = None
) -> InvertedIndex:
    """Derive a queryable logical index over everything ingested so far
    (dictionary/stats computed on demand — cheap scans of the stream)."""
    config = config or BM25Config()
    stream = spark.read.parquet(f"{index_root}/stream")
    doc_stats = stream.filter(F.col("term").isNull()).select(
        "docid", "docid_str", "dl", "content_sha256"
    )
    postings = stream.filter(F.col("term").isNotNull()).select(
        "term", "docid", "tf", "dl"
    )
    row = doc_stats.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    stats = CorpusStats(int(row["n"]), float(row["avgdl"] or 0.0))
    n = F.lit(float(stats.n_docs))
    dictionary = (
        postings.groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumn("idf", F.log((n - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0))
    )
    return InvertedIndex(
        postings=postings, doc_stats=doc_stats, dictionary=dictionary,
        stats=stats, config=config,
    )
