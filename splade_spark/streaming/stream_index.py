"""Structured Streaming ingestion: continuous corpus → incremental index
shards + live corpus statistics.

Engine addition. The reference is a pure batch pipeline (SURVEY.md §2.9);
its closest construct is the async shard writer
(/root/reference/src/indexing/async_writer.py:57-137) — a bounded-queue
producer/consumer draining encode batches to shards off the hot path.
Structured Streaming generalizes that: each micro-batch of newly-arrived
pages is tokenized with the SAME JVM tokenizer as the batch build and
written as a tf/dl shard keyed by batch id; ``build_index_from_batches``
then folds all arrived shards into a full index (the batch engine's
stage-2).

Exactly-once shard commits: each micro-batch writes into its OWN
``batch_id=<n>`` partition with dynamic-partition OVERWRITE, so a batch
that fails mid-write (or after writing but before the streaming
checkpoint commits) is simply re-run and its partition replaced — a retry
can never duplicate rows. This is the same write-audit pattern
checkpoint.py uses for resumable-build buckets.

Also provides a watermarked event-time aggregation over the page stream
(docs/tokens per window) for live build telemetry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.tokenize import tokens_col
from ..operators.indexing import InvertedIndex, index_from_tf


def stream_corpus(
    spark: SparkSession,
    input_dir: str,
    schema: str = "url STRING, warc_ts TIMESTAMP, text STRING",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of page parquet drops (new files = new docs).
    ``max_files_per_trigger`` bounds micro-batch size (and lets the
    watermark advance across a backlog instead of one giant batch)."""
    rs = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        rs = rs.option("maxFilesPerTrigger", max_files_per_trigger)
    return rs.parquet(input_dir)


def write_tf_dl_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    id_col: str = "url",
    text_col: str = "text",
    cfg: EngineConfig = DEFAULT,
) -> None:
    """Idempotently commit one micro-batch's tf/dl shard: every row lands
    in the ``batch_id=<n>`` partition, written with dynamic-partition
    overwrite — re-running the same batch (streaming retry after a crash
    between the two table writes, or after write but before checkpoint
    commit) replaces the partition instead of appending duplicates."""
    spark = batch_df.sparkSession
    toks = batch_df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        tokens_col(text_col, cfg.max_tokens).alias("tokens"),
    ).persist()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            toks.select("doc_id", F.explode("tokens").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).cast("int").alias("tf"))
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(os.path.join(out_dir, "tf"))
        )
        (
            toks.select("doc_id", F.size("tokens").cast("int").alias("dl"))
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(os.path.join(out_dir, "dl"))
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        toks.unpersist()


def start_shard_stream(
    pages: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "url",
    text_col: str = "text",
    cfg: EngineConfig = DEFAULT,
    available_now: bool = False,
):
    """pages stream → per-micro-batch tf/dl shards under ``out_dir``.

    foreachBatch + per-batch dynamic partition overwrite
    (write_tf_dl_batch): the streaming checkpoint tracks which batches
    are done, and a replayed batch overwrites its own partition — shard
    commits are exactly-once under retries."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_tf_dl_batch(batch_df, batch_id, out_dir, id_col, text_col, cfg)

    writer = (
        pages.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def build_index_from_batches(
    spark: SparkSession, out_dir: str, cfg: EngineConfig = DEFAULT
) -> InvertedIndex:
    """Fold every arrived micro-batch shard into a full index (stage 2 of
    the batch engine, indexing.index_from_tf)."""
    tf = spark.read.parquet(os.path.join(out_dir, "tf")).select(
        "doc_id", "term", "tf"
    )
    dl = spark.read.parquet(os.path.join(out_dir, "dl")).select("doc_id", "dl")
    return index_from_tf(tf, dl, cfg=cfg)


def start_ingest_stats_stream(
    pages: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    cfg: EngineConfig = DEFAULT,
    available_now: bool = False,
):
    """Watermarked event-time telemetry: docs + tokens per ingest window,
    late rows beyond the watermark dropped. Append-mode parquet sink."""
    agg = (
        pages.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens_col(text_col, cfg.max_tokens))).alias("n_tokens"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_docs", "n_tokens",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
