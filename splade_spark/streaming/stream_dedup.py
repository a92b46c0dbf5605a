"""Stateful streaming dedup: cross-micro-batch first-seen filtering.

Engine addition for continuous ingest (no reference counterpart — the
reference is a pure batch pipeline, SURVEY.md §2.9). A crawl stream keeps
re-delivering the same page content (mirrors, re-crawls, retries); this
operator emits each content fingerprint's FIRST-seen document only,
remembering what it has seen ACROSS micro-batches with
``applyInPandasWithState`` — the custom-stateful-operator surface of
Structured Streaming.

Shape:

- fingerprint = ``textstats.fingerprint_col`` (md5 over the canonical
  token join — whitespace/punctuation-robust, identical to the batch
  `doc_fingerprint` entry's semantics);
- state KEY = ``pmod(xxhash64(fp), n_buckets)`` — the seen-set shards
  over ``n_buckets`` parallel state partitions instead of one global
  set, so state updates scale with the cluster exactly like any other
  hash-partitioned aggregation;
- state VALUE per bucket = the sorted list of fingerprints seen so far.
  At 10^12 docs the per-bucket list is bounded by docs/n_buckets — size
  n_buckets like shuffle partitions, and back the state store with
  RocksDB (`spark.sql.streaming.stateStore.providerClass`) so the list
  lives off-heap/on-disk; the operator's logic is provider-agnostic.

Determinism: within a micro-batch, the kept doc per NEW fingerprint is
the minimum doc_id (the same survivor rule as the batch dedup drop
list); across batches, first-arrival wins by stream order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from ..operators.textstats import fingerprint_col

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("fp", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("seen", ArrayType(StringType()))]
)


def _dedup_bucket(key, pdf_iter, state):
    """One state bucket's micro-batch update: emit rows whose fingerprint
    is new to this bucket, remember the rest. Chunks are concatenated
    before the min-doc_id pick so the within-batch survivor is
    deterministic regardless of Arrow chunking."""
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if not chunks:
        yield pd.DataFrame({"doc_id": [], "fp": []})
        return
    batch = pd.concat(chunks, ignore_index=True)
    batch = batch.sort_values("doc_id", kind="mergesort").drop_duplicates(
        "fp", keep="first"
    )
    seen = set(state.get[0]) if state.exists else set()
    fresh = batch[~batch["fp"].isin(seen)]
    if len(fresh):
        state.update((sorted(seen | set(fresh["fp"])),))
    yield fresh[["doc_id", "fp"]]


def streaming_first_seen(
    pages: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Streaming DataFrame (id, text, ...) → append-mode stream of
    first-seen (doc_id, fp) rows, deduped across all micro-batches."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = pages.select(
        F.col(id_col).cast("string").alias("doc_id"),
        fingerprint_col(text_col).alias("fp"),
    ).withColumn(
        "bucket", F.pmod(F.xxhash64("fp"), F.lit(n_buckets)).cast("int")
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_bucket,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_first_seen_over_files(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    schema: str = "doc_id STRING, text STRING",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drive the stateful dedup over a file-source backlog (one file per
    micro-batch by default — each file exercises a separate state
    update), drain with availableNow, and return the emitted first-seen
    rows as a batch DataFrame."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    dedup = streaming_first_seen(
        src, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )
    q = (
        dedup.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
