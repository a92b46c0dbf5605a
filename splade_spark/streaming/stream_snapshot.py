"""Stateful streaming snapshot filter: strictly-newer-per-URL passes.

Online counterpart of ``operators/weburl.latest_snapshot`` (engine
addition — the reference is a pure batch pipeline, SURVEY.md §2.9). A
live crawl feed re-delivers pages endlessly: most arrivals are
re-crawls no newer than what the index already holds. This operator
lets a snapshot through ONLY if its timestamp is strictly newer than
every snapshot previously passed for the same canonical URL, across
micro-batches, via ``applyInPandasWithState``. Each emitted row is an
index refresh — feed them to ``operators/merge.upsert_docs`` and the
served index always holds the newest crawl of every page.

Shape (same scale design as ``stream_dedup``):

- the URL is canonicalized first (``weburl.canonicalize_url`` — pure
  Column, rides the stream's projection) so spelling-distinct
  re-crawls hit one state key;
- state KEY = ``pmod(xxhash64(canonical_url), n_buckets)`` — the
  watermark map shards over ``n_buckets`` parallel state partitions,
  scaling like any hash-partitioned aggregation;
- state VALUE per bucket = parallel arrays (urls, max-ts-micros seen).
  Per-bucket size is bounded by distinct-URLs/n_buckets — size
  n_buckets like shuffle partitions and back the store with RocksDB at
  crawl scale; the logic is provider-agnostic.

Determinism: within a micro-batch only the newest row per canonical URL
is considered (ties break on doc_id string DESC); across batches a row
passes iff ts is STRICTLY greater than the stored maximum — equal-ts
re-deliveries are suppressed, so replaying a batch is idempotent.

Timestamps travel as int64 epoch-micros (``F.unix_micros``) so state
arithmetic is pure integers — no tz round-trips through Arrow.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.weburl import canonicalize_url

OUTPUT_SCHEMA = StructType(
    [
        StructField("canonical_url", StringType()),
        StructField("doc_id", StringType()),
        StructField("ts_us", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("urls", ArrayType(StringType())),
        StructField("max_ts", ArrayType(LongType())),
    ]
)

_EMPTY = pd.DataFrame({"canonical_url": [], "doc_id": [], "ts_us": []})


def _snapshot_bucket(key, pdf_iter, state):
    """One state bucket's micro-batch update: keep the batch's newest
    row per canonical URL, pass it iff strictly newer than the stored
    per-URL maximum, and advance the stored maxima. Chunks concatenate
    before the winner pick so Arrow chunking can't change the result."""
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if not chunks:
        yield _EMPTY
        return
    batch = pd.concat(chunks, ignore_index=True)
    batch = batch.sort_values(
        ["ts_us", "doc_id"], ascending=False, kind="mergesort"
    ).drop_duplicates("canonical_url", keep="first")
    if state.exists:
        urls, max_ts = state.get
        seen = dict(zip(urls, max_ts))
    else:
        seen = {}
    newer = batch["canonical_url"].map(
        lambda u: seen.get(u, -(1 << 62))
    ) < batch["ts_us"]
    fresh = batch[newer]
    if len(fresh):
        seen.update(zip(fresh["canonical_url"], fresh["ts_us"]))
        keys = sorted(seen)
        state.update((keys, [seen[k] for k in keys]))
    yield fresh[["canonical_url", "doc_id", "ts_us"]]


def streaming_latest_snapshots(
    pages: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Streaming DataFrame (url, ts, id, ...) → append-mode stream of
    (canonical_url, doc_id, ts_us) rows, each strictly newer than
    anything previously emitted for its canonical URL."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = pages.select(
        canonicalize_url(url_col).alias("canonical_url"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
    ).withColumn(
        "bucket",
        F.pmod(F.xxhash64("canonical_url"), F.lit(n_buckets)).cast("int"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _snapshot_bucket,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_latest_snapshots_over_files(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    schema: str = "url STRING, doc_id STRING, warc_ts TIMESTAMP",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drive the snapshot filter over a file-source backlog (one file
    per micro-batch by default), drain with availableNow, and return
    the emitted fresh-snapshot rows as a batch DataFrame."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    fresh = streaming_latest_snapshots(
        src, url_col=url_col, ts_col=ts_col, id_col=id_col,
        n_buckets=n_buckets,
    )
    q = (
        fresh.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
