"""Deterministic, scale-safe global ID assignment.

Replaces the reference's implicit global doc numbering (shard order
``(rank, shard_id)`` then in-shard order,
/root/reference/src/indexing/sparse_index.py:498,643-656) with an explicit
contract: ``id = rank of key in ascending key order`` — reproducible
regardless of partitioning or cluster size (range boundaries may differ
between runs, but contiguous ordered ranges + in-partition sort always
produce the same global rank for a given key set).

Physical plan (terasort pattern, all JVM — no Python workers):
  repartitionByRange(key) → sortWithinPartitions(key) → persist →
  per-partition counts (1 small job) → driver prefix-sums →
  monotonically_increasing_id decomposed into (partition, row) +
  broadcast join against the tiny (partition → offset) table.

A ``Window.orderBy(key)`` row_number would funnel 10^12 rows through ONE
partition; this stays fully parallel, and the only driver-side state is
one long per partition.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# monotonically_increasing_id layout: upper bits = partition id, lower 33
# bits = row index within the partition (consecutive from 0)
_ROW_BITS = 33
_ROW_MASK = (1 << _ROW_BITS) - 1


def assign_global_ids(
    df: DataFrame,
    key: str,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` (long, 0-based dense rank of ``key`` asc) to ``df``.

    Keys must be unique. Returns a DataFrame backed by a persisted ranged
    sort; call ``.unpersist()`` on it when downstream results are
    materialized, or just let it age out.
    """
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_part, F.col(key))
        .sortWithinPartitions(key)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = (
        ranged.select(F.spark_partition_id().alias("_pid"))
        .groupBy("_pid")
        .count()
        .collect()
    )
    offsets = []
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["count"]
    offsets_df = spark.createDataFrame(offsets, "_pid INT, _offset LONG")

    numbered = ranged.select(
        "*",
        F.spark_partition_id().alias("_pid"),
        F.monotonically_increasing_id().bitwiseAND(F.lit(_ROW_MASK)).alias("_row"),
    )
    return (
        numbered.join(F.broadcast(offsets_df), "_pid")
        .withColumn(id_col, (F.col("_offset") + F.col("_row")).cast("long"))
        .drop("_pid", "_row", "_offset")
    )
