"""Deterministic, scale-safe global ID assignment.

Replaces the reference's implicit global doc numbering (shard order
``(rank, shard_id)`` then in-shard order,
/root/reference/src/indexing/sparse_index.py:498,643-656) with an explicit
contract: ``id = rank of key in ascending key order`` — reproducible
regardless of partitioning or cluster size.

Physical plan (terasort pattern, no single-partition window):
  repartitionByRange(key) → sortWithinPartitions(key) → persist →
  per-partition counts (1 small job) → driver prefix-sums →
  mapInPandas numbering with broadcast offsets.

A ``Window.orderBy(key)`` row_number would funnel 10^12 rows through ONE
partition; this stays fully parallel.
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["count"]
    b_offsets = spark.sparkContext.broadcast(offsets)

    schema = T.StructType(list(df.schema.fields) + [T.StructField(id_col, T.LongType(), False)])

    def number(batches):
        pid = TaskContext.get().partitionId()
        base = b_offsets.value.get(pid, 0)
        seen = 0
        for pdf in batches:
            pdf[id_col] = np.arange(base + seen, base + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    return ranged.mapInPandas(number, schema=schema)
