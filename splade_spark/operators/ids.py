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
    persist: bool = True,
) -> DataFrame:
    """Add ``id_col`` (long, 0-based dense rank of ``key`` asc) to ``df``.

    Keys must be unique. The internal materialization of the ranged sort
    is a CORRECTNESS requirement, not a cache: the partition-counts job
    and the data job(s) would otherwise re-execute the range exchange
    under different column-pruned plans, and RangePartitioner re-SAMPLES
    its boundaries per plan — the same key can land in different
    partitions across jobs, misaligning the driver-side offsets (observed
    as id collisions). It is a LOCAL CHECKPOINT rather than a persist()
    because a persist lives in the plan-aware CacheManager, which
    INVALIDATES cached plans whenever their source path is written — e.g.
    a streaming micro-batch appending a new partition to the tf/dl table
    an index was built from would silently uncache the ranged sort and
    re-execute it against the GROWN table under the stale offsets
    (observed as an index whose doc_dim mutates after later stream
    batches). RDD-level checkpoint blocks are immune to that
    invalidation; if blocks are lost (executor death) the job fails
    loudly instead of recomputing wrong ids.
    """
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_part, F.col(key)).sortWithinPartitions(key)
    if persist:
        # eager=False: materializes inside the counts job below (single
        # pass), then the lineage is truncated at the checkpointed blocks
        ranged = ranged.localCheckpoint(eager=False)
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
