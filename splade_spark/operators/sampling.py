"""Deterministic sampling for training-data mixes: hash-based, seedable,
engine-portable.

A training mix ("10% of English web, 50% of German, all of code…") must
be REPRODUCIBLE — rerunning the pipeline on the same corpus must pick
the same rows, regardless of partitioning, cluster size, or engine.
Spark's ``df.sample`` cannot promise that (it is partition-order
dependent), so these operators decide membership per ROW from a salted
md5 of the row's key:

    u32(key) = int(md5(key || ':' || salt)[:8 hex])   — uniform in [0, 2^32)
    keep     = u32 < rate · 2^32                       — integer-exact

Pure Column expressions, zero shuffle, no RNG state; the same rule is
one line of ANSI SQL in any engine with md5 (the oracle entries pin
Spark and DuckDB to identical picks). Changing ``salt`` redraws every
decision independently — use it for resampling experiments and for
decorrelating the sample from any other md5-keyed operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_U32 = 1 << 32


def hash_u32(key, salt: str = "s0") -> Column:
    """Deterministic uniform uint32 from a row key: first 8 md5 hex
    nibbles of ``key:salt``. Portable to any md5-capable engine."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(key.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


def threshold_for(rate: float) -> int:
    """Integer keep-threshold for a rate in [0, 1] (row kept iff
    u32 < threshold) — compute once and embed the integer in BOTH
    engines so the decision never touches floating point."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * _U32)


def stratified_sample(
    df: DataFrame,
    *,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value → keep rate; strata not listed use
    ``default_rate``. The filter is a pure Column predicate — it rides
    the scan, and at 100 TB the sample never materializes the rejected
    rows anywhere.
    """
    u = hash_u32(key_col, salt)
    thr: Column = F.lit(threshold_for(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(threshold_for(rate))).otherwise(thr)
    return df.filter(u < thr)


def split_column(
    key_col: str,
    *,
    holdout_frac: float,
    salt: str = "split0",
    train_label: str = "train",
    holdout_label: str = "holdout",
) -> Column:
    """Deterministic train/holdout assignment as a Column — add it with
    ``withColumn`` and both splits stay disjoint and reproducible across
    reruns, engines, and repartitions."""
    u = hash_u32(key_col, salt)
    return (
        F.when(u < F.lit(threshold_for(holdout_frac)), holdout_label)
        .otherwise(train_label)
    )
