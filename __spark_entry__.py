"""Driver contract for the spark-graft builder (PySpark target).

Backed by ``splade_spark.entry_queries.REGISTRY`` — each entry pairs a
Spark implementation (running this repo's engine code) with an independent
DuckDB oracle SQL. Operator coverage per SURVEY.md §2 is noted in each
query's docstring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: compressed-index BM25 engine end-to-end (build → block-max
    WAND retrieve) on /root/testdata/sf0.001 documents."""
    from splade_spark.entry_queries import REGISTRY

    fn, _ = REGISTRY["bm25_topk_engine"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from splade_spark.entry_queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from splade_spark.entry_queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
