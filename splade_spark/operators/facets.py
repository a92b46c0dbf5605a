"""SERP facet counts: aggregate result-set metadata alongside ranked
retrieval ("1,204 results in English, 310 from example.org, …").

The reference engine returns ranked doc ids only; a web serving tier
additionally shows per-query facet distributions over the candidate
set so users can refine. This is pure DataFrame composition over the
engine's existing retrieval output — no new scoring plane:

Scale shape: the ranked result set is (queries × k) rows — broadcast
it onto the metadata table so the corpus-sized side never shuffles;
the facet aggregation then runs map-side-partial on (query, facet,
value) keys, each bounded by k. When callers facet over the FULL
candidate set (pre-top-k, unbounded), the same function works but the
results side is corpus-scale — pass ``broadcast_results=False`` and
the join falls back to a hash equi-join on doc_id, which both sides
already partition by after retrieval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def facet_counts(
    results: DataFrame,
    meta: DataFrame,
    *,
    facet_cols: list[str],
    id_col: str = "doc_id",
    query_col: str = "query_id",
    broadcast_results: bool = True,
) -> DataFrame:
    """(query_id, facet, value, n) — per-query counts of each facet
    value over the result set.

    ``results`` must carry (query_col, id_col); ``meta`` carries
    (id_col, *facet_cols). NULL facet values count under the literal
    string ``"(none)"`` so the output is join-key complete in both
    engines. One output row per (query, facet, value); deterministic.
    """
    if not facet_cols:
        raise ValueError("facet_counts: facet_cols must be non-empty")
    missing = [c for c in facet_cols if c not in meta.columns]
    if missing:
        raise ValueError(f"facet_counts: meta lacks facet cols {missing}")
    r = results.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("_fid"),
    )
    if broadcast_results:
        r = F.broadcast(r)
    m = meta.select(
        F.col(id_col).alias("_fid"),
        *[F.col(c) for c in facet_cols],
    )
    joined = r.join(m, "_fid")
    # ONE pass over the joined set: explode an inline (facet, value)
    # struct array instead of a per-facet Union — a Union would
    # duplicate the metadata scan + broadcast join once per facet
    # (plan-audited), the generate does not
    fv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("facet"),
                    F.coalesce(
                        F.col(c).cast("string"), F.lit("(none)")
                    ).alias("value"),
                )
                for c in facet_cols
            ]
        )
    )
    return (
        joined.select("query_id", fv.alias("fv"))
        .select("query_id", F.col("fv.facet").alias("facet"),
                F.col("fv.value").alias("value"))
        .groupBy("query_id", "facet", "value")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
