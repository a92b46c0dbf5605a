"""Flexible-schema qrels loading + the qrels↔queries semi-join filters.

Reproduces the reference's qrels ingestion
(/root/reference/src/data/pd_module/retrieval.py:178-204): relevance rows
arrive with any of several column spellings —
``query-id/query_id/qid/_id`` × ``corpus-id/doc_id/pid/docid`` ×
``score/relevance/rel`` — ids are stringified, a missing score column
defaults to 0, qrels are restricted to loaded queries (P3, line 190), and
evaluation queries are restricted to those having qrels (P4, lines
201-204). All DataFrame ops; the semi-joins broadcast (query sets are
small next to a corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUERY_ID_COLS = ("query-id", "query_id", "qid", "_id")
DOC_ID_COLS = ("corpus-id", "doc_id", "pid", "docid")
SCORE_COLS = ("score", "relevance", "rel")


def _first_present(df: DataFrame, candidates: tuple[str, ...]) -> str | None:
    cols = set(df.columns)
    for c in candidates:
        if c in cols:
            return c
    return None


def load_qrels(raw: DataFrame) -> DataFrame:
    """Normalize a qrels-shaped DataFrame of ANY accepted column spelling
    to ``(query_id string, doc_id string, relevance double)``. Raises if
    no query/doc id column is recognized; a missing score column yields
    relevance 0.0 (the reference's ``or 0`` default)."""
    qcol = _first_present(raw, QUERY_ID_COLS)
    dcol = _first_present(raw, DOC_ID_COLS)
    if qcol is None or dcol is None:
        raise ValueError(
            f"load_qrels: unrecognized qrels schema {raw.columns}; need one of "
            f"{QUERY_ID_COLS} and one of {DOC_ID_COLS}"
        )
    scol = _first_present(raw, SCORE_COLS)
    rel = (
        F.coalesce(F.col(scol).cast("double"), F.lit(0.0))
        if scol is not None
        else F.lit(0.0)
    )
    return raw.select(
        F.col(qcol).cast("string").alias("query_id"),
        F.col(dcol).cast("string").alias("doc_id"),
        rel.alias("relevance"),
    )


def filter_qrels_to_queries(qrels: DataFrame, queries: DataFrame) -> DataFrame:
    """P3: keep qrels rows whose query id is in the loaded query set
    (reference retrieval.py:190)."""
    q = queries.select(F.col("query_id").cast("string").alias("query_id"))
    return qrels.join(F.broadcast(q), "query_id", "left_semi")


def filter_queries_with_qrels(queries: DataFrame, qrels: DataFrame) -> DataFrame:
    """P4: restrict evaluation queries to those having qrels (reference
    retrieval.py:201-204 — 'avoid scoring unlabeled queries')."""
    qr = qrels.select(F.col("query_id").cast("string").alias("query_id")).distinct()
    return queries.join(F.broadcast(qr), "query_id", "left_semi")
