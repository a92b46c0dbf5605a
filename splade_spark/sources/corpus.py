"""Web-corpus source: the engine's S1 scan over the input-table contract.

The input is an Iceberg table of Common-Crawl-style web pages with columns
``(url string, warc_ts timestamp, html binary, text string, lang string)``
(BASELINE.json input_hint; reference corpus loading
/root/reference/src/data/dataset/base.py:245-266 generalized to a lakehouse
table). In this sandbox no Iceberg runtime jar ships, so the same contract
is read from parquet — the fixtures (fixtures.gen_pages, FIXTURES.md §1)
generate exactly this shape.

Spark-first scan properties (what makes this correct at 100 TB):
- column pruning is expressed by SELECTING only the contract columns the
  caller asks for — the parquet/Iceberg scan then reads only those column
  chunks (`ReadSchema` in the physical plan);
- ``lang`` / ``warc_ts`` predicates are plain Column filters so they reach
  the scan as pushed filters — on an Iceberg table partitioned or sorted by
  (lang, days(warc_ts)) they become partition/file pruning, not row filters;
- the doc text rule is the reference's byte-identical extraction: use the
  ``text`` column when the table carries one, else strip tags from ``html``
  (functions/tokenize.extract_text_html — proven byte-identical to the
  Python oracle in tests and the html_text_extraction oracle entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import extract_text_html

#: the input-table contract (input_hint): column -> Spark type it is cast to
WEB_CORPUS_SCHEMA = {
    "url": "string",
    "warc_ts": "timestamp",
    "html": "binary",
    "text": "string",
    "lang": "string",
}


def read_web_corpus(
    spark: SparkSession,
    location: str,
    fmt: str = "auto",
    columns: tuple[str, ...] = ("url", "warc_ts", "html", "text", "lang"),
    lang: str | None = None,
) -> DataFrame:
    """Scan the web-pages table and enforce the input contract.

    ``location`` is an Iceberg table identifier (``catalog.db.pages``) or a
    parquet path. ``fmt``: ``"iceberg"`` | ``"parquet"`` | ``"auto"``
    (paths → parquet, identifiers → iceberg). Only ``columns`` are
    selected (column pruning at the scan); a ``lang`` filter is applied as
    a Column predicate so it pushes down to partition pruning on a
    lang-partitioned table. Missing contract columns raise immediately
    with the full expected schema."""
    df = read_table(spark, location, fmt)
    unknown = [c for c in columns if c not in WEB_CORPUS_SCHEMA]
    if unknown:
        raise ValueError(f"not contract columns: {unknown}")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(
            f"web corpus at {location!r} is missing column(s) {missing}; "
            f"expected (a superset of) {WEB_CORPUS_SCHEMA}"
        )
    if lang is not None:
        if "lang" not in df.columns:
            raise ValueError("lang filter requested but table has no 'lang'")
        df = df.filter(F.col("lang") == lang)
    return df.select(
        *[F.col(c).cast(WEB_CORPUS_SCHEMA[c]).alias(c) for c in columns]
    )


def read_table(spark: SparkSession, location: str, fmt: str = "auto") -> DataFrame:
    """The raw format split without the contract projection — for callers
    with non-contract column names (e.g. the build CLI's --id-col/
    --text-col). ``auto``: paths (contain '/', end in .parquet, or exist
    on the local filesystem — a bare relative dir like ``pages`` is a
    path, not a catalog identifier) → parquet, anything else → iceberg."""
    import os

    if fmt == "auto":
        fmt = "parquet" if (
            "/" in location or location.endswith(".parquet")
            or os.path.exists(location)
        ) else "iceberg"
    if fmt == "parquet":
        return spark.read.parquet(location)
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(location)
        except Exception as e:  # no runtime jar / no catalog in this env
            raise RuntimeError(
                "iceberg read failed — an Iceberg runtime jar and catalog "
                "config are required (spark.sql.catalog.*); in jar-less "
                "environments pass fmt='parquet' with a path. "
                f"Underlying error: {e}"
            ) from e
    raise ValueError(f"unknown fmt {fmt!r} (iceberg|parquet|auto)")


def corpus_docs(pages: DataFrame, prefer: str = "text") -> DataFrame:
    """Pages → ``(doc_id, text)`` for the index build, applying the
    reference's byte-identical per-url text rule: the ``text`` column when
    present (``prefer="text"``), else tag-stripped ``html``
    (``prefer="html"`` forces re-extraction; the fixture invariant is
    strip_tags(html) == text exactly, asserted by the
    html_text_extraction oracle entry)."""
    if prefer == "text" and "text" in pages.columns:
        text = F.col("text")
    elif "html" in pages.columns:
        text = extract_text_html("html")
    else:
        raise ValueError("pages has neither a usable 'text' nor 'html' column")
    return pages.select(F.col("url").alias("doc_id"), text.alias("text"))
