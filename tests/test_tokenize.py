import duckdb
from pyspark.sql import functions as F

from splade_spark.functions.tokenize import (
    extract_text_html,
    extract_text_html_py,
    tokenize_py,
    tokens_col,
    tokens_sql,
)


SAMPLES = [
    "Hello, World! 42 times.",
    "  multiple   spaces\tand\nnewlines ",
    "ALL-CAPS and MiXeD_case tok9ens",
    "",
    None,
    "x " * 500,  # truncation at 256
    "ünïcode stays out — only a-z0-9",
]


def test_py_vs_spark(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i int, t string")
    got = {r["i"]: r["toks"] for r in df.select("i", tokens_col("t").alias("toks")).collect()}
    for i, s in enumerate(SAMPLES):
        assert got[i] == tokenize_py(s), f"sample {i}"


def test_py_vs_duckdb():
    for s in SAMPLES:
        if s is None:
            continue
        got = duckdb.sql(f"select {tokens_sql('?')} as t", params=[s]).fetchone()[0]
        assert got == tokenize_py(s)


def test_truncation():
    assert len(tokenize_py("a " * 500)) == 256


def test_html_extraction_byte_identical(spark):
    texts = ["plain words here", "with 42 numbers", ""]
    rows = [(f"<html><body><p>{t}</p></body></html>".encode(), t) for t in texts]
    df = spark.createDataFrame(rows, "html binary, text string")
    bad = df.filter(extract_text_html("html") != F.col("text")).count()
    assert bad == 0
    for h, t in rows:
        assert extract_text_html_py(h) == t
