"""Web-corpus source contract (sources/corpus.py): scan, pruning, text
rule, and the iceberg/parquet format split."""

import os
import tempfile

import pytest

from splade_spark.fixtures import gen_pages
from splade_spark.sources import corpus_docs, read_web_corpus


@pytest.fixture(scope="module")
def pages_path(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="splade_pages_"), "pages")
    spark.createDataFrame(gen_pages(50, seed=7)).write.parquet(path)
    return path


def test_contract_read_and_cast(spark, pages_path):
    df = read_web_corpus(spark, pages_path)  # auto → parquet (path)
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"
    ]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types == {
        "url": "string", "warc_ts": "timestamp", "html": "binary",
        "text": "string", "lang": "string",
    }
    assert df.count() == 50


def test_column_pruning_reaches_scan(spark, pages_path):
    df = read_web_corpus(spark, pages_path, columns=("url", "lang"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the scan must read ONLY the two projected columns — html/text
    # (the wide columns) never leave the parquet footer
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "url" in read_schema and "lang" in read_schema
    assert "html" not in read_schema and "text" not in read_schema


def test_lang_filter_pushdown(spark, pages_path):
    df = read_web_corpus(spark, pages_path, columns=("url", "lang"), lang="en")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters:")[1]
    assert df.filter("lang != 'en'").count() == 0


def test_corpus_docs_text_rule(spark, pages_path):
    pages = read_web_corpus(spark, pages_path)
    via_text = corpus_docs(pages, prefer="text").orderBy("doc_id").collect()
    via_html = corpus_docs(pages, prefer="html").orderBy("doc_id").collect()
    # fixture invariant: strip_tags(html) == text byte-identically, so the
    # two extraction routes agree per url
    assert [(r["doc_id"], r["text"]) for r in via_text] == [
        (r["doc_id"], r["text"]) for r in via_html
    ]


def test_missing_column_raises(spark, pages_path):
    narrow = os.path.join(tempfile.mkdtemp(prefix="splade_narrow_"), "p")
    read_web_corpus(spark, pages_path, columns=("url", "text")).write.parquet(narrow)
    with pytest.raises(ValueError, match="missing column.*html"):
        read_web_corpus(spark, narrow)
    with pytest.raises(ValueError, match="not contract columns"):
        read_web_corpus(spark, pages_path, columns=("url", "nope"))


def test_iceberg_without_jar_raises_cleanly(spark):
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        read_web_corpus(spark, "catalog.db.pages", fmt="iceberg")
