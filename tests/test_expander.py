"""SPLADE-style expansion path: JVM plan ≡ pandas-UDF encoder ≡ Python
oracle, and end-to-end expanded retrieval vs the weighted oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from splade_spark.config import EngineConfig
from splade_spark.fixtures import gen_pages, gen_queries
from splade_spark.functions.expander import (
    _expand_one_py,
    expand_terms,
    expand_terms_pandas,
)
from splade_spark.operators.indexing import build_index
from splade_spark.operators.query import retrieve
from splade_spark.oracle import (
    build_oracle_index_weighted,
    score_weighted_query_oracle,
)

N_DOCS = 150
N_QUERIES = 25
K = 10
CFG = EngineConfig(block_size=64, index_partitions=4)


@pytest.fixture(scope="module")
def corpus():
    pages = gen_pages(N_DOCS, seed=42)
    queries = gen_queries(N_QUERIES, pages, seed=43)
    return pages, queries


@pytest.fixture(scope="module")
def docs_df(spark, corpus):
    pages, _ = corpus
    return spark.createDataFrame(pages[["url", "text"]]).select(
        F.col("url").alias("doc_id"), "text"
    ).persist()


def _collect_vecs(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["doc_id"], {})[r["term"]] = r["weight"]
    return out


def test_expander_three_way_identical(docs_df, corpus):
    pages, _ = corpus
    jvm = _collect_vecs(expand_terms(docs_df, cfg=CFG))
    pnd = _collect_vecs(expand_terms_pandas(docs_df, cfg=CFG))
    assert set(jvm) == set(pnd) == set(pages["url"])
    for url, text in zip(pages["url"], pages["text"]):
        py = _expand_one_py(text, CFG.max_tokens)
        assert set(jvm[url]) == set(pnd[url]) == set(py)
        for t in py:
            assert np.isclose(jvm[url][t], py[t], rtol=1e-6)
            assert np.isclose(pnd[url][t], py[t], rtol=1e-6)


def test_expander_sparsity_and_saturation(corpus):
    pages, _ = corpus
    vec = _expand_one_py(pages["text"][0], CFG.max_tokens)
    # expansion terms exist but most candidates were relu-zeroed
    n_exp = sum(1 for t in vec if t.startswith("x"))
    toks = set(pages["text"][0].split())
    assert 0 < n_exp < 2 * len(toks)
    # log-saturation: weights bounded by log1p(max tf) for identity terms
    assert all(w > 0 for w in vec.values())


def test_expanded_retrieval_matches_weighted_oracle(spark, docs_df, corpus):
    pages, queries = corpus
    doc_vecs = {
        url: _expand_one_py(text, CFG.max_tokens)
        for url, text in zip(pages["url"], pages["text"])
    }
    oidx = build_oracle_index_weighted(doc_vecs, cfg=CFG)

    dw = expand_terms(docs_df, cfg=CFG)
    idx = build_index(docs_df, cfg=CFG, weighted_terms=dw)
    assert idx.meta["weighting"] == "external"

    qdf = spark.createDataFrame(queries)
    qw = expand_terms(qdf, id_col="query_id", text_col="text", cfg=CFG).select(
        F.col("doc_id").alias("query_id"), "term", "weight"
    )
    for strategy in ("exhaustive", "wand"):
        res = retrieve(idx, qdf, k=K, strategy=strategy, query_weights=qw)
        got = {}
        for r in res.collect():
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], r["score"])
            )
        for qid, text in zip(queries["query_id"], queries["text"]):
            expected = score_weighted_query_oracle(
                _expand_one_py(text, CFG.max_tokens), oidx, k=K
            )
            mine = sorted(got.get(qid, []))
            assert [d for _, d, _ in mine] == [d for d, _ in expected], (
                f"{strategy} rank mismatch for {qid}"
            )
            for (_, _, s_got), (_, s_exp) in zip(mine, expected):
                assert np.isclose(s_got, s_exp, rtol=1e-5)
    idx.unpersist()
