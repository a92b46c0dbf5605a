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


# ---------------------------------------------------------------------------
# Pooling-mode x activation grid (reference splade.py:11-40,69-87 parity)
# ---------------------------------------------------------------------------

from splade_spark.functions.expander import (  # noqa: E402
    ACTIVATIONS,
    _expand_pooled_one_py,
    expand_terms_pooled,
)


@pytest.mark.parametrize("activation", ACTIVATIONS)
@pytest.mark.parametrize("mode", [0.0, 0.25, 1.0])
def test_pooled_grid_matches_py_oracle(spark, docs_df, corpus, mode, activation):
    """Spark Column plan == per-doc Python oracle across the full
    (pooling_mode, activation) grid, float32-exact."""
    pages, _ = corpus
    sub = docs_df.limit(40)
    got = {}
    for r in expand_terms_pooled(
        sub, pooling_mode=mode, activation=activation
    ).collect():
        got.setdefault(r["doc_id"], {})[r["term"]] = np.float32(r["weight"])
    texts = {r["doc_id"]: r["text"] for r in sub.collect()}
    for did, text in texts.items():
        want = {
            t: np.float32(w)
            for t, w in _expand_pooled_one_py(text, 256, mode, activation).items()
        }
        assert got.get(did, {}) == want, (did, mode, activation)


def test_pooled_mode_one_is_max_mode_zero_is_sum(spark, docs_df):
    """mode=1 weight for a dim == max contribution; mode=0 == tf-weighted
    sum — spot-checked via a hand doc where identity and expansion dims
    are disjoint."""
    df = spark.createDataFrame(
        [("d1", "alpha alpha beta")], "doc_id string, text string"
    )
    mx = {r["term"]: r["weight"] for r in expand_terms_pooled(
        df, pooling_mode=1.0, activation="relu").collect()}
    sm = {r["term"]: r["weight"] for r in expand_terms_pooled(
        df, pooling_mode=0.0, activation="relu").collect()}
    py_mx = _expand_pooled_one_py("alpha alpha beta", 256, 1.0, "relu")
    py_sm = _expand_pooled_one_py("alpha alpha beta", 256, 0.0, "relu")
    assert {t: np.float32(w) for t, w in py_mx.items()} == {
        t: np.float32(w) for t, w in mx.items()}
    assert {t: np.float32(w) for t, w in py_sm.items()} == {
        t: np.float32(w) for t, w in sm.items()}
    # tf=2 for alpha: sum pooling doubles the identity contribution
    assert sm["alpha"] == pytest.approx(2 * mx["alpha"], rel=1e-6)


def test_pooled_validation():
    with pytest.raises(ValueError, match="activation"):
        _expand_pooled_one_py("x", 256, 1.0, "gelu")
    with pytest.raises(ValueError, match="pooling_mode"):
        _expand_pooled_one_py("x", 256, 1.5, "relu")
