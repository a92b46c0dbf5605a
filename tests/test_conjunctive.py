"""AND-semantics retrieval (retrieve_conjunctive) vs a Python oracle."""

import numpy as np
import pytest

from splade_spark.config import EngineConfig
from splade_spark.functions.tokenize import tokenize_py
from splade_spark.operators.indexing import build_index
from splade_spark.operators.query import retrieve_conjunctive
from splade_spark.oracle import build_oracle_index

DOCS = [
    ("d01", "hash join strategy beats nested loop join"),
    ("d02", "hash table lookup"),
    ("d03", "join order strategy"),
    ("d04", "hash join and merge join strategy compared"),
    ("d05", "strategy hash plan join hash"),
    ("d06", "completely unrelated text about rivers"),
    ("d07", "hash hash hash"),
]

QUERIES = [
    ("q_all3", "hash join strategy"),
    ("q_two", "hash join"),
    ("q_one", "strategy"),
    ("q_oov", "hash nosuchtokenzz"),
    ("q_dupterm", "hash hash join"),  # duplicate token: still 2 required
]


def _py_conjunctive_ids(oi, text, k=10):
    q = {}
    req = set()
    for t in tokenize_py(text, oi.cfg.max_tokens):
        if t in oi.cfg.exclude_terms:
            continue
        req.add(t)
        tid = oi.vocab.get(t)
        if tid is not None:
            q[tid] = q.get(tid, 0.0) + 1.0
    if any(t not in oi.vocab for t in req):
        return []
    scores = np.zeros(oi.n_docs, dtype=np.float64)
    hits = np.zeros(oi.n_docs, dtype=np.int64)
    for tid in sorted(q):
        d, w = oi.postings[tid]
        scores[d] += np.float32(q[tid]) * w.astype(np.float64)
        hits[d] += 1
    cand = np.nonzero(hits == len(req))[0]
    if cand.size == 0:
        return []
    order = np.lexsort((cand, -scores[cand]))[:k]
    return [oi.doc_ids[int(cand[i])] for i in order]


@pytest.fixture(scope="module")
def built(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    idx = build_index(docs)
    oi = build_oracle_index(DOCS)
    yield idx, oi
    idx.unpersist()


def test_conjunctive_matches_oracle(spark, built):
    idx, oi = built
    queries = spark.createDataFrame(QUERIES, "query_id string, text string")
    res = retrieve_conjunctive(idx, queries, k=10)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    for qid in got:
        got[qid] = [d for _, d in sorted(got[qid])]
    want = {
        qid: _py_conjunctive_ids(oi, text)
        for qid, text in QUERIES
        if _py_conjunctive_ids(oi, text)
    }
    assert got == want


def test_conjunctive_semantics(spark, built):
    idx, oi = built
    queries = spark.createDataFrame(QUERIES, "query_id string, text string")
    got = {}
    for r in retrieve_conjunctive(idx, queries, k=10).collect():
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    # all three terms required
    assert got["q_all3"] == {"d01", "d04", "d05"}
    # OOV term -> no results at all
    assert "q_oov" not in got
    # duplicate query token requires only the distinct set
    assert got["q_dupterm"] == got["q_two"] == {"d01", "d04", "d05"}
    # single-term conjunctive == docs containing the term
    assert got["q_one"] == {"d01", "d03", "d04", "d05"}


def test_conjunctive_rejects_lossy_index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    idx = build_index(docs, cfg=EngineConfig(min_weight=0.5))
    queries = spark.createDataFrame(
        [("q", "hash join")], "query_id string, text string"
    )
    with pytest.raises(ValueError, match="min_weight"):
        retrieve_conjunctive(idx, queries)
    idx.unpersist()

    idx2 = build_index(docs, cfg=EngineConfig(top_k_terms=2))
    with pytest.raises(ValueError, match="top_k_terms"):
        retrieve_conjunctive(idx2, queries)
    idx2.unpersist()


def _py_msm_ids(oi, text, msm, k=10):
    q = {}
    for t in tokenize_py(text, oi.cfg.max_tokens):
        if t in oi.cfg.exclude_terms:
            continue
        tid = oi.vocab.get(t)
        if tid is not None:
            q[tid] = q.get(tid, 0.0) + 1.0
    scores = np.zeros(oi.n_docs, dtype=np.float64)
    hits = np.zeros(oi.n_docs, dtype=np.int64)
    for tid in sorted(q):
        d, w = oi.postings[tid]
        scores[d] += np.float32(q[tid]) * w.astype(np.float64)
        hits[d] += 1
    cand = np.nonzero(hits >= msm)[0]
    if cand.size == 0:
        return []
    order = np.lexsort((cand, -scores[cand]))[:k]
    return [oi.doc_ids[int(cand[i])] for i in order]


def test_msm_matches_oracle(spark, built):
    from splade_spark.operators.query import retrieve_msm

    idx, oi = built
    queries = spark.createDataFrame(QUERIES, "query_id string, text string")
    for msm in (1, 2, 3):
        res = retrieve_msm(idx, queries, k=10, msm=msm)
        got = {}
        for r in res.collect():
            got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
        for qid in got:
            got[qid] = [d for _, d in sorted(got[qid])]
        want = {
            qid: _py_msm_ids(oi, text, msm)
            for qid, text in QUERIES
            if _py_msm_ids(oi, text, msm)
        }
        assert got == want, msm


def test_msm_oov_does_not_kill_query(spark, built):
    from splade_spark.operators.query import retrieve_msm

    idx, oi = built
    queries = spark.createDataFrame(
        [("q_oov", "hash join nosuchtokenzz")], "query_id string, text string"
    )
    res = retrieve_msm(idx, queries, k=10, msm=2).collect()
    assert res  # conjunctive would return nothing here
