"""Deterministic sampling operators (operators/sampling.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from splade_spark.operators.sampling import (
    hash_u32,
    split_column,
    stratified_sample,
    threshold_for,
)


def _u32(key: str, salt: str) -> int:
    return int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(str(i), "en" if i % 3 else "de") for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id string, lang string")


def test_hash_matches_python_md5(spark):
    df = spark.createDataFrame([("k1",), ("k2",), ("99",)], "k string")
    got = {r["k"]: r["u"] for r in
           df.select("k", hash_u32("k", "s9").alias("u")).collect()}
    assert got == {k: _u32(k, "s9") for k in got}


def test_stratified_sample_is_exactly_the_hash_rule(spark, corpus):
    kept = stratified_sample(
        corpus, key_col="doc_id", strata_col="lang",
        rates={"en": 0.2, "de": 0.9}, salt="t1",
    ).collect()
    want = {
        (r["doc_id"], r["lang"])
        for r in corpus.collect()
        if _u32(r["doc_id"], "t1")
        < threshold_for({"en": 0.2, "de": 0.9}[r["lang"]])
    }
    assert {(r["doc_id"], r["lang"]) for r in kept} == want
    # rates land near target on 3k rows
    n_en = sum(1 for _, l in want if l == "en")
    assert 0.15 < n_en / 2000 < 0.25


def test_sample_is_repartition_invariant(spark, corpus):
    def run(df):
        return {r["doc_id"] for r in stratified_sample(
            df, key_col="doc_id", strata_col="lang",
            rates={"en": 0.3}, default_rate=0.05, salt="t2",
        ).collect()}

    assert run(corpus.repartition(17)) == run(corpus.coalesce(1))


def test_split_disjoint_and_deterministic(spark, corpus):
    twice = [
        {r["doc_id"]: r["s"] for r in corpus.select(
            "doc_id", split_column("doc_id", holdout_frac=0.25).alias("s")
        ).collect()}
        for _ in range(2)
    ]
    assert twice[0] == twice[1]
    frac = sum(1 for v in twice[0].values() if v == "holdout") / 3000
    assert 0.2 < frac < 0.3


def test_threshold_rejects_bad_rate():
    with pytest.raises(ValueError):
        threshold_for(1.5)
