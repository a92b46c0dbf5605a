"""Tests for operators/decontam.py and operators/lm.py against plain
Python oracles, plus cross-strategy parity (join vs intersect, string
vs hashed n-grams)."""

import math

from pyspark.sql import functions as F

from splade_spark.functions.tokenize import tokenize_py
from splade_spark.operators.decontam import (
    contamination_stats,
    decontaminate,
    eval_ngram_set,
    ngrams_col,
)
from splade_spark.operators.lm import (
    doc_lm_cost,
    oov_cost_micro,
    top_ngrams,
    train_unigram_lm,
)
from splade_spark.functions.tokenize import tokens_col


def py_ngrams(text, n):
    toks = tokenize_py(text)
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


CORPUS = [
    ("d1", "the quick brown fox jumps over the lazy dog"),
    ("d2", "pack my box with five dozen liquor jugs"),
    ("d3", "the quick brown fox is a benchmark sentence"),
    ("d4", "completely unrelated text about spark plans"),
    ("d5", "aa"),  # shorter than n: zero n-grams
    ("d6", None),  # null text
]
EVAL = [
    ("e1", "the quick brown fox appears in this benchmark"),
    ("e2", "five dozen liquor jugs on a shelf"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_ngrams_col_matches_python(spark):
    df = _df(spark, CORPUS).select(
        "doc_id", ngrams_col(tokens_col("text"), 3).alias("g")
    )
    got = {r["doc_id"]: r["g"] for r in df.collect()}
    for doc_id, text in CORPUS:
        assert got[doc_id] == py_ngrams(text or "", 3), doc_id


def test_contamination_stats_matches_python(spark):
    ev_set = set()
    for _, t in EVAL:
        ev_set.update(py_ngrams(t, 3))
    expected = {}
    for doc_id, text in CORPUS:
        gs = set(py_ngrams(text or "", 3))
        expected[doc_id] = (len(gs), len(gs & ev_set))
    stats = contamination_stats(_df(spark, CORPUS), _df(spark, EVAL), n=3)
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_hit"], r["contaminated"])
        for r in stats.collect()
    }
    assert set(got) == set(expected)
    for doc_id, (n_g, n_hit) in expected.items():
        assert got[doc_id] == (n_g, n_hit, n_hit > 0), doc_id


def test_strategies_agree(spark):
    docs, evl = _df(spark, CORPUS), _df(spark, EVAL)
    base = contamination_stats(docs, evl, n=3, method="join")
    rows = sorted(map(tuple, base.collect()))
    for method, hashed in (
        ("join", True),
        ("intersect", False),
        ("intersect", True),
    ):
        other = contamination_stats(
            docs, evl, n=3, method=method, hash_ngrams=hashed
        )
        assert sorted(map(tuple, other.collect())) == rows, (method, hashed)


def test_decontaminate_drops_overlapping_docs(spark):
    kept = decontaminate(_df(spark, CORPUS), _df(spark, EVAL), n=3)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # d1/d3 share "the quick brown"+; d2 shares "five dozen liquor"+
    assert ids == {"d4", "d5", "d6"}
    # relaxed threshold keeps docs with few overlapping n-grams
    loose = decontaminate(_df(spark, CORPUS), _df(spark, EVAL), n=3, max_hits=2)
    loose_ids = {r["doc_id"] for r in loose.select("doc_id").collect()}
    assert {"d4", "d5", "d6"} < loose_ids


def test_eval_ngram_set_distinct(spark):
    ev = eval_ngram_set(_df(spark, EVAL), n=3)
    grams = [r["ngram"] for r in ev.collect()]
    assert len(grams) == len(set(grams))
    expected = set()
    for _, t in EVAL:
        expected.update(py_ngrams(t, 3))
    assert set(grams) == expected


def _py_lm(rows):
    counts = {}
    total = 0
    for _, text in rows:
        for t in tokenize_py(text or ""):
            counts[t] = counts.get(t, 0) + 1
            total += 1
    v = len(counts)
    cost = {
        t: round(-math.log((c + 1) / (total + v)) * 1_000_000)
        for t, c in counts.items()
    }
    oov = round(-math.log(1 / (total + v)) * 1_000_000)
    return cost, oov


def test_unigram_lm_matches_python(spark):
    docs = _df(spark, CORPUS)
    lm = train_unigram_lm(docs)
    cost, oov = _py_lm(CORPUS)
    got = {r["token"]: r["cost_micro"] for r in lm.collect()}
    assert got == cost
    assert oov_cost_micro(lm) == oov


def test_doc_lm_cost_exact_and_oov(spark):
    docs = _df(spark, CORPUS)
    lm = train_unigram_lm(docs)
    cost, oov = _py_lm(CORPUS)
    # score a set containing OOV tokens and an empty doc
    score_rows = [
        ("s1", "the quick zzznovel fox"),  # 1 OOV token
        ("s2", ""),                        # empty: zero cost
        ("s3", None),                      # null: zero cost
        ("s4", "the the the"),             # tf > 1
    ]
    out = doc_lm_cost(_df(spark, score_rows), lm)
    got = {r["doc_id"]: (r["n_tokens"], r["nll_micro"]) for r in out.collect()}
    for doc_id, text in score_rows:
        toks = tokenize_py(text or "")
        want = sum(cost.get(t, oov) for t in toks)
        assert got[doc_id] == (len(toks), want), doc_id
    assert got["s2"] == (0, 0)
    assert got["s3"] == (0, 0)


def test_top_ngrams_deterministic_order(spark):
    docs = _df(spark, CORPUS)
    out = top_ngrams(docs, n=2, k=5).collect()
    # python oracle
    freqs = {}
    for _, text in CORPUS:
        for g in py_ngrams(text or "", 2):
            freqs[g] = freqs.get(g, 0) + 1
    want = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["ngram"], r["freq"]) for r in out] == want


def test_decontam_plan_broadcasts_eval_side(spark):
    docs, evl = _df(spark, CORPUS), _df(spark, EVAL)
    # join strategy: the eval n-gram set must arrive as a broadcast hash
    # join — the corpus side is never shuffled on the n-gram key
    plan = (
        contamination_stats(docs, evl, n=3, method="join")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # intersect strategy: single-row broadcast, zero joins on the corpus
    # beyond the nested-loop broadcast of the one-row eval array
    plan2 = (
        contamination_stats(docs, evl, n=3, method="intersect")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan2
    assert "SortMergeJoin" not in plan2 and "ShuffledHashJoin" not in plan2


def test_embedding_near_dup_pairs_modes(spark):
    import math

    from splade_spark.operators.dedup import embedding_near_dup_pairs

    vecs = [
        ("v1", [1.0, 0.5, 0.2, 0.1]),
        ("v2", [0.9, 0.55, 0.18, 0.12]),   # near-dup of v1, same signs
        ("v3", [-1.0, 0.5, 0.2, 0.1]),     # different bucket (sign flip)
        ("v4", [1.0, -0.5, 0.2, 0.1]),     # different bucket
        ("v5", [0.2, 0.9, 0.4, 0.3]),      # same bucket as v1, low cos
    ]
    emb = spark.createDataFrame(vecs, "vec_id string, embedding array<float>")

    def cos(x, y):
        # float32 casts first, like the Column pipeline
        import numpy as np
        a, b = np.array(x, np.float32).astype(float), np.array(y, np.float32).astype(float)
        return float(a @ b / (math.sqrt(a @ a) * math.sqrt(b @ b)))

    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_pairs(
            emb, n_bits=4, threshold=0.9, hyperplanes="axis"
        ).collect()
    }
    # only (v1, v2) share a bucket AND clear 0.9; (v1, v5) share the
    # bucket but score below threshold; v3/v4 are in other buckets
    assert set(got) == {("v1", "v2")}
    assert abs(got[("v1", "v2")] - cos(vecs[0][1], vecs[1][1])) < 1e-9
    # random-hyperplane mode is deterministic across invocations and
    # never pairs a vector with itself
    r1 = sorted(map(tuple, embedding_near_dup_pairs(
        emb, n_bits=4, threshold=0.0, hyperplanes="random", seed=3, dim=4
    ).collect()))
    r2 = sorted(map(tuple, embedding_near_dup_pairs(
        emb, n_bits=4, threshold=0.0, hyperplanes="random", seed=3, dim=4
    ).collect()))
    assert r1 == r2
    assert all(a != b for a, b, _ in r1)


def test_related_terms_pmi_hand_example(spark):
    """PMI over presence pairs on a hand-computable corpus: seed 'a'
    co-occurs with 'b' in 2 docs and with 'c' in 3; 'stop' (df=5 of 5)
    falls to the df cap; singleton co-occurrence falls to min_cooc."""
    import math

    from splade_spark.operators.lm import related_terms

    rows = [
        ("d1", "a b c stop"),
        ("d2", "a b c stop"),
        ("d3", "a c rare stop"),
        ("d4", "b c stop"),
        ("d5", "c stop"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    seeds = spark.createDataFrame([("a",), ("zz",)], "seed string")
    out = related_terms(
        docs, seeds, topn=5, min_cooc=2, max_df_frac=0.8
    ).collect()
    got = {(r["seed"], r["rank"]): (r["term"], r["cooc"], r["pmi_micro"])
           for r in out}
    # df: a=3, b=3, c=5, rare=1, stop=5 (cap = floor(0.8*5) = 4 -> c,
    # stop dropped); cooc(a,b)=2, cooc(a,c)=3 (c capped),
    # cooc(a,rare)=1 (< min_cooc), cooc(a,stop)=3 (capped)
    pmi_ab = round(math.log(5 * 2 / (3 * 3)) * 1_000_000)
    assert got == {("a", 1): ("b", 2, pmi_ab)}
