"""ANN operator library (operators/ann.py).

The driver-gated entries (ann_cosine_topk / ann_lsh_bucketed /
ann_lsh_multiprobe / ann_ivf_topk) pin these operators at their oracle
operating points; these tests exercise the parameterized surface — other
k / n_bits / nprobe, external query DataFrames, the trained k-means
quantizer — against a NumPy brute-force oracle.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from splade_spark.operators.ann import (
    assign_to_centroids,
    cosine_topk,
    ivf_topk,
    lsh_topk,
    random_hyperplane_bucket,
    sign_lsh_bucket,
    train_kmeans_centroids,
)

N_VEC, DIM, SEED = 120, 12, 7


@pytest.fixture(scope="module")
def vec_np():
    rng = np.random.default_rng(SEED)
    return rng.normal(size=(N_VEC, DIM)).astype("float32")


@pytest.fixture(scope="module")
def vec_df(spark, vec_np):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vec_np)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def np_topk(vec, query_ids, k):
    """Brute-force cosine oracle with the engine's tie rule."""
    v = vec.astype("float64")
    nrm = np.linalg.norm(v, axis=1)
    out = {}
    for q in query_ids:
        cos = (v @ v[q]) / (nrm * nrm[q])
        order = sorted(
            (i for i in range(len(v)) if i != q), key=lambda i: (-cos[i], i)
        )
        out[q] = [(r + 1, i, cos[i]) for r, i in enumerate(order[:k])]
    return out


def test_cosine_topk_matches_numpy(vec_df, vec_np):
    got = cosine_topk(vec_df, F.col("vec_id") < 4, k=7).collect()
    want = np_topk(vec_np, range(4), 7)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cos"]))
    for q in range(4):
        ours = sorted(by_q[q])
        for (rk, vid, c), (wrk, wvid, wc) in zip(ours, want[q]):
            assert (rk, vid) == (wrk, wvid)
            assert math.isclose(c, wc, rel_tol=1e-9)


def test_cosine_topk_external_queries(spark, vec_df, vec_np):
    # query vectors NOT in the corpus: exclude_self must not apply by id
    qv = vec_np[:2] * 0.5  # scaled copies -> same cosines as vectors 0/1
    qdf = spark.createDataFrame(
        [(1000 + i, [float(x) for x in v]) for i, v in enumerate(qv)],
        "vec_id int, embedding array<float>",
    )
    got = cosine_topk(vec_df, qdf, k=1, exclude_self=False).collect()
    top = {r["query_id"]: r["vec_id"] for r in got}
    # the nearest corpus vector to a scaled copy of v_i is v_i itself
    assert top == {1000: 0, 1001: 1}


def test_lsh_single_probe_subset_of_bucket(vec_df, vec_np):
    n_bits = 6
    rows = lsh_topk(
        vec_df, F.col("vec_id") < 6, k=50, n_bits=n_bits, multiprobe=False
    ).collect()
    buckets = {
        i: sum((1 << j) for j in range(n_bits) if vec_np[i][j] > 0)
        for i in range(N_VEC)
    }
    for r in rows:
        assert buckets[r["vec_id"]] == buckets[r["query_id"]]
        assert r["vec_id"] != r["query_id"]


def test_multiprobe_recall_at_least_single(vec_df):
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(vec_df, F.col("vec_id") < 8, k=3).collect()
    }
    single = {
        (r["query_id"], r["vec_id"])
        for r in lsh_topk(vec_df, F.col("vec_id") < 8, k=3, n_bits=6).collect()
    }
    multi = {
        (r["query_id"], r["vec_id"])
        for r in lsh_topk(
            vec_df, F.col("vec_id") < 8, k=3, n_bits=6, multiprobe=True
        ).collect()
    }
    assert len(multi & exact) >= len(single & exact)


def test_kmeans_deterministic_and_shapes(vec_df):
    a = train_kmeans_centroids(vec_df, n_centroids=8, iters=3)
    b = train_kmeans_centroids(vec_df, n_centroids=8, iters=3)
    ra = sorted((r["cid"], tuple(r["ce"])) for r in a.collect())
    rb = sorted((r["cid"], tuple(r["ce"])) for r in b.collect())
    assert ra == rb  # bitwise reproducible across runs
    assert len(ra) == 8
    assert all(len(ce) == DIM for _, ce in ra)


def test_kmeans_improves_or_matches_subsample_recall(vec_df, vec_np):
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(vec_df, F.col("vec_id") < 10, k=5).collect()
    }

    def recall(cent):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(
                vec_df, F.col("vec_id") < 10, cent, k=5, nprobe=3
            ).collect()
        }
        return len(got & exact) / len(exact)

    sub = vec_df.filter(F.col("vec_id") % 15 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    trained = train_kmeans_centroids(vec_df, n_centroids=8, iters=4)
    assert recall(trained) >= recall(sub) - 0.101  # trained never far worse
    assert recall(trained) > 0.5


def test_assign_covers_every_vector_once(vec_df):
    cent = train_kmeans_centroids(vec_df, n_centroids=5, iters=2)
    a = assign_to_centroids(vec_df, cent)
    assert a.count() == N_VEC
    assert a.select("vec_id").distinct().count() == N_VEC


def test_sign_bucket_range(vec_df):
    n_bits = 5
    rows = vec_df.select(sign_lsh_bucket("embedding", n_bits).alias("b")).collect()
    assert all(0 <= r["b"] < 2**n_bits for r in rows)


def test_exclude_self_auto_respects_external_id_collisions(spark, vec_df, vec_np):
    """Round-3 ADVICE: external query ids that happen to collide with
    corpus ids must NOT drop those corpus vectors under the default."""
    qv = vec_np[:2] * 0.5
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(qv)],  # ids 0/1 collide
        "vec_id int, embedding array<float>",
    )
    top = {
        r["query_id"]: r["vec_id"]
        for r in cosine_topk(vec_df, qdf, k=1).collect()  # auto default
    }
    # nearest corpus vector to a scaled copy of v_i is v_i — the colliding
    # id must still be retrievable
    assert top == {0: 0, 1: 1}


def test_random_hyperplane_bucket_deterministic_and_balanced(vec_df, vec_np):
    n_bits = 6
    cols = random_hyperplane_bucket("embedding", n_bits, DIM, seed=3)
    a = [r["b"] for r in vec_df.select(cols.alias("b")).collect()]
    b = [r["b"] for r in vec_df.select(
        random_hyperplane_bucket("embedding", n_bits, DIM, seed=3).alias("b")
    ).collect()]
    assert a == b  # deterministic for a fixed seed
    assert all(0 <= x < 2**n_bits for x in a)
    # matches the NumPy projection exactly
    planes = np.random.RandomState(3).standard_normal((n_bits, DIM))
    want = [
        int(sum((1 << i) for i in range(n_bits)
                if float(v.astype("float64") @ planes[i]) > 0))
        for v in vec_np
    ]
    assert a == want
    # a different seed produces a different bucketing
    c = [r["b"] for r in vec_df.select(
        random_hyperplane_bucket("embedding", n_bits, DIM, seed=4).alias("b")
    ).collect()]
    assert a != c


def test_lsh_random_hyperplanes_end_to_end(vec_df):
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(vec_df, F.col("vec_id") < 8, k=3).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in lsh_topk(
            vec_df, F.col("vec_id") < 8, k=3, n_bits=6,
            hyperplanes="random", dim=DIM, multiprobe=True,
        ).collect()
    }
    assert len(got & exact) / len(exact) > 0.3  # sane recall on fixtures
    with pytest.raises(ValueError, match="dim"):
        lsh_topk(vec_df, F.col("vec_id") < 8, hyperplanes="random")
