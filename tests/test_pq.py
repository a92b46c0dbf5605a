"""Product-quantization tests vs a NumPy mirror of the deterministic
contract (seed rule, L2 tie-breaks, subspace-ordered ADC sums)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from splade_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)

DIM, M, K = 8, 4, 3
DSUB = DIM // M


def _vectors(n=20):
    # multiples of 0.25: exactly representable in f32 AND f64, so the
    # NumPy mirror sees bit-identical doubles
    rows = []
    for i in range(n):
        v = [((i * 7 + j * 3) % 13 - 6) * 0.25 for j in range(DIM)]
        rows.append((i, v))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def np_seed_codebook(rows):
    seeds = sorted(rows)[:K]
    # cb[sub][cid] = subvector of the cid-th lowest-id seed
    return np.array(
        [[seeds[c][1][s * DSUB:(s + 1) * DSUB] for c in range(K)]
         for s in range(M)],
        dtype=float,
    )


def np_encode(vec, cb):
    codes = []
    for s in range(M):
        sv = np.array(vec[s * DSUB:(s + 1) * DSUB], dtype=float)
        d = ((cb[s] - sv) ** 2).sum(axis=1)
        codes.append(int(np.lexsort((np.arange(K), d))[0]))
    return codes


def test_seed_codebook_matches_rule(spark):
    rows = _vectors()
    cb = train_pq_codebooks(_df(spark, rows), m=M, k=K, iters=0)
    got = {(r["sub"], r["cid"]): r["ce"] for r in cb.collect()}
    want = np_seed_codebook(rows)
    assert len(got) == M * K
    for (s, c), ce in got.items():
        assert np.allclose(ce, want[s][c], atol=0), (s, c)


def test_encode_matches_numpy(spark):
    rows = _vectors()
    df = _df(spark, rows)
    cb = train_pq_codebooks(df, m=M, k=K, iters=0)
    codes = {r["vec_id"]: r["codes"] for r in pq_encode(df, cb, m=M).collect()}
    npcb = np_seed_codebook(rows)
    for vid, vec in rows:
        assert codes[vid] == np_encode(vec, npcb), vid


def test_adc_topk_matches_numpy(spark):
    rows = _vectors()
    df = _df(spark, rows)
    cb = train_pq_codebooks(df, m=M, k=K, iters=0)
    codes_df = pq_encode(df, cb, m=M)
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_adc_topk(
        codes_df, queries, cb, k=5, m=M,
        query_id_col="query_id", exclude_same_id=True,
    ).collect()
    npcb = np_seed_codebook(rows)
    npcodes = {vid: np_encode(v, npcb) for vid, v in rows}
    for qid, qvec in rows[:2]:
        dists = []
        for vid, _ in rows:
            if vid == qid:
                continue
            d = 0.0
            for s in range(M):
                sv = np.array(qvec[s * DSUB:(s + 1) * DSUB], dtype=float)
                d += float(((npcb[s][npcodes[vid][s]] - sv) ** 2).sum())
            dists.append((d, vid))
        want = sorted(dists)[:5]
        got = sorted(
            [(r["rank"], r["vec_id"], r["dist"]) for r in out
             if r["query_id"] == qid]
        )
        assert [(v, pytest.approx(d, abs=1e-12)) for d, v in want] == [
            (v, pytest.approx(d, abs=1e-12)) for _, v, d in got
        ]


def test_training_reduces_quantization_error_and_is_deterministic(spark):
    rows = _vectors(30)
    df = _df(spark, rows)

    def total_err(cb):
        codes = {r["vec_id"]: r["codes"]
                 for r in pq_encode(df, cb, m=M).collect()}
        npcb = {(r["sub"], r["cid"]): np.array(r["ce"])
                for r in cb.collect()}
        err = 0.0
        for vid, vec in rows:
            for s in range(M):
                sv = np.array(vec[s * DSUB:(s + 1) * DSUB], dtype=float)
                err += float(((npcb[(s, codes[vid][s])] - sv) ** 2).sum())
        return err

    cb0 = train_pq_codebooks(df, m=M, k=K, iters=0)
    cb2 = train_pq_codebooks(df, m=M, k=K, iters=2)
    assert total_err(cb2) <= total_err(cb0)
    # Lloyd from deterministic seeds: bit-reproducible
    cb2b = train_pq_codebooks(df, m=M, k=K, iters=2)
    a = sorted(map(tuple, ((r["sub"], r["cid"], tuple(r["ce"]))
                           for r in cb2.collect())))
    b = sorted(map(tuple, ((r["sub"], r["cid"], tuple(r["ce"]))
                           for r in cb2b.collect())))
    assert a == b


def test_ivfpq_single_list_equals_flat_residual_pq(spark):
    from splade_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
        train_ivfpq,
    )

    rows = _vectors(20)
    df = _df(spark, rows)
    # one coarse list, iters=0 everywhere: residual = v - seed0, and
    # IVF-PQ with nprobe=1 must equal flat PQ over those residuals
    coarse, cb = train_ivfpq(
        df, n_lists=1, m=M, k=K, coarse_iters=0, pq_iters=0
    )
    enc = ivfpq_encode(df, coarse, cb, m=M)
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivfpq_topk(
        enc, queries, coarse, cb, k=5, nprobe=1, m=M,
        exclude_same_id=True,
    ).collect()

    seed0 = [r["ce"] for r in coarse.collect()][0]
    res_rows = [
        (vid, [v[i] - seed0[i] for i in range(DIM)]) for vid, v in rows
    ]
    res_df = spark.createDataFrame(
        res_rows, "vec_id bigint, embedding array<double>"
    )
    codes = pq_encode(res_df, cb, m=M)
    res_q = res_df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = pq_adc_topk(
        codes, res_q, cb, k=5, m=M, exclude_same_id=True
    ).collect()
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    gd = {key(r): r["dist"] for r in got}
    wd = {key(r): r["dist"] for r in want}
    for kk in gd:
        assert gd[kk] == pytest.approx(wd[kk], abs=1e-12)


def test_ivfpq_prunes_to_probed_lists_and_is_deterministic(spark):
    from splade_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
        train_ivfpq,
    )

    rows = _vectors(30)
    df = _df(spark, rows)
    coarse, cb = train_ivfpq(
        df, n_lists=4, m=M, k=K, coarse_iters=2, pq_iters=1
    )
    enc = ivfpq_encode(df, coarse, cb, m=M).localCheckpoint(eager=True)
    queries = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out1 = ivfpq_topk(enc, queries, coarse, cb, k=8, nprobe=2, m=M)
    out2 = ivfpq_topk(enc, queries, coarse, cb, k=8, nprobe=2, m=M)
    r1 = sorted(map(tuple, out1.collect()))
    assert r1 == sorted(map(tuple, out2.collect()))
    # every hit must live in one of its query's 2 probed lists
    lists = {r["vec_id"]: r["list_cid"] for r in enc.collect()}
    probes = {}
    for r in (
        ivfpq_topk(enc, queries, coarse, cb, k=1000, nprobe=2, m=M)
        .collect()
    ):
        probes.setdefault(r["query_id"], set()).add(lists[r["vec_id"]])
    for qid, ls in probes.items():
        assert len(ls) <= 2, (qid, ls)
    # probing every list scores every doc: full candidate coverage
    full = ivfpq_topk(enc, queries, coarse, cb, k=1000, nprobe=4, m=M)
    counts = {
        r["query_id"]: r["n"]
        for r in full.groupBy("query_id").agg(F.count("*").alias("n"))
        .collect()
    }
    assert all(v == len(rows) for v in counts.values())
