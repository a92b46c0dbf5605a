"""Measure PQ ADC recall@k: trained Lloyd codebooks vs the seed codebook
vs the exact L2 baseline.

Evidence for the BENCH.md §6d table: PQ compresses each embedding to m
codeword ids (m bytes at k<=256 — a 32x payload cut at dim 64 / m 8) and
answers top-k via asymmetric distance; this script quantifies what that
compression costs in recall against exact squared-L2 over the raw
vectors, and what Lloyd training buys over the deterministic seed
codebook the oracle entry pins.

Usage: python scripts/pq_recall.py [sf_dir] [n_queries] [k] [m] [codewords] [iters]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from splade_spark.operators.pq import (  # noqa: E402
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)
from splade_spark.session import get_spark  # noqa: E402


def exact_l2_topk(emb, queries, k):
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda a, b: (a.cast("double") - b.cast("double"))
                   * (a.cast("double") - b.cast("double"))),
        F.lit(0.0), lambda acc, d: acc + d,
    )
    q = queries.select(F.col("query_id"), F.col("embedding").alias("qe"))
    pairs = emb.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id", "vec_id", dot("embedding", "qe").alias("dist")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id")
    )


def recall_vs(base, approx):
    hits = base.join(approx, ["query_id", "vec_id"], "left_semi").count()
    total = base.count()
    return hits / max(1, total)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    m = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    codewords = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    iters = int(sys.argv[6]) if len(sys.argv) > 6 else 3

    spark = get_spark(master="local[8]", app_name="pq_recall",
                      shuffle_partitions=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).localCheckpoint(eager=True)
    n_vec = emb.count()
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    base = exact_l2_topk(emb, queries, k).localCheckpoint(eager=True)

    out = {"sf_dir": sf_dir, "n_vectors": n_vec, "n_queries": n_queries,
           "k": k, "m": m, "codewords": codewords,
           "bytes_per_vec_raw": 64 * 4, "bytes_per_vec_pq": m}
    for label, it in (("seed", 0), (f"lloyd{iters}", iters)):
        cb = train_pq_codebooks(emb, m=m, k=codewords, iters=it, dim=64)
        codes = pq_encode(emb, cb, m=m, dim=64)
        approx = pq_adc_topk(
            codes, queries, cb, k=k, m=m, dim=64, exclude_same_id=True
        ).select("query_id", "vec_id")
        out[f"recall@{k}_{label}"] = round(recall_vs(base, approx), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
