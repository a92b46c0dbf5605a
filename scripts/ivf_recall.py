"""Measure IVF ANN recall@k vs the exact brute-force baseline.

Compares the deterministic-subsample coarse quantizer (the oracle pin in
`ann_ivf_topk`) against the trained k-means quantizer
(`operators.ann.train_kmeans_centroids`) on the driver's embeddings table.
Prints one JSON line per configuration; the table in BENCH.md §5 is
generated from this.

Usage: python scripts/ivf_recall.py [sf_dir] [n_queries] [k]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")

from pyspark.sql import functions as F  # noqa: E402

from splade_spark.operators.ann import (  # noqa: E402
    cosine_topk,
    ivf_topk,
    train_kmeans_centroids,
)
from splade_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(master="local[8]", app_name="ivf_recall",
                      shuffle_partitions=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_vec = emb.count()
    is_query = F.col("vec_id") < n_queries

    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, is_query, k=k).collect()
    }

    # centroid count ~ sqrt(N), matched between the two quantizers
    n_cent = max(4, int(n_vec ** 0.5))
    mod = max(1, n_vec // n_cent)
    sub_cent = emb.filter(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    trained = train_kmeans_centroids(emb, n_centroids=n_cent, iters=4)

    for name, cent in (("subsample", sub_cent), ("kmeans", trained)):
        n_c = cent.count()
        for nprobe in (1, 3, 5):
            got = {
                (r["query_id"], r["vec_id"])
                for r in ivf_topk(emb, is_query, cent, k=k, nprobe=nprobe).collect()
            }
            print(json.dumps({
                "quantizer": name, "n_centroids": n_c, "n_vec": n_vec,
                "nprobe": nprobe, "k": k, "n_queries": n_queries,
                "recall": round(len(got & exact) / len(exact), 4),
            }))

    spark.stop()


if __name__ == "__main__":
    main()
