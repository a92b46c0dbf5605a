"""Measure sign-LSH recall@k: axis-aligned vs seeded random hyperplanes.

Round-3 verdict item 4 evidence: axis-aligned sign buckets (the portable
oracle pin) skew bucket balance on non-centered embeddings; seeded random
hyperplane projections (``operators.ann.random_hyperplane_bucket``) are
rotation-invariant. This prints recall@k against the exact brute-force
baseline plus bucket-balance stats for both, single-probe and multiprobe,
on the driver's embeddings table. BENCH.md §6's table comes from this.

Usage: python scripts/lsh_recall.py [sf_dir] [n_queries] [k] [n_bits] [shift]

``shift`` (default 0.0) adds a constant to every coordinate before
bucketing/scoring — real production embeddings are NOT zero-centered
(CLS-pooled transformer embeddings famously live in a narrow cone), and
this is where axis-aligned sign buckets degenerate (every coordinate
positive → one mega-bucket) while random projections keep their balance.
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
    lsh_topk,
    random_hyperplane_bucket,
    sign_lsh_bucket,
)
from splade_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_bits = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    shift = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0

    spark = get_spark(master="local[8]", app_name="lsh_recall",
                      shuffle_partitions=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    if shift:
        # round-trip through parquet: the downstream self-joins need a
        # genuinely fresh relation — both a lazy projection and a
        # localCheckpoint of one trip Spark's self-join attribute dedup
        # when higher-order bucket expressions sit on both sides
        import tempfile

        tmp = tempfile.mkdtemp(prefix="lsh_shift_", dir="/dev/shm")
        emb.select(
            "vec_id",
            F.transform(
                "embedding", lambda x: (x + shift).cast("float")
            ).alias("embedding"),
        ).write.mode("overwrite").parquet(f"{tmp}/emb")
        emb = spark.read.parquet(f"{tmp}/emb")
    dim = len(emb.first()["embedding"])
    n_vec = emb.count()
    is_query = F.col("vec_id") < n_queries

    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, is_query, k=k).collect()
    }

    buckets = {
        "axis": sign_lsh_bucket("embedding", n_bits),
        "random": random_hyperplane_bucket("embedding", n_bits, dim, seed=0),
    }
    for name, bcol in buckets.items():
        sizes = [
            r["n"] for r in emb.groupBy(bcol.alias("b"))
            .agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        balance = {
            "n_buckets": len(sizes),
            "max_bucket": max(sizes),
            "mean_bucket": round(n_vec / len(sizes), 1),
        }
        for multiprobe in (False, True):
            got = {
                (r["query_id"], r["vec_id"])
                for r in lsh_topk(
                    emb, is_query, k=k, n_bits=n_bits,
                    multiprobe=multiprobe, hyperplanes=name, dim=dim,
                ).collect()
            }
            print(json.dumps({
                "hyperplanes": name, "n_bits": n_bits, "shift": shift,
                "multiprobe": multiprobe, "k": k, "n_vec": n_vec,
                "recall": round(len(got & exact) / len(exact), 4),
                **balance,
            }))

    spark.stop()


if __name__ == "__main__":
    main()
