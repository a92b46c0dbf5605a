"""Retrieval-quality report CLI (reference script/evaluate.py:150-258
shape): fixture corpus + queries + qrels → per-strategy metrics JSON at
the k_list cutoffs, with WAND / exhaustive / served parity verdicts.

Usage:
    python scripts/eval_cli.py [out_json] [n_docs] [n_queries]

Writes ``out_json`` (default bench_artifacts/eval_metrics.json) and exits
non-zero if any strategy-parity check fails.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_artifacts/eval_metrics.json"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 80

    from splade_spark.config import EngineConfig
    from splade_spark.evaluate import evaluate_retrieval
    from splade_spark.fixtures import gen_pages, gen_qrels, gen_queries
    from splade_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    pages = gen_pages(n_docs, seed=77)
    queries = gen_queries(n_queries, pages, seed=78, with_source=True)
    # qrels = each query's SOURCE document (the ground-truth positive,
    # relevance 2) ∪ the seeded random judgments (exercise unjudged-doc
    # defaults and the missed-positive sentinel); random rows that collide
    # with a source row are dropped so relevance stays well-defined
    import pandas as pd

    qrels_rand = gen_qrels(queries, pages, seed=79)
    src = queries[["query_id", "source_url"]].rename(
        columns={"source_url": "doc_id"}
    )
    src["relevance"] = 2.0
    keys = set(zip(src["query_id"], src["doc_id"]))
    qrels_rand = qrels_rand[
        [(q, d) not in keys
         for q, d in zip(qrels_rand["query_id"], qrels_rand["doc_id"])]
    ]
    qrels = pd.concat([src, qrels_rand], ignore_index=True)

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(pages[["url", "text"]]).select(
        F.col("url").alias("doc_id"), "text"
    )
    qdf = spark.createDataFrame(queries[["query_id", "text"]])
    del queries  # qrels built; only (query_id, text) goes to the engine
    qrels_df = spark.createDataFrame(qrels)

    report = evaluate_retrieval(
        spark, docs, qdf, qrels_df,
        cfg=EngineConfig(block_size=256, index_partitions=8),
    )
    report["n_docs"] = n_docs
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps(report["parity"]))
    for s, m in report["metrics"].items():
        line = ", ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())
                         if k.endswith("@10"))
        print(f"{s:12s} {line}")
    spark.stop()
    return 0 if all(report["parity"].values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
