"""Phase-by-phase index-build profiler (one parallelism level per run).

    python scripts/profile_build.py <cpus> <n_docs>
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from splade_spark.fixtures import gen_pages
from splade_spark.operators.ids import assign_global_ids
from splade_spark.operators.indexing import (
    build_posting_blocks,
    doc_term_frequencies,
)
from splade_spark.session import get_spark


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"PHASE {label:28s} {time.perf_counter()-t0:7.2f}s", flush=True)
    return r


def main():
    cpus, src = int(sys.argv[1]), sys.argv[2]
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus * 2,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.range(10_000).selectExpr("sum(id)").collect()
    if src.isdigit():
        n_docs = int(src)
        pages = gen_pages(n_docs, seed=42)
        docs = spark.createDataFrame(pages[["url", "text"]])
    else:
        docs = spark.read.parquet(src)
        n_docs = None
    docs = (docs.withColumnRenamed("url", "doc_id")
            .repartition(cpus * 4).persist())
    n_docs = docs.count()
    # pre-warm python workers so daemon startup is visible separately
    t("py_worker_warmup", lambda: docs.limit(64).mapInPandas(
        lambda it: it, schema="doc_id string, text string").count())

    total0 = time.perf_counter()
    tf, doc_len = doc_term_frequencies(docs)
    tf = tf.persist(); doc_len = doc_len.persist()
    t("tokenize+tf (persist)", lambda: tf.count())
    t("doc_len (persist)", lambda: doc_len.count())
    t("stats agg", lambda: doc_len.agg(F.count(F.lit(1)), F.avg("dl")).collect())
    dd = t("assign_ids docs (jobs)", lambda: assign_global_ids(
        doc_len, key="doc_id", id_col="doc_idx", num_partitions=cpus))
    dd = dd.persist()
    t("doc_dim materialize", lambda: dd.count())
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    td = t("assign_ids terms (jobs)", lambda: assign_global_ids(
        dfc, key="term", id_col="term_id", num_partitions=cpus))
    td = td.persist()
    t("term_dict materialize", lambda: td.count())
    joined = (tf.join(dd.select("doc_id", "doc_idx"), "doc_id")
              .join(td.select("term", "term_id", "df"), "term"))
    weighted = joined.select("term_id", "doc_idx",
                             F.col("tf").cast("float").alias("weight"), "df")
    post = build_posting_blocks(weighted, n_docs)
    t("postings build+encode", lambda: post.count())
    print(f"TOTAL {time.perf_counter()-total0:7.2f}s  cpus={cpus} docs={n_docs}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
