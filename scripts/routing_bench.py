"""Measure rank-safe shard routing (ShardedServer.search_ids route=True)
vs full fan-out on the same in-memory shard set.

Routing is exact (pytest-pinned identical results); this script measures
the SERVING win: shards actually visited per query and p50 latency, for
(a) the bench's common-term query set and (b) selective rare-term
queries, where term-disjointness across doc-range shards lets the broker
skip most of the fleet. Prints one JSON line.

Usage: python scripts/routing_bench.py [sf_dir] [n_shards]
"""

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from splade_spark.config import DEFAULT
from pyspark.sql import functions as F
from splade_spark.operators.indexing import build_index
from splade_spark.operators.query import load_term_info
from splade_spark.operators.sharding import ShardedServer
from splade_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    # fixtures web corpus: Zipf vocab with a real rare tail (the
    # documents.parquet table's ~30-word vocab has no selective terms,
    # so every doc-range shard holds every term — routing can't prune)
    from splade_spark.fixtures import gen_pages

    pdf = gen_pages(n_docs)
    docs = spark.createDataFrame(pdf[["url", "text"]]).selectExpr(
        "url as doc_id", "text"
    )
    idx = build_index(docs)
    broker = ShardedServer(idx, n_shards=n_shards)

    # query sets from the corpus's own vocabulary: head terms (present
    # in every doc-range shard — routing can't skip, measures overhead)
    # and tail terms (postings localized to few shards — routing skips)
    lo = (
        idx.term_dict.filter("df >= 2")
        .orderBy("df", "term")
        .limit(24)
        .collect()
    )
    hi = idx.term_dict.orderBy(F.desc("df"), "term").limit(20).collect()
    rare = [
        (f"r{i:02d}", " ".join(r["term"] for r in lo[i : i + 2]))
        for i in range(0, len(lo) - 1, 2)
    ]
    common = [
        (f"c{i:02d}", " ".join(r["term"] for r in hi[i : i + 2]))
        for i in range(0, len(hi) - 1, 2)
    ]
    rare_df = [r["df"] for r in lo[:4]]

    out = {"n_shards": n_shards, "n_docs": n_docs, "tail_df": rare_df}
    for label, qs in (("common", common), ("rare", rare)):
        for route in (False, True):
            lat, visited = [], []
            for _, text in qs:
                t0 = time.perf_counter()
                broker.search(text, k=DEFAULT.top_k, route=route)
                lat.append((time.perf_counter() - t0) * 1e3)
                visited.append(broker.last_shards_visited)
            key = f"{label}_{'routed' if route else 'fanout'}"
            out[key] = {
                "p50_ms": round(statistics.median(lat), 2),
                "mean_shards_visited": round(
                    sum(visited) / len(visited), 2
                ),
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
