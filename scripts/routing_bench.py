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
from splade_spark.entry_queries import BM25_QUERIES
from splade_spark.operators.indexing import build_index
from splade_spark.operators.query import load_term_info
from splade_spark.operators.sharding import ShardedServer
from splade_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "cast(doc_id as string) doc_id", "text"
    )
    idx = build_index(docs)
    broker = ShardedServer(idx, n_shards=n_shards)

    # rare-term queries: lowest-df terms long enough to be real words
    td = (
        idx.term_dict.filter("df >= 2 and df <= 5 and length(term) >= 4")
        .orderBy("df", "term")
        .limit(24)
        .collect()
    )
    rare = [
        (f"r{i:02d}", " ".join(r["term"] for r in td[i : i + 2]))
        for i in range(0, len(td) - 1, 2)
    ]

    out = {"n_shards": n_shards, "sf_dir": sf_dir}
    for label, qs in (("common", BM25_QUERIES), ("rare", rare)):
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
