"""spark-submit entry point: corpus parquet/Iceberg table → inverted index.

Packaged run (north rule)::

    scripts/make_pyfiles.sh   # → dist/splade_spark.zip
    spark-submit --py-files dist/splade_spark.zip scripts/build_index_cli.py \
        --input /data/pages --output /data/index \
        [--id-col url --text-col text] [--resumable --buckets 64]

Runs unchanged on a cluster master (``--master yarn`` etc.); the local
default exists so the same command works in this sandbox.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python scripts/...` runs; spark-submit gets the package from
# --py-files dist/splade_spark.zip instead. PYTHONPATH is exported too so
# local-mode Python WORKERS (pandas UDF stages) can import the package
# when the CLI is launched from another directory
_repo_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _repo_root)
os.environ["PYTHONPATH"] = os.path.abspath(_repo_root) + os.pathsep + os.environ.get(
    "PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path or Iceberg table identifier")
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", default="auto",
                    choices=("auto", "parquet", "iceberg"),
                    help="input format; 'auto' = path→parquet, id→iceberg")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang", default=None,
                    help="partition-pruned language filter (contract tables)")
    ap.add_argument("--resumable", action="store_true")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from splade_spark.operators.indexing import build_index
    from splade_spark.session import get_spark
    from splade_spark.sources import read_web_corpus
    from splade_spark.sources.corpus import WEB_CORPUS_SCHEMA, read_table

    spark = get_spark(master=args.master, app_name="splade_build_index")
    if args.lang is not None or args.format == "iceberg":
        if {args.id_col, args.text_col} <= set(WEB_CORPUS_SCHEMA):
            # contract table (url, warc_ts, html, text, lang): scan through
            # the source layer — lang pushes down, only needed columns read
            docs = read_web_corpus(
                spark, args.input, fmt=args.format,
                columns=(args.id_col, args.text_col), lang=args.lang,
            )
        else:
            # custom column names: raw read, same pushdown-friendly filter
            docs = read_table(spark, args.input, args.format)
            if args.lang is not None:
                docs = docs.filter(F.col("lang") == args.lang)
            docs = docs.select(args.id_col, args.text_col)
    else:
        # route through the source layer so --format auto detects Iceberg
        # identifiers here too (not only under --lang), per its help text
        docs = read_table(spark, args.input, args.format)

    t0 = time.perf_counter()
    if args.resumable:
        from splade_spark.operators.checkpoint import (
            build_index_from_shards,
            encode_corpus_resumable,
        )

        summary = encode_corpus_resumable(
            docs, args.output + "/encode", n_buckets=args.buckets,
            id_col=args.id_col, text_col=args.text_col,
        )
        print(json.dumps({"stage": "encode", **summary}))
        idx = build_index_from_shards(spark, args.output + "/encode")
    else:
        idx = build_index(docs, id_col=args.id_col, text_col=args.text_col)
    idx.save(args.output)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "stage": "index", "output": args.output, "wall_sec": round(wall, 2),
        "docs_per_sec": round(idx.meta["n_docs"] / wall, 1), **idx.meta,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
