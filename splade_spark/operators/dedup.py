"""Near-duplicate candidate generation for web-scale corpora.

The reference (`hyukkyukang/SPLADE`) has no dedup stage — these are the
LLM-training-data operators the engine adds as first-class components,
designed Spark-first: shingle -> minhash -> band -> bucket equi-join, so
candidate generation is one hash-partitioned shuffle on the band bucket
key, never an all-pairs comparison.

Two hash families ship:

- ``xxhash64`` (production default): one JVM hash call per (shingle, seed)
  and per band signature, 64-bit output, stays fully inside whole-stage
  codegen — the scale path.
- ``md5`` (oracle-portable): string md5 reproducible bit-for-bit in DuckDB;
  the driver-gated `minhash_band_pairs` entry query is this operator pinned
  at (n_hashes=8, rows_per_band=2, hash_fn="md5").

Scale guard: `bucket_cap` drops band buckets holding more than `cap` docs
before the self-join. A giant bucket is boilerplate (licence headers,
navigation chrome) whose pair-count grows quadratically; at 100 TB one such
bucket would dominate the whole job. Capped buckets are the analogue of the
df-capped shingles in the Jaccard verifier — handle boilerplate clusters
with a dedicated grouping pass, not inside the pair join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def shingles_col(text_col: Column | str, n: int = 3) -> Column:
    """array<string> of word n-gram shingles (pure JVM Column).

    Guarded: Spark's sequence(1, 0) counts DOWN, so docs shorter than n
    tokens get an explicit empty array.
    """
    from splade_spark.functions.tokenize import tokens_col

    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda j: F.concat_ws(
            " ", *[F.element_at(toks, j + off) for off in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 128,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, i, h): the i-th minhash of each doc's shingle set.

    One row per doc per hash seed; `h` is string for md5, bigint for
    xxhash64. The (shingle x seed) expansion is a broadcast crossJoin with
    a tiny seed dimension followed by a (doc, i) min-aggregate — partial
    aggregation runs map-side, so the shuffle carries n_hashes rows per
    doc, not n_hashes x n_shingles.
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"hash_fn must be xxhash64 or md5, got {hash_fn!r}")
    dt = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_col(text_col, n=shingle_n)).alias("term"),
    ).distinct()
    hi = (
        docs.sparkSession.range(n_hashes)
        .select(F.col("id").cast("int").alias("i"))
    )
    if hash_fn == "xxhash64":
        hv = F.xxhash64("term", F.col("i"))
    else:
        hv = F.md5(F.concat_ws(":", "term", F.col("i").cast("string")))
    return (
        dt.crossJoin(F.broadcast(hi))
        .select("id", "i", hv.alias("hv"))
        .groupBy("id", "i")
        .agg(F.min("hv").alias("h"))
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 128,
    rows_per_band: int = 4,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
    bucket_cap: int | None = 1000,
) -> DataFrame:
    """MinHash + LSH near-duplicate candidate pairs (doc_a, doc_b).

    Banding: n_bands = n_hashes / rows_per_band; two docs become a
    candidate pair iff at least one band signature collides. Jaccard
    similarity s collides per band with probability s^rows_per_band, so
    the candidate-recall curve is 1 - (1 - s^r)^b — pick (r, b) for the
    corpus' similarity target instead of hardcoding toy widths.

    Docs whose ids compare equal are never paired; output is the distinct
    set with doc_a < doc_b (ids compared in their column's natural order).
    """
    if n_hashes % rows_per_band != 0:
        raise ValueError(
            f"n_hashes ({n_hashes}) must be a multiple of rows_per_band "
            f"({rows_per_band})"
        )
    mh = minhash_signatures(
        docs,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        shingle_n=shingle_n,
        hash_fn=hash_fn,
    )
    sig = F.transform(
        F.sort_array(F.collect_list(F.struct("i", "h"))), lambda s: s["h"]
    )
    if hash_fn == "xxhash64":
        bh = F.xxhash64(sig)
    else:
        bh = F.md5(F.array_join(sig, "|"))
    bands = (
        mh.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(bh.alias("bh"))
        # persisted so the self-join reads computed bands once instead of
        # recomputing the shingle -> minhash pipeline per join side
        .persist()
    )
    if bucket_cap is not None:
        ok = (
            bands.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= bucket_cap)
            .select("band", "bh")
        )
        bands = bands.join(ok, ["band", "bh"], "left_semi")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh")),
        )
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )
