"""Benchmark decontamination: n-gram overlap between a training corpus
and a held-out evaluation set.

The reference (`hyukkyukang/SPLADE`) evaluates on MS MARCO-style dev
queries; any pipeline that TRAINS on a web corpus and evaluates on such a
set must first remove training documents that contain eval text (the
GPT-3 / Llama "13-gram overlap" rule). This module implements that rule
Spark-first over the shared tokenizer:

- corpus side: per-doc DISTINCT n-grams (``array_distinct`` before the
  explode, so repeated boilerplate n-grams cost one row, not tf rows);
- eval side: the distinct n-gram set of the benchmark — small by
  construction (eval sets are 1e3-1e6 docs vs a 1e12-doc corpus), so it
  is **broadcast** and the probe join never shuffles the corpus;
- verdict: groupBy(doc) count of hit n-grams (map-side partial agg on
  the corpus' existing partitioning) plus a boolean flag.

Two physical strategies, same semantics:

- ``method="join"`` (default): explode corpus n-grams -> broadcast hash
  join against the eval set -> count per doc. Corpus-side cost is one
  row per distinct n-gram per doc; scales to eval sets of tens of
  millions of n-grams (the broadcast side), any corpus size.
- ``method="intersect"``: collapse the eval n-grams to ONE array row,
  cross-join broadcast it, and score with ``size(array_intersect(...))``
  per doc. Zero explode, zero shuffle on the corpus — the whole job is
  the corpus scan. Only valid while the eval n-gram array fits in a
  single row (~1e6 n-grams); the builder enforces a cap.

n-gram identity is the space-joined token string; ``hash_ngrams=True``
switches both sides to ``xxhash64`` of that string, shrinking the
exploded rows and broadcast bytes ~10x at 1e-19/pair collision odds (a
collision only ever OVER-flags a doc — safe direction for hygiene).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from splade_spark.functions.tokenize import tokens_col

# one-row-array strategy hard cap: ~1e6 strings per row is the point
# where a single Tungsten row stops being a sane broadcast payload
_INTERSECT_MAX_NGRAMS = 1_000_000


def ngrams_col(tokens: Column, n: int) -> Column:
    """array<string> of space-joined n-grams of ``tokens``; empty when the
    doc has fewer than ``n`` tokens. Pure Catalyst (no UDF): a
    ``sequence`` of start offsets transformed through ``slice``.

    The ``when`` guard matters: Spark's ``sequence(1, 0)`` yields the
    DESCENDING ``[1, 0]``, not an empty array."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    starts = F.when(
        F.size(tokens) >= n,
        F.sequence(F.lit(1), F.size(tokens) - n + 1),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts, lambda i: F.array_join(F.slice(tokens, i, n), " ")
    )


def _doc_ngrams(
    docs: DataFrame, *, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, ngrams: array<string> DISTINCT per doc)."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(ngrams_col(tokens_col(text_col), n)).alias("_ngrams"),
    )


def eval_ngram_set(
    eval_docs: DataFrame,
    *,
    text_col: str = "text",
    n: int = 13,
    hash_ngrams: bool = False,
) -> DataFrame:
    """The distinct n-gram set of the benchmark: one column ``ngram``
    (string, or bigint when ``hash_ngrams``). Globally distinct — this is
    the small side that gets broadcast."""
    g = eval_docs.select(
        F.explode(
            F.array_distinct(ngrams_col(tokens_col(text_col), n))
        ).alias("ngram")
    ).distinct()
    if hash_ngrams:
        g = g.select(F.xxhash64("ngram").alias("ngram")).distinct()
    return g


def contamination_stats(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 13,
    method: str = "join",
    hash_ngrams: bool = False,
) -> DataFrame:
    """Per-corpus-doc contamination verdict vs ``eval_docs``.

    Returns (id_col, n_ngrams, n_hit, contaminated) where ``n_ngrams``
    counts the doc's DISTINCT n-grams, ``n_hit`` how many of those occur
    anywhere in the eval set, and ``contaminated`` = n_hit > 0.
    """
    if method not in ("join", "intersect"):
        raise ValueError(f"unknown method {method!r}")
    d = _doc_ngrams(docs, id_col=id_col, text_col=text_col, n=n)
    evl = eval_ngram_set(
        eval_docs, text_col=eval_text_col, n=n, hash_ngrams=hash_ngrams
    )
    if method == "intersect":
        # ONE array row holding the whole eval set, broadcast; the corpus
        # never explodes and never shuffles — contamination is a map-only
        # column over the scan. Guarded by the single-row sanity cap.
        n_eval = evl.count()
        if n_eval > _INTERSECT_MAX_NGRAMS:
            raise ValueError(
                f"eval set has {n_eval} n-grams > intersect cap "
                f"{_INTERSECT_MAX_NGRAMS}; use method='join'"
            )
        ngram_col = (
            F.transform("_ngrams", lambda g: F.xxhash64(g)) if hash_ngrams
            else F.col("_ngrams")
        )
        evl_row = evl.agg(F.collect_list("ngram").alias("_eval_set"))
        scored = d.withColumn("_probe", ngram_col).crossJoin(
            F.broadcast(evl_row)
        )
        return scored.select(
            F.col("_id").alias(id_col),
            F.size("_ngrams").cast("bigint").alias("n_ngrams"),
            F.size(F.array_intersect("_probe", "_eval_set"))
            .cast("bigint").alias("n_hit"),
        ).withColumn("contaminated", F.col("n_hit") > 0)
    # join strategy: explode distinct per-doc n-grams, broadcast-probe the
    # eval set, count hits per doc. left join keeps 0-hit docs without a
    # second pass over the corpus.
    exploded = d.select(
        "_id",
        F.size("_ngrams").alias("_n_ngrams"),
        F.explode_outer("_ngrams").alias("_g"),
    )
    probe = F.xxhash64("_g") if hash_ngrams else F.col("_g")
    hits = (
        exploded.withColumn("_probe", probe)
        .join(
            F.broadcast(evl.withColumnRenamed("ngram", "_probe")
                        .withColumn("_hit", F.lit(1))),
            "_probe",
            "left",
        )
        .groupBy("_id")
        .agg(
            F.max("_n_ngrams").alias("n_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hit"),
        )
    )
    return hits.select(
        F.col("_id").alias(id_col),
        F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("bigint")
        .alias("n_ngrams"),
        F.col("n_hit").cast("bigint").alias("n_hit"),
    ).withColumn("contaminated", F.col("n_hit") > 0)


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 13,
    max_hits: int = 0,
    method: str = "join",
    hash_ngrams: bool = False,
) -> DataFrame:
    """The corpus with contaminated docs REMOVED: keep docs whose hit
    count is <= ``max_hits`` (0 = any overlap drops the doc, the
    GPT-3/Llama rule). Schema = input schema, untouched."""
    stats = contamination_stats(
        docs,
        eval_docs,
        id_col=id_col,
        text_col=text_col,
        eval_text_col=eval_text_col,
        n=n,
        method=method,
        hash_ngrams=hash_ngrams,
    )
    keep = stats.filter(F.col("n_hit") <= max_hits).select(
        F.col(id_col).alias("_keep_id")
    )
    return docs.join(
        keep, docs[id_col] == keep["_keep_id"], "left_semi"
    )
