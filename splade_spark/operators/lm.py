"""Corpus-trained unigram language-model scoring (perplexity-style
quality filtering) and corpus-level n-gram frequency analysis.

Web-corpus pipelines (CCNet and successors) bucket documents by LM
perplexity to separate fluent prose from gibberish/boilerplate. A real
Kneser-Ney or neural LM needs external model files (not allowed here);
a corpus-trained add-one-smoothed unigram LM is the self-contained
version of the same operator shape, and its Spark plan IS the plan the
bigger model would use: train = one token-count aggregation, score = one
equi-join between per-doc token counts and the vocab table.

Exact-integer contract: token costs are pre-rounded to MICRO-nats
(bigint) in the vocab table, so per-doc totals are exact integer sums —
order-independent, hash-stable across engines, no float-summation drift.
The rounding happens once per vocab entry (after ``-ln(p)``), not per
occurrence, so the only cross-engine float op is ``ln`` on identical
doubles (bit-equal in practice across libm implementations).

Scale shapes:
- ``train_unigram_lm``: explode -> groupBy(token) with map-side partial
  aggregation; one shuffle keyed on token, counts only.
- ``doc_lm_cost``: explode -> per-(doc, token) count (ONE shuffle with
  map-side combine; AQE coalesces the small post-agg partitions), vocab
  join on token. The vocab is broadcast when small (caller hint
  ``broadcast_vocab``); web-scale vocabs fall back to a hash join keyed
  on token — the same key the training shuffle used.
- ``top_ngrams``: explode n-grams -> count -> distributed TakeOrdered
  (``orderBy().limit()``), never a global Window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from splade_spark.config import DEFAULT, EngineConfig
from splade_spark.functions.tokenize import tokens_col
from splade_spark.operators.decontam import ngrams_col


def train_unigram_lm(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Vocab table (token, tf, cost_micro) with add-one smoothing over
    the corpus: p(token) = (tf + 1) / (total_tokens + vocab_size),
    cost_micro = round(-ln(p) * 1e6) as bigint.

    One explode + one token-keyed count; the two scalar normalizers
    (total, vocab size) ride along via a single-row cross join, so the
    job is one shuffle end-to-end.
    """
    counts = (
        docs.select(F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        # the scalar normalizers below re-read this subtree; a lazy
        # localCheckpoint materializes the token-count shuffle ONCE (the
        # broadcast side runs first and primes it) instead of counting
        # the corpus twice
        .localCheckpoint(eager=False)
    )
    totals = counts.agg(
        F.sum("tf").alias("_total"), F.count(F.lit(1)).alias("_vocab")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "token",
        "tf",
        F.round(
            -F.log((F.col("tf") + 1) / (F.col("_total") + F.col("_vocab")))
            * F.lit(1_000_000.0)
        ).cast("bigint").alias("cost_micro"),
    )


def oov_cost_micro(lm: DataFrame) -> int:
    """The smoothed cost of an unseen token: round(-ln(1/(total+V))*1e6).
    Driver-side scalar (two-aggregate job over the vocab table)."""
    import math

    row = lm.agg(
        F.sum("tf").alias("t"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    return round(-math.log(1.0 / (row["t"] + row["v"])) * 1_000_000)


def doc_lm_cost(
    docs: DataFrame,
    lm: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_micro: int | None = None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-doc LM cost: (id_col, n_tokens, nll_micro) where nll_micro =
    sum over tokens of cost_micro (exact bigint). Mean cost in
    micro-nats/token is nll_micro / n_tokens — left to the caller so the
    gate hashes exact integers.

    OOV tokens (absent from ``lm``) cost ``oov_micro``; default is the
    add-one smoothed unseen-token cost computed from ``lm`` itself.
    """
    if oov_micro is None:
        oov_micro = oov_cost_micro(lm)
    toks = docs.select(
        F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks")
    )
    # explode is row-local; the one shuffle is the (doc, token) count,
    # map-side combined, with row count bounded by distinct tokens/doc
    per_tok = (
        toks.select(
            "_id", F.size("_toks").alias("_n"), F.explode_outer("_toks").alias("token")
        )
        .groupBy("_id", "_n", "token")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    vocab = lm.select("token", "cost_micro")
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    # empty docs survive as a single null-token row from explode_outer;
    # the when-guard keeps them at zero cost instead of charging OOV
    scored = per_tok.join(vocab, "token", "left").select(
        "_id",
        "_n",
        F.when(
            F.col("token").isNotNull(),
            F.col("_tf")
            * F.coalesce(F.col("cost_micro"), F.lit(int(oov_micro))),
        ).alias("_cost"),
    )
    return scored.groupBy("_id").agg(
        F.max("_n").cast("bigint").alias("n_tokens"),
        F.coalesce(F.sum("_cost"), F.lit(0)).cast("bigint")
        .alias("nll_micro"),
    ).select(F.col("_id").alias(id_col), "n_tokens", "nll_micro")


def top_ngrams(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n: int = 2,
    k: int = 50,
) -> DataFrame:
    """Corpus-wide most frequent n-grams: (ngram, freq), deterministic
    order (freq desc, ngram asc), top ``k``. The sort-limit pair executes
    as a distributed TakeOrdered over the partial counts — no single-task
    global window."""
    grams = docs.select(
        F.explode(ngrams_col(tokens_col(text_col), n)).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("ngram"))
        .limit(k)
    )


def related_terms(
    docs: DataFrame,
    seeds: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed_col: str = "seed",
    topn: int = 5,
    min_cooc: int = 2,
    max_df_frac: float = 0.5,
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """"Related searches": the terms most associated with each seed term
    by document-level PMI — ``(seed, rank, term, cooc, pmi_micro)``.

    PMI(a, b) = ln(n_docs · c_ab / (df_a · df_b)) over PRESENCE (distinct
    doc-term pairs), the classic word-association score. Candidates
    above ``max_df_frac`` document frequency are dropped (stopwords
    co-occur with everything and would top every list); pairs below
    ``min_cooc`` are dropped (singleton co-occurrence makes PMI a noise
    amplifier). Ranking is (pmi desc, cooc desc, term asc); the seed
    itself is excluded. ``pmi_micro`` is the micro-nat integer rounding
    (the module's exact-integer contract), so cross-engine compares
    never hash a float.

    Scale shape: presence = one distinct on (doc, term) — the same
    aggregation df computation already needs; the seed side then
    SEMI-joins presence (seeds are a query batch, broadcast), and
    co-occurrence is one equi-join on doc_id between the seed-docs slice
    and the full presence table, aggregated map-side-first on
    (seed, term). Nothing ever pairs terms corpus-wide — the join is
    anchored on the tiny seed slice, so the output of the expensive side
    is bounded by Σ_seed df(seed) · avg_doc_distinct, not vocab².
    """
    n_docs = docs.count()
    presence = (
        docs.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.explode(
                F.array_distinct(tokens_col(text_col, cfg.max_tokens))
            ).alias("term"),
        )
        .distinct()
    )
    df_tab = presence.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    sd = seeds.select(F.col(seed_col).cast("string").alias("seed")).distinct()
    seed_docs = (
        F.broadcast(sd)
        .join(presence, sd["seed"] == presence["term"])
        .select("seed", "doc_id")
    )
    cooc = (
        seed_docs.join(presence, "doc_id")
        .filter(F.col("term") != F.col("seed"))
        .groupBy("seed", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cooc"))
        .filter(F.col("cooc") >= int(min_cooc))
    )
    cap = int(max_df_frac * n_docs)
    scored = (
        cooc.join(df_tab.withColumnRenamed("df", "df_t"), "term")
        .join(
            df_tab.withColumnRenamed("term", "seed").withColumnRenamed(
                "df", "df_s"
            ),
            "seed",
        )
        .filter(F.col("df_t") <= cap)
        .select(
            "seed", "term", "cooc",
            F.round(
                F.log(
                    F.lit(float(n_docs)) * F.col("cooc")
                    / (F.col("df_s") * F.col("df_t"))
                ) * 1_000_000.0
            ).cast("bigint").alias("pmi_micro"),
        )
    )
    w = Window.partitionBy("seed").orderBy(
        F.desc("pmi_micro"), F.desc("cooc"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(topn))
        .select("seed", F.col("rank").cast("int").alias("rank"),
                "term", "cooc", "pmi_micro")
    )
