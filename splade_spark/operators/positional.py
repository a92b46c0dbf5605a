"""Positional index + exact phrase retrieval.

Engine addition (the reference scores bags of term weights only —
/root/reference/src/indexing/sparse_index.py:661-755 has no position
plane), but phrase queries are table stakes for a fulltext index at
web scale, and the position lists are exactly the structure the
classic literature stores beside the impact postings.

Data model: ``positional_postings`` inverts the corpus into one row per
(term, doc) holding the ASCENDING 1-based token positions of that term
in that doc. Token semantics are byte-identical to the scoring index
(``tokens_col``: lower → [a-z0-9]+ split → truncate at ``max_tokens``),
so a phrase match here agrees with what the BM25 plane indexed.

Phrase semantics: phrase t1..tn occurs at start p iff token p is t1,
token p+1 is t2, ... token p+n-1 is tn. Occurrences may overlap
("a a a" contains "a a" twice); a repeated term in the phrase is a
distinct slot and must match at its own offset.

Spark-first plan shape (100 TB):
- building the lists is ONE hash-partitioned groupBy((term, doc))
  with map-side combine over the posexplode'd token stream — the same
  magnitude and shuffle as the tf pass of the index build;
- a phrase query joins the tiny (slot → term) dimension BROADCAST
  against the position lists, so only postings of the phrase's own
  terms are ever read (with a saved term-sorted layout the term filter
  pushes into the parquet scan exactly like the scoring index's
  ``isin`` pushdown);
- match detection is algebraic, not positional-loop: slot i shifts its
  positions by −i, a phrase occurrence is a (doc, start) where ALL
  n slots land — ``groupBy(query, doc, start).count() == n`` — two
  hash aggregates with map-side combine, row volume = total
  occurrences of the phrase's terms (what any engine must touch).
  Nothing quadratic, nothing driver-side.

Storage: position lists compress like doc gaps — ascending ints →
delta + LEB128 varint (``encode_positions``/``decode_positions`` reuse
the posting codec, functions/codec.py). At 10^12 docs the positional
plane is the index's largest table (one entry per token, not per
(term, doc)); varint gaps on 1-based positions bound it near the
token-stream entropy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.codec import varint_decode, varint_encode
from ..functions.tokenize import tokens_col


def positional_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Corpus → (term string, doc_id string, positions array<int> asc,
    tf int). Positions are 1-based token offsets after the engine's
    classic tokenization (truncation at ``cfg.max_tokens`` included, so
    the position plane never claims text the scoring index dropped)."""
    toks = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        tokens_col(text_col, cfg.max_tokens).alias("tokens"),
    )
    pos = toks.select(
        "doc_id", F.posexplode("tokens").alias("pos0", "term")
    )
    return pos.groupBy("term", "doc_id").agg(
        F.sort_array(F.collect_list(F.col("pos0") + 1)).alias("positions"),
        F.count(F.lit(1)).cast("int").alias("tf"),
    )


def phrase_occurrences(
    positional: DataFrame,
    phrases: DataFrame,
    query_id_col: str = "query_id",
    phrase_col: str = "phrase",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Exact phrase match over a positional index → (query_id, doc_id,
    n_occurrences bigint), one row per (phrase, doc) with ≥1 occurrence.

    ``phrases`` is a DataFrame of (query_id, phrase text); each phrase
    tokenizes with the engine tokenizer. A phrase that tokenizes to
    NOTHING (punctuation-only) produces no output rows; a phrase with a
    term absent from the corpus matches nothing (every start is missing
    that slot). Single-token phrases degenerate to n_occurrences = tf.
    """
    ptoks = phrases.select(
        F.col(query_id_col).alias("query_id"),
        tokens_col(phrase_col, cfg.max_tokens).alias("_pt"),
    ).filter(F.size("_pt") >= 1)
    slots = ptoks.select(
        "query_id",
        F.size("_pt").alias("n_slots"),
        F.posexplode("_pt").alias("off", "term"),
    )
    # positions of slot (off, term) shifted to the phrase START they
    # would witness; starts < 1 fall off the front of the doc
    j = positional.join(F.broadcast(slots), "term")
    starts = j.select(
        "query_id",
        "doc_id",
        "n_slots",
        "off",
        F.explode(
            F.transform("positions", lambda p: p - F.col("off"))
        ).alias("start"),
    ).filter(F.col("start") >= 1)
    # an occurrence at (doc, start) needs EVERY slot present: rows are
    # unique per (query, doc, start, off) — positions are distinct per
    # (term, doc) and offs per phrase — so count(*) counts matched slots
    hits = (
        starts.groupBy("query_id", "doc_id", "start")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.max("n_slots").alias("_n"),
        )
        .filter(F.col("_c") == F.col("_n"))
    )
    return hits.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )


def phrase_search(
    docs: DataFrame,
    phrases: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """End-to-end: build the position lists, match a literal phrase set.
    Returns (query_id, doc_id, n_occurrences)."""
    spark = docs.sparkSession
    pdf = spark.createDataFrame(phrases, "query_id string, phrase string")
    positional = positional_postings(docs, id_col, text_col, cfg)
    return phrase_occurrences(positional, pdf, cfg=cfg)


def encode_positional(positional: DataFrame) -> DataFrame:
    """(…, positions array<int>) → (…, positions binary): delta+varint
    bytes of [first_pos, gap1, …] — the storage form for a saved
    positional layout (same codec family as posting doc gaps)."""

    @F.pandas_udf("binary")
    def enc(ps: pd.Series) -> pd.Series:
        out = []
        for p in ps:
            a = np.asarray(p, dtype=np.int64)
            gaps = np.empty_like(a)
            if a.size:
                gaps[0] = a[0]
                np.subtract(a[1:], a[:-1], out=gaps[1:])
            out.append(varint_encode(gaps))
        return pd.Series(out)

    return positional.withColumn("positions", enc("positions"))


def decode_positional(encoded: DataFrame) -> DataFrame:
    """Inverse of ``encode_positional``: binary → array<int> positions."""

    @F.pandas_udf("array<int>")
    def dec(bs: pd.Series) -> pd.Series:
        out = []
        for b in bs:
            gaps = varint_decode(bytes(b))
            out.append(np.cumsum(gaps, dtype=np.int64).astype(np.int32))
        return pd.Series(out)

    return encoded.withColumn("positions", dec("positions"))
