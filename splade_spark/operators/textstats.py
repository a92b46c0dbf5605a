"""Text-analysis operators for training-data curation: quality scoring,
token counting, language-ID, exact dedup, fingerprints, SimHash.

The reference (`hyukkyukang/SPLADE`) stops at retrieval; these are the
corpus-hygiene operators an LLM-data pipeline runs over the same
`documents` table (brief: text analysis as first-class components). Every
function here is a pure Catalyst Column pipeline over the shared
tokenizer (`functions.tokenize.tokens_col`) — no Python UDFs, so the
whole stage codegens and scales with the scan.

Ratio outputs are raw doubles; the driver-gated entries round them to
``*_milli`` BIGINTs for hash-stable cross-engine comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from splade_spark.functions.tokenize import tokens_col

# default English stopword probe set shared by quality scoring and lang-ID
DEFAULT_STOPWORDS: tuple[str, ...] = ("the", "a", "of", "to", "and", "in", "is")


def text_quality_features(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Per-doc quality features: (id, n_tokens, mean_tok_len,
    stopword_ratio, n_chars).

    Length, mean token length, and stopword density are the classic cheap
    quality filters (boilerplate and gibberish sit at the distribution
    tails). One projection, no shuffle.
    """
    t = docs.select(id_col, text_col, tokens_col(text_col).alias("toks"))
    n = F.size("toks")
    tok_len_sum = F.aggregate(
        F.transform("toks", lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    sw = F.size(F.filter("toks", lambda x: x.isin(*stopwords)))
    return t.select(
        id_col,
        n.cast("bigint").alias("n_tokens"),
        F.when(n > 0, tok_len_sum / n).otherwise(0.0).alias("mean_tok_len"),
        F.when(n > 0, sw / n).otherwise(0.0).alias("stopword_ratio"),
        F.length(text_col).cast("bigint").alias("n_chars"),
    )


def token_count_features(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, n_distinct, n_ws_tokens): regex-tokenizer counts
    plus the raw whitespace split (the two standard budget estimators)."""
    toks = tokens_col(text_col)
    return docs.select(
        id_col,
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.size(F.split(F.trim(text_col), r"\s+")).cast("bigint").alias("n_ws_tokens"),
    )


def lang_id(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    min_hit_pct: int = 2,
    lang: str = "en",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Stopword-probe language ID: (id, *passthrough, pred_lang).

    Predicts ``lang`` when at least ``min_hit_pct`` percent of tokens are
    probe stopwords — integer arithmetic only (hits*100 >= n*pct), so the
    decision is exact and portable. ``passthrough`` columns (e.g. a
    ground-truth label) are carried along without a join.
    """
    t = docs.select(id_col, *passthrough, tokens_col(text_col).alias("toks"))
    hits = F.size(F.filter("toks", lambda x: x.isin(*stopwords)))
    n = F.size("toks")
    return t.select(
        id_col,
        *passthrough,
        F.when((n > 0) & (hits * 100 >= n * min_hit_pct), lang)
        .otherwise("unknown")
        .alias("pred_lang"),
    )


def exact_duplicate_groups(
    docs: DataFrame,
    *,
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """(fp, n_docs): content-hash groups — the exact-dedup primitive.

    md5 over (optionally lowercased) text, then a hash groupBy whose
    partial aggregation runs map-side: the shuffle carries one row per
    distinct fingerprint, not per doc.
    """
    key = F.lower(text_col) if normalize else F.col(text_col)
    return (
        docs.select(F.md5(key).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def exact_dup_stats(
    docs: DataFrame,
    *,
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """One-row corpus dedup summary: (n_groups, n_dup_groups, n_dup_docs)."""
    g = exact_duplicate_groups(docs, text_col=text_col, normalize=normalize)
    c = F.col("n_docs")
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.coalesce(F.sum(F.when(c > 1, 1).otherwise(0)), F.lit(0))
        .cast("bigint").alias("n_dup_groups"),
        F.coalesce(F.sum(F.when(c > 1, c).otherwise(0)), F.lit(0))
        .cast("bigint").alias("n_dup_docs"),
    )


def fingerprint_col(text_col: Column | str) -> Column:
    """Normalized document fingerprint: md5 over the canonical token join
    — robust to whitespace/punctuation noise, unlike raw-text hashing."""
    return F.md5(F.array_join(tokens_col(text_col), " "))


def simhash(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
) -> DataFrame:
    """(id, simhash): tf-weighted SimHash fingerprint, up to 60 bits.

    Per-token hash = the first bits/4 md5 nibbles (deterministic and
    portable to any engine with md5); each bit takes a +tf/-tf vote per
    token and the fingerprint sets bits with positive totals. Bit
    extraction uses INTEGER division by 2^j — double math drops bits past
    2^53, which caps the portable width at 60 (15 nibbles stays inside a
    signed int64). Shuffle shape: (doc, bit) partial-agg then per-doc agg.
    """
    if bits % 4 != 0 or not 0 < bits <= 60:
        raise ValueError(f"bits must be a multiple of 4 in (0, 60], got {bits}")
    tf = (
        docs.select(id_col, F.explode(tokens_col(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    hv = F.conv(F.substring(F.md5("term"), 1, bits // 4), 16, 10).cast("long")
    bits_df = tf.select(
        id_col, "tf", hv.alias("hv"),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
    ).withColumn("p2", F.pow(F.lit(2.0), F.col("j")).cast("long"))
    bit = F.expr("hv div p2") % 2
    votes = bits_df.groupBy(id_col, "j").agg(
        F.sum(F.col("tf") * (2 * bit - 1)).alias("v")
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.pow(F.lit(2.0), F.col("j")).cast("long"))
            .otherwise(0)
        ).cast("bigint").alias("simhash")
    )


def simhash_dup_groups(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
) -> DataFrame:
    """(id, simhash, group_size): docs sharing a fingerprint form a dup
    group — exact-collision grouping, one window over the fingerprint."""
    sims = simhash(docs, id_col=id_col, text_col=text_col, bits=bits)
    w = Window.partitionBy("simhash")
    return sims.select(
        id_col, "simhash",
        F.count(F.lit(1)).over(w).cast("bigint").alias("group_size"),
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filters + PII detection (round-4 additions)
# ---------------------------------------------------------------------------

def repetition_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc repetition features for boilerplate filtering (the
    duplicate-line and repeated-n-gram fractions of Rae et al. 2021,
    "Scaling Language Models" §A1.1, public paper): (id, n_lines,
    dup_line_frac, n_tokens, top_bigram_count, top_bigram_frac).

    - ``dup_line_frac`` — fraction of non-empty lines that repeat an
      earlier line. Pure array Columns (``array_distinct`` over the
      split), zero shuffle.
    - ``top_bigram_frac`` — fraction of tokens covered by the most
      frequent adjacent word pair: one explode + one (doc, bigram)
      hash aggregate + one (doc) max — both aggregates map-side
      partial, keyed by doc so skew equals the longest document, which
      ``max_tokens``-style truncation upstream bounds.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    base = docs.select(
        id_col,
        tokens_col(text_col).alias("toks"),
        F.size(lines).alias("n_lines"),
        (
            F.when(
                F.size(lines) > 0,
                1.0 - F.size(F.array_distinct(lines)) / F.size(lines),
            ).otherwise(0.0)
        ).alias("dup_line_frac"),
    )
    bigrams = base.select(
        id_col, "n_lines", "dup_line_frac",
        F.size("toks").alias("n_tokens"),
        F.explode_outer(
            # sequence(1,0) counts DOWN in Spark — guard short docs
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.concat(
                        F.element_at("toks", i), F.lit(" "),
                        F.element_at("toks", i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    counts = bigrams.groupBy(
        id_col, "n_lines", "dup_line_frac", "n_tokens", "bigram"
    ).agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy(id_col, "n_lines", "dup_line_frac", "n_tokens").agg(
        F.max(F.when(F.col("bigram").isNotNull(), F.col("c")).otherwise(0))
        .cast("bigint").alias("top_bigram_count"),
    ).select(
        id_col, "n_lines", "dup_line_frac", "n_tokens", "top_bigram_count",
        F.when(
            F.col("n_tokens") >= 2,
            2.0 * F.col("top_bigram_count") / F.col("n_tokens"),
        ).otherwise(0.0).alias("top_bigram_frac"),
    )


# PII patterns: conservative, portable across Java regex (Spark) and RE2
# (DuckDB) — no lookaround, no backreferences. Redaction order matters:
# IPs first (an IPv4 inside a longer digit run must not be half-eaten by
# the phone pattern), then emails, then phones.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+[0-9][0-9()\-. ]{6,}[0-9]"


def pii_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc PII detection + redaction: (id, n_emails, n_ipv4,
    n_phones, redacted). Counts are ``regexp_count``; ``redacted``
    replaces matches with <EMAIL>/<IP>/<PHONE> tokens in the order the
    module constant block documents. Pure Column expressions — the
    scrub rides the scan with zero shuffle, which is the only shape
    that survives a 100 TB pass.

    The phone pattern requires a leading ``+`` (international form) to
    keep false positives off prices/ids; swap in a locale pack for
    production scrubbing.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(t, PII_IPV4_RE, "<IP>")
    redacted = F.regexp_replace(redacted, PII_EMAIL_RE, "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        id_col,
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4_RE)).cast("bigint").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("bigint").alias("n_phones"),
        redacted.alias("redacted"),
    )


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Split documents into overlapping token windows for training:
    (id, chunk_id, n_chunks, n_chunk_tokens, chunk_text).

    Windows start every ``chunk_tokens - overlap`` tokens; window k
    covers tokens ``[k·step, k·step + chunk_tokens)``; windows exist
    while ``k·step < n_tokens`` (an empty document yields one empty
    chunk so no row is silently lost). Trailing windows may be shorter
    than ``chunk_tokens`` — deterministic and join-back-able by
    (id, chunk_id).

    One projection + one generator (posexplode) per doc — no shuffle,
    no Python; the chunker rides the scan. At 100 TB the output is
    written partitioned by whatever the training mix needs; nothing
    here forces a repartition.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    t = docs.select(
        id_col, tokens_col(text_col, max_tokens=max_tokens).alias("toks")
    )
    n = F.greatest(F.size("toks"), F.lit(1))
    ks = F.sequence(F.lit(0), F.ceil(n / F.lit(step)).cast("int") - 1)
    ks = F.filter(ks, lambda k: k * step < n)
    chunks = t.select(
        id_col,
        F.size("toks").alias("n_tokens"),
        F.size(ks).cast("bigint").alias("n_chunks"),
        F.posexplode(
            F.transform(
                ks,
                lambda k: F.array_join(
                    F.slice("toks", k * step + 1, chunk_tokens), " "
                ),
            )
        ).alias("chunk_id", "chunk_text"),
    )
    return chunks.select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "n_chunks",
        F.least(
            F.greatest(
                F.col("n_tokens") - F.col("chunk_id") * step, F.lit(0)
            ),
            F.lit(chunk_tokens),
        ).cast("bigint").alias("n_chunk_tokens"),
        "chunk_text",
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    min_docs: int = 5,
) -> DataFrame:
    """CCNet/RefinedWeb-style cross-document boilerplate removal: a
    trimmed non-empty line occurring in at least ``min_docs`` DISTINCT
    documents of the same group (host/source; global when ``group_col``
    is None) is navigation/footer chrome — drop it from every doc,
    preserve all other lines in their original order.

    Returns (id_col, n_lines, n_kept, text) with the cleaned text.

    Scale shape: line frequencies are a distinct + two-level count keyed
    on (group, line) — map-side combined, one shuffle; the boilerplate
    set is tiny by construction (lines that repeat across >= min_docs
    docs) so it applies as a BROADCAST join that marks chrome lines —
    the corpus' line table is never shuffled on the line key — and the
    counts plus the rebuilt text come out of ONE doc-id regroup. At
    100 TB the only wide exchanges are the (group, line) count and that
    regroup, both hash-partitioned aggregates.
    """
    gcol = F.col(group_col) if group_col else F.lit("")
    lines = docs.select(
        F.col(id_col).alias("_id"),
        gcol.alias("_grp"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
        .alias("_pos", "_line"),
    ).withColumn("_norm", F.trim("_line"))
    boiler = (
        lines.filter(F.col("_norm") != "")
        .select("_grp", "_norm", "_id")
        .distinct()
        .groupBy("_grp", "_norm")
        .agg(F.count(F.lit(1)).alias("_ndocs"))
        .filter(F.col("_ndocs") >= min_docs)
        .select("_grp", "_norm")
    )
    # broadcast LEFT join marks chrome lines instead of anti-joining them
    # away, so total and kept counts and the rebuilt text all come out of
    # ONE pass / one doc-id regroup over the line table
    marked = lines.join(
        F.broadcast(boiler.withColumn("_chrome", F.lit(True))),
        ["_grp", "_norm"],
        "left",
    ).withColumn("_keep", F.col("_chrome").isNull())
    rebuilt = marked.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_line", "_keep"))
                    ),
                    lambda s: s["_keep"],
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("text"),
    )
    return rebuilt.select(
        F.col("_id").alias(id_col),
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        "text",
    )
