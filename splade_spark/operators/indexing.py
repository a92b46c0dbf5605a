"""Inverted-index build: corpus → compressed, block-structured postings.

Reference semantics reproduced (SURVEY.md §3.2):
- pass-1 document-frequency counts
  (/root/reference/src/indexing/sparse_index.py:621-632) → ``groupBy(term).count``
- pass-2 postings gather, ascending doc order within a term
  (/root/reference/src/indexing/sparse_index.py:591-611,638-658) →
  shuffle on (term_id, block_id) + ``sort_array(collect_list(...))``
- strict ``weight > min_weight`` filter
  (/root/reference/src/indexing/sparse_index.py:65-68)
- per-doc top-k term cap (/root/reference/src/indexing/sparse_index.py:128-158)
- index metadata snapshot (/root/reference/script/index.py:104-123)

Engine additions (north rule, not in the reference):
- BM25 impact weights precomputed at index time so query-time accumulation
  is the reference's plain dot product (SURVEY.md §4.3.1)
- skew-split: a term with df > block_size is split into multiple blocks by
  contiguous doc_idx RANGE — `block_id = doc_idx // range_per_block` with
  `n_blocks = ceil(df / block_size)`. The composite shuffle key
  (term_id, block_id) is exactly a salted repartition-by-term where the
  salt is derived from df: head terms (df ≈ corpus size) fan out over
  many reducers instead of OOMing one task, and blocks keep disjoint
  doc ranges so min_doc/max_doc pruning and delta encoding stay tight.
- delta+varint compressed blocks with (min_doc, max_doc, max_weight)
  block-max metadata; blocks laid out impact-ordered (desc max_weight)
  within a term (SURVEY.md §2.6 O2 — documented layout deviation).
- per-partition lineage checkpoints → resumable builds (see checkpoint.py).

At 100 TB: the only wide shuffles are groupBy(url/term) aggregations and
the (term_id, block_id) block build — all key-partitioned hash aggregates
with map-side partial aggregation; the dimension joins (doc_dim, term
stats) are plain equi-joins that AQE turns into broadcasts when small and
sort-merge when not.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..config import DEFAULT, TERMS_PER_TOKEN_BOUND, EngineConfig
from ..functions.codec import encode_block
from ..functions.tokenize import tokens_col
from .ids import _ROW_MASK, assign_global_ids, ranged_prefix_offsets

POSTINGS_SCHEMA = (
    "term_id BIGINT, block_id INT, n_postings INT, min_doc BIGINT, "
    "max_doc BIGINT, max_weight FLOAT, doc_gaps BINARY, weights BINARY"
)


@dataclass
class InvertedIndex:
    """Handle over the index tables (all DataFrames, nothing collected)."""

    postings: DataFrame      # POSTINGS_SCHEMA
    term_dict: DataFrame     # term string, term_id long, df long, idf double
    doc_dim: DataFrame       # doc_idx long, doc_id string, dl int
    meta: dict               # n_docs, avgdl, k1, b, ... (small, driver-side)

    def save(self, out_dir: str) -> None:
        (self.postings
         .repartition(int(self.meta["index_partitions"]), "term_id")
         .sortWithinPartitions("term_id", F.desc("max_weight"))  # impact-ordered
         .write.mode("overwrite").parquet(os.path.join(out_dir, "postings")))
        self.term_dict.write.mode("overwrite").parquet(os.path.join(out_dir, "term_dict"))
        self.doc_dim.write.mode("overwrite").parquet(os.path.join(out_dir, "doc_dim"))
        with open(os.path.join(out_dir, "index_meta.json"), "w") as f:
            json.dump(self.meta, f, indent=2, sort_keys=True)

    def unpersist(self) -> None:
        for df in (self.postings, self.term_dict, self.doc_dim):
            try:
                df.unpersist()
            except Exception:
                pass

    @classmethod
    def load(cls, spark: SparkSession, out_dir: str) -> "InvertedIndex":
        with open(os.path.join(out_dir, "index_meta.json")) as f:
            meta = json.load(f)
        return cls(
            postings=spark.read.parquet(os.path.join(out_dir, "postings")),
            term_dict=spark.read.parquet(os.path.join(out_dir, "term_dict")),
            doc_dim=spark.read.parquet(os.path.join(out_dir, "doc_dim")),
            meta=meta,
        )


def doc_term_frequencies(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: EngineConfig = DEFAULT,
) -> tuple[DataFrame, DataFrame]:
    """(tf, doc_len): tf = (doc_id, term, tf int), doc_len = (doc_id, dl int).

    Tokenization is a pure Catalyst expression (whole-stage codegen); the
    explode+groupBy is the A5 bag-of-words aggregation
    (/root/reference/src/model/retriever/sparse/neural/splade.py:243-265).
    """
    toks = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        tokens_col(text_col, cfg.max_tokens).alias("tokens"),
    )
    doc_len = toks.select("doc_id", F.size("tokens").cast("int").alias("dl"))
    tf = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )
    return tf, doc_len


def _corpus_stats(doc_len: DataFrame) -> tuple[int, float, int]:
    """One stats job: (n_docs, avgdl, total_tokens). Raises on empty."""
    row = doc_len.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_tokens"),
    ).collect()[0]
    if row["n_docs"] == 0 or row["avgdl"] is None:
        raise ValueError("build_index: corpus is empty — nothing to index")
    return int(row["n_docs"]), float(row["avgdl"]), int(row["total_tokens"])


def _number_docs_with_stats(
    toks: DataFrame, num_partitions: int
) -> tuple[DataFrame, tuple[int, float, int]]:
    """assign_global_ids(key=doc_id) with the corpus-stats aggregation
    FUSED into the per-partition counts job (one blocking job instead of
    two — counts, Σdl and doc totals come from the same scan of the
    persisted ranged sort). Same terasort numbering contract as
    ids.assign_global_ids: doc_idx = rank of doc_id ascending."""
    # shared terasort scaffold (ids.ranged_prefix_offsets) with the
    # corpus-stats totals riding the same per-partition counts job; the
    # lazy localCheckpoint inside it carries the id-stability +
    # cache-invalidation rationale documented on ids.assign_global_ids
    ranged, offsets_df, totals = ranged_prefix_offsets(
        toks, "doc_id", num_partitions,
        {"_n": F.count(F.lit(1)), "_dl": F.sum("dl")},
    )
    n_docs = totals["_n"]
    if n_docs == 0:
        raise ValueError("build_index: corpus is empty — nothing to index")
    total_tokens = totals["_dl"]
    avgdl = total_tokens / n_docs
    numbered = ranged.select(
        "*",
        F.spark_partition_id().alias("_pid"),
        F.monotonically_increasing_id().bitwiseAND(F.lit(_ROW_MASK)).alias("_row"),
    )
    numbered = (
        numbered.join(F.broadcast(offsets_df), "_pid")
        .withColumn("doc_idx", (F.col("_n_off") + F.col("_row")).cast("long"))
        .drop("_pid", "_row", "_n_off", "_dl_off")
    )
    return numbered, (n_docs, avgdl, total_tokens)


def _tf_from_tokens_arrow(numbered: DataFrame) -> DataFrame:
    """(doc_idx, dl, tokens) → (doc_idx, dl, term, tf) via Arrow-batched
    pandas — NO JVM explode, NO (doc, term) shuffle.

    One input row is one whole document, so term frequencies are exact
    per batch without any cross-row aggregation: the classic
    explode+groupBy plan (A5) shuffles ~1.5 rows per token, while this
    emits finished tf rows in a single narrow pass. It also sidesteps a
    measured single-JVM pathology: exploding O(100M) short strings
    anti-scales past ~8 local threads (allocation/GC contention), whereas
    Python workers are separate processes and scale with cores. On a real
    multi-executor cluster both effects still favor this plan — it is
    strictly less work and less shuffle."""

    def tf_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks = pdf["tokens"]
            lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
            if int(lens.sum()) == 0:
                continue
            flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
            g = pd.DataFrame(
                {
                    "doc_idx": np.repeat(pdf["doc_idx"].to_numpy(), lens),
                    "dl": np.repeat(pdf["dl"].to_numpy(), lens),
                    "term": flat,
                }
            ).groupby(["doc_idx", "dl", "term"], sort=False, as_index=False)
            out = g.size().rename(columns={"size": "tf"})
            yield out[["doc_idx", "dl", "term", "tf"]]

    return numbered.select("doc_idx", "dl", "tokens").mapInPandas(
        tf_batches, schema="doc_idx long, dl int, term string, tf int"
    )


def build_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: EngineConfig = DEFAULT,
    weighted_terms: DataFrame | None = None,
    n_docs_hint: int | None = None,
) -> InvertedIndex:
    """Build the full index from a corpus DataFrame.

    If ``weighted_terms`` is given it must be (doc_id string, term string,
    weight float) — e.g. a SPLADE-style expansion (expander.py) — and BM25
    impact computation is skipped (the expansion already carries weights);
    otherwise classic BM25 impacts are computed from term frequencies.

    Classic path is FUSED: the token arrays ride through the doc-numbering
    range shuffle, so the token explode emits integer ``doc_idx`` (and
    ``dl``) directly — the corpus-sized string join of a naive
    tf ⋈ doc_dim plan never exists, and every wide shuffle downstream
    carries int keys instead of url strings.
    """
    if weighted_terms is not None:
        tf, doc_len = doc_term_frequencies(docs, id_col, text_col, cfg)
        return index_from_tf(tf, doc_len, cfg=cfg, weighted_terms=weighted_terms)

    # size the build parallelism to the corpus: ceil(n_docs /
    # docs_per_partition) partitions, capped by the cluster-side
    # index_partitions knob — a 5k-doc build runs 4-wide instead of paying
    # 32 tasks of scheduling overhead per stage, while web-scale corpora
    # always hit the cap. The sizing count is metadata-cheap on a bare
    # parquet scan (row-group stats) but a full pass on a filtered or
    # Iceberg source — callers with such inputs pass ``n_docs_hint``
    # (any upper-bound estimate works; it only picks a task width) to
    # skip the pass entirely. The shuffle-partition conf is scoped to the
    # same width for the build's own stages.
    n_est = docs.count() if n_docs_hint is None else int(n_docs_hint)
    n_part = max(4, min(
        int(cfg.index_partitions),
        -(-n_est // max(1, int(cfg.docs_per_partition))),
    ))
    spark = docs.sparkSession
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    try:
        return _build_index_classic(docs, id_col, text_col, cfg, n_part)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)


def _build_index_classic(
    docs: DataFrame, id_col: str, text_col: str, cfg: EngineConfig,
    n_part: int,
) -> InvertedIndex:
    toks = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        tokens_col(text_col, cfg.max_tokens).alias("tokens"),
    ).withColumn("dl", F.size("tokens").cast("int"))
    # deterministic global doc numbering: ascending doc_id (SURVEY §4.3.5).
    # _number_docs_with_stats persists its ranged sort internally — required
    # for id stability (re-executed column-pruned plans re-sample different
    # range boundaries, observed as doc_idx collisions), and doubling as
    # the single materialization both doc_dim and tf read; the corpus
    # stats ride the same counts job. An alternative that numbers a narrow
    # (doc_id)-only projection and equi-joins ids back into the tokenize
    # stream measured 2.6x slower at local[32] (the join falls to
    # sort-merge once the id dimension outgrows the broadcast threshold),
    # so the wide-cache plan stands.
    numbered, stats = _number_docs_with_stats(toks, n_part)
    doc_dim = numbered.select("doc_idx", "doc_id", "dl").persist()
    # tf backend (all three measured on this sandbox at 1M docs, local[8],
    # ADJACENT runs in the same host period — this VM's throughput swings
    # >2x between periods, so only adjacent comparisons are meaningful):
    # - "jvm" (default): explode+groupBy(doc,term) — partial agg, one wide
    #   shuffle keyed by (doc_idx, term). 387s adjacent / 130-145s best
    #   period. The shuffle is ~1.7 GB after map-side combine; wins.
    # - "expr": per-doc tf as a pure Column expression (array_distinct +
    #   filter-count per token array) — each doc is ONE row, so tf needs
    #   NO shuffle at all. Measured 574s adjacent (1.5x slower than jvm):
    #   the O(distinct x tokens) string comparisons per doc (~120x256 here)
    #   cost more than the shuffle they remove. Kept as the zero-shuffle
    #   option for clusters where shuffle IO, not CPU, binds.
    # - "arrow": exact per-doc tf inside an Arrow-batched pandas stage; no
    #   shuffle, but Python workers contend with the JVM at high local
    #   thread counts (162s@8 vs 256s@32 in the round-1 period).
    backend = os.environ.get("SPARK_GRAFT_TF_BACKEND", "jvm")
    if backend == "jvm":
        tf_idx = (
            numbered.select("doc_idx", "dl", F.explode("tokens").alias("term"))
            .groupBy("doc_idx", "dl", "term")
            .agg(F.count(F.lit(1)).cast("int").alias("tf"))
            .persist()
        )
    elif backend == "arrow":
        tf_idx = _tf_from_tokens_arrow(numbered).persist()
    else:
        tf_structs = F.transform(
            F.array_distinct("tokens"),
            lambda t: F.struct(
                t.alias("term"),
                F.size(F.filter("tokens", lambda x: x == t)).cast("int").alias("tf"),
            ),
        )
        tf_idx = (
            numbered.select(
                "doc_idx", "dl", F.explode(tf_structs).alias("s")
            )
            .select("doc_idx", "dl", F.col("s.term").alias("term"),
                    F.col("s.tf").alias("tf"))
            .persist()
        )
    idx = _finish_classic(tf_idx, doc_dim, stats, cfg, n_part)
    tf_idx.unpersist()
    return idx


def index_from_tf(
    tf: DataFrame,
    doc_len: DataFrame,
    cfg: EngineConfig = DEFAULT,
    weighted_terms: DataFrame | None = None,
) -> InvertedIndex:
    """Index build from pre-tokenized inputs: ``tf`` = (doc_id string, term
    string, tf int), ``doc_len`` = (doc_id string, dl int). This is the
    stage-2 entry the resumable path (checkpoint.py) and the streaming
    fold (streaming/stream_index.py) use after restoring tf/dl shards —
    mirroring the reference's encode→index split
    (/root/reference/script/index.py vs script/encode.py). Pays one
    doc_id-string equi-join to reach integer doc space (the fused
    build_index path avoids it when raw text is available)."""
    doc_len = doc_len.persist()
    stats = _corpus_stats(doc_len)
    doc_dim = assign_global_ids(
        doc_len, key="doc_id", id_col="doc_idx",
        num_partitions=cfg.index_partitions,
    ).select("doc_idx", "doc_id", "dl").persist()

    if weighted_terms is None:
        tf_idx = (
            tf.join(doc_dim.select("doc_id", "doc_idx", "dl"), "doc_id")
            .select("doc_idx", "dl", "term", "tf")
            .persist()
        )
        idx = _finish_classic(tf_idx, doc_dim, stats, cfg)
    else:
        tf_idx = (
            weighted_terms.join(doc_dim.select("doc_id", "doc_idx"), "doc_id")
            .select("doc_idx", "term", F.col("weight").cast("float").alias("weight"))
            .persist()
        )
        idx = _finish_weighted(tf_idx, doc_dim, stats, cfg)
    tf_idx.unpersist()
    doc_len.unpersist()
    return idx


def _term_dict(source: DataFrame, n_docs: int, cfg: EngineConfig,
               n_part: int | None = None) -> DataFrame:
    """pass 1 — document frequency per term (sparse_index.py:621-632),
    then dictionary-code terms: deterministic term_id = rank of term asc.
    AQE broadcasts the dictionary join downstream while the vocab is
    small; at web scale it becomes a shuffled hash join on the term key."""
    df_counts = source.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return assign_global_ids(
        df_counts, key="term", id_col="term_id",
        num_partitions=n_part or cfg.index_partitions,
    ).select(
        "term_id", "term", "df",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    ).persist()


def _finish_classic(
    tf_idx: DataFrame, doc_dim: DataFrame, stats: tuple[int, float, int],
    cfg: EngineConfig, n_part: int | None = None,
) -> InvertedIndex:
    """(doc_idx, dl, term, tf) → index. BM25 impact weight per (doc, term):
    idf · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) — SURVEY §4.3.1.

    Excluded terms (P2, the reference's special-token masking analogue,
    sparse_index.py:61-63) are dropped BEFORE the dictionary pass: they
    never get a term_id, a df count, or postings. dl still counts them —
    exclusion masks the sparse vector, not the length normalization,
    mirroring the reference where exclusion zeroes encoder outputs."""
    n_docs, avgdl, _ = stats
    if cfg.exclude_terms:
        tf_idx = tf_idx.filter(~F.col("term").isin(*cfg.exclude_terms))
    term_dict = _term_dict(tf_idx, n_docs, cfg, n_part)
    k1, b = float(cfg.k1), float(cfg.b)
    weighted = tf_idx.join(
        term_dict.select("term", "term_id", "df", "idf"), "term"
    ).select(
        "term_id", "doc_idx",
        (
            F.col("idf") * F.col("tf") * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
        ).cast("float").alias("weight"),
        "df",
    )
    return _assemble(weighted, term_dict, doc_dim, stats, cfg, "bm25", n_part)


def _finish_weighted(
    wt_idx: DataFrame, doc_dim: DataFrame, stats: tuple[int, float, int],
    cfg: EngineConfig,
) -> InvertedIndex:
    """(doc_idx, term, weight) → index, weights carried from an external
    encoder (e.g. the SPLADE-style expander). Excluded terms dropped
    before the dictionary pass (see _finish_classic)."""
    n_docs = stats[0]
    if cfg.exclude_terms:
        wt_idx = wt_idx.filter(~F.col("term").isin(*cfg.exclude_terms))
    term_dict = _term_dict(wt_idx, n_docs, cfg)
    weighted = wt_idx.join(
        term_dict.select("term", "term_id", "df"), "term"
    ).select("term_id", "doc_idx", "weight", "df")
    return _assemble(weighted, term_dict, doc_dim, stats, cfg, "external")


def _assemble(
    weighted: DataFrame, term_dict: DataFrame, doc_dim: DataFrame,
    stats: tuple[int, float, int], cfg: EngineConfig, weighting: str,
    n_part: int | None = None,
) -> InvertedIndex:
    n_docs, avgdl, total_tokens = stats
    # strict > min_weight filter (sparse_index.py:65-68)
    weighted = weighted.filter(F.col("weight") > float(cfg.min_weight))

    # per-doc top-k cap (sparse_index.py:128-158). Skip the window shuffle
    # when the cap provably cannot bind: classic tokenize yields ≤max_tokens
    # distinct terms per doc; the engine's expanders emit ≤TERMS_PER_TOKEN
    # per token (a real neural encoder would use vocab_size as the bound).
    cap_bound = cfg.max_tokens if weighting == "bm25" else (
        TERMS_PER_TOKEN_BOUND * cfg.max_tokens
    )
    if cfg.top_k_terms < cap_bound:
        w = Window.partitionBy("doc_idx").orderBy(F.desc("weight"), F.asc("term_id"))
        weighted = (
            weighted.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cfg.top_k_terms)
            .drop("_rn")
        )

    postings = build_posting_blocks(weighted, n_docs, cfg).persist()
    nnz = postings.agg(F.sum("n_postings")).collect()[0][0]
    meta = {
        "format": "splade_spark.postings.v1",
        "n_docs": n_docs,
        "avgdl": avgdl,
        "total_tokens": total_tokens,
        "nnz": int(nnz or 0),
        "k1": cfg.k1,
        "b": cfg.b,
        "block_size": cfg.block_size,
        "max_tokens": cfg.max_tokens,
        "min_weight": cfg.min_weight,
        "top_k_terms": cfg.top_k_terms,
        "value_dtype": cfg.value_dtype,
        "exclude_terms": list(cfg.exclude_terms),
        "tokenizer": "lower_alnum_v1",
        "weighting": weighting,
        "index_partitions": int(n_part or cfg.index_partitions),
        # sparsify settings frozen into metadata and mirrored at query time,
        # as the reference does (script/index.py:111-121, retrieval.py:133-144)
    }
    return InvertedIndex(postings=postings, term_dict=term_dict,
                         doc_dim=doc_dim, meta=meta)


def build_posting_blocks(
    weighted: DataFrame, n_docs: int, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """(term_id, doc_idx, weight, df) → compressed block rows.

    The shuffle key is (term_id, block_id): block_id is a doc-range split
    sized from df, so head terms scatter across ceil(df/block_size)
    reducers — this IS the salted repartition-by-term + skew split.
    """
    bs = int(cfg.block_size)
    vdt = str(cfg.value_dtype)
    # n_blocks = ceil(df / block_size); range_per_block = ceil(n_docs / n_blocks)
    blocks = weighted.withColumn(
        "_nb", F.ceil(F.col("df") / F.lit(bs)).cast("long")
    ).withColumn(
        "_rpb", F.ceil(F.lit(int(n_docs)) / F.col("_nb")).cast("long")
    ).withColumn(
        "block_id", (F.col("doc_idx") / F.col("_rpb")).cast("int")
    )

    grouped = blocks.groupBy("term_id", "block_id").agg(
        F.sort_array(F.collect_list(F.struct("doc_idx", "weight"))).alias("plist"),
        F.count(F.lit(1)).cast("int").alias("n_postings"),
        F.min("doc_idx").alias("min_doc"),
        F.max("doc_idx").alias("max_doc"),
        F.max("weight").alias("max_weight"),
    )

    @F.pandas_udf("doc_gaps binary, weights binary")
    def encode_udf(docs: pd.Series, ws: pd.Series) -> pd.DataFrame:
        gaps_out, w_out = [], []
        for d, w in zip(docs, ws):
            g, wb = encode_block(
                np.asarray(d, dtype=np.int64), np.asarray(w, dtype=np.float32),
                value_dtype=vdt,
            )
            gaps_out.append(g)
            w_out.append(wb)
        return pd.DataFrame({"doc_gaps": gaps_out, "weights": w_out})

    enc = grouped.select(
        "term_id", "block_id", "n_postings", "min_doc", "max_doc", "max_weight",
        encode_udf(
            F.col("plist").getField("doc_idx"), F.col("plist").getField("weight")
        ).alias("_enc"),
    )
    return enc.select(
        "term_id", "block_id", "n_postings", "min_doc", "max_doc", "max_weight",
        F.col("_enc.doc_gaps").alias("doc_gaps"),
        F.col("_enc.weights").alias("weights"),
    )
