"""Incremental index fold: merge a new doc batch into an existing index
WITHOUT re-processing the old corpus.

The reference rebuilds its index from all encoded shards
(/root/reference/script/index.py:104-123); this engine's streaming path
did the same (stream_index.py). At 10^12 docs a rebuild per micro-batch
re-pays the three dominant costs for the WHOLE corpus: tokenization
(CPU), the doc-numbering range sort (corpus-wide shuffle), and the tf
aggregation (corpus-wide shuffle). The fold here pays none of them for
existing docs:

- old ``doc_dim`` rows are reused verbatim (new docs are appended after
  ``n_docs`` — the segment-append numbering every incremental engine
  uses);
- old term frequencies are RECONSTRUCTED from the stored blocks instead
  of re-tokenizing: BM25 impact w = idf·tf·(k1+1)/(tf + K) with
  K = k1·(1−b+b·dl/avgdl) is strictly monotone in tf, so
  tf = w′·K/(k1+1−w′) with w′ = w/idf inverts it exactly; tf is an
  integer, so rounding absorbs the float32 storage error (safe for
  tf ≲ 4000 — the ``max_tokens`` contract caps tf at 256);
- only then do global statistics (n_docs, avgdl, df → idf) update and the
  block build rerun — the irreducible work, because exact BM25 semantics
  bake corpus statistics into every stored weight. (The alternative —
  store raw tf and apply idf query-side — makes folds nearly free but
  changes the reference's impact-ordered static-weight layout; this
  engine keeps reference semantics and makes the fold exact instead.)

Exactness: ``merge_index_with_docs(build(A), B)`` equals
``build(A ∪ B)`` bit-for-bit — same doc_idx assignment (when B's doc_ids
sort after A's in string order, the append case; otherwise scores are
still identical and only the doc_idx tie-break can reorder exact score
ties), same term_id assignment (the dictionary pass reruns over the
merged vocabulary), same weights (same formula, same reconstructed
inputs). Oracle-gated by the ``bm25_topk_merged`` entry against the
full-corpus DuckDB BM25 SQL.

Preconditions (checked): the index must retain its full postings —
reconstruction can only see what the build kept, so a strict
``min_weight`` > 0 or a binding per-doc term cap would make the fold
diverge from a true rebuild. Default BM25 config never drops anything
(all BM25 weights are positive; top_k_terms=4096 > max_tokens=256).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import EngineConfig
from ..functions.codec import decode_block
from .ids import assign_global_ids
from .indexing import (
    InvertedIndex,
    _finish_classic,
    doc_term_frequencies,
)


def cfg_from_meta(meta: dict) -> EngineConfig:
    """EngineConfig frozen from an index's metadata snapshot — the fold
    must use the settings the index was built with, not the caller's."""
    return EngineConfig(
        max_tokens=int(meta["max_tokens"]),
        top_k_terms=int(meta["top_k_terms"]),
        min_weight=float(meta["min_weight"]),
        exclude_terms=tuple(meta.get("exclude_terms", ())),
        k1=float(meta["k1"]),
        b=float(meta["b"]),
        block_size=int(meta["block_size"]),
        value_dtype=str(meta.get("value_dtype", "float32")),
        index_partitions=int(meta["index_partitions"]),
    )


def explode_postings(postings: DataFrame) -> DataFrame:
    """Block rows → (term_id, doc_idx, weight float): one narrow
    Arrow-batched decode pass, no shuffle."""

    def decode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            tids, docs, ws = [], [], []
            for tid, gaps, wts in zip(
                pdf["term_id"], pdf["doc_gaps"], pdf["weights"]
            ):
                d, w = decode_block(gaps, wts)
                if d.size == 0:
                    continue
                tids.append(np.repeat(np.int64(tid), d.size))
                docs.append(d)
                ws.append(w)
            if not docs:
                continue
            yield pd.DataFrame(
                {
                    "term_id": np.concatenate(tids),
                    "doc_idx": np.concatenate(docs),
                    "weight": np.concatenate(ws),
                }
            )

    return postings.select("term_id", "doc_gaps", "weights").mapInPandas(
        decode, schema="term_id bigint, doc_idx bigint, weight float"
    )


def reconstruct_tf(index: InvertedIndex) -> DataFrame:
    """Invert the stored BM25 impacts back to (doc_idx, dl, term, tf int).

    Decode blocks (narrow) → join term_dict for (term, idf) → join
    doc_dim for dl → algebraic inversion. Two nnz-row equi-joins replace
    re-tokenizing the whole corpus; both join keys (term_id, doc_idx) are
    integers, and AQE broadcasts the dimensions while they fit.
    """
    meta = index.meta
    if meta.get("weighting") != "bm25":
        raise ValueError(
            "reconstruct_tf: only BM25-weighted indexes are invertible "
            f"(weighting={meta.get('weighting')!r}); external encoder "
            "weights carry no tf to recover"
        )
    k1, b = float(meta["k1"]), float(meta["b"])
    avgdl = float(meta["avgdl"])
    flat = explode_postings(index.postings)
    flat = flat.join(index.term_dict.select("term_id", "term", "idf"), "term_id")
    flat = flat.join(index.doc_dim.select("doc_idx", "dl"), "doc_idx")
    w_prime = F.col("weight").cast("double") / F.col("idf")
    cap_k = k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    tf = F.round(w_prime * cap_k / (F.lit(k1 + 1.0) - w_prime)).cast("int")
    return flat.select("doc_idx", "dl", "term", tf.alias("tf"))


def _check_invertible(meta: dict) -> None:
    if meta.get("weighting") != "bm25":
        raise ValueError(
            "merge: only BM25-weighted indexes fold exactly "
            f"(weighting={meta.get('weighting')!r})"
        )
    if float(meta["min_weight"]) > 0.0:
        raise ValueError(
            "merge: index was built with min_weight "
            f"{meta['min_weight']} > 0 — dropped postings cannot be "
            "reconstructed, a fold would diverge from a rebuild"
        )
    if int(meta["top_k_terms"]) < int(meta["max_tokens"]):
        raise ValueError(
            "merge: per-doc term cap bound at build time "
            f"(top_k_terms={meta['top_k_terms']} < max_tokens="
            f"{meta['max_tokens']}) — capped-away postings cannot be "
            "reconstructed"
        )
    if meta.get("value_dtype", "float32") != "float32":
        raise ValueError(
            "merge: index stores "
            f"{meta['value_dtype']} weights — the exact tf inversion "
            "needs float32 precision (fp16 rounding exceeds the integer-"
            "rounding margin); rebuild instead of folding"
        )


def merge_index_with_tf(
    index: InvertedIndex,
    tf: DataFrame,
    doc_len: DataFrame,
) -> InvertedIndex:
    """Fold a tokenized micro-batch — ``tf`` (doc_id string, term, tf int)
    and ``doc_len`` (doc_id string, dl int) — into ``index``, returning
    the merged index. Equals a full rebuild over old ∪ batch (see module
    docstring for the exactness contract and its preconditions)."""
    meta = index.meta
    _check_invertible(meta)
    cfg = cfg_from_meta(meta)
    spark = tf.sparkSession

    n_old = int(meta["n_docs"])
    tt_old = int(meta["total_tokens"])

    doc_len = doc_len.persist()
    brow = doc_len.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("tt")
    ).collect()[0]
    n_new, tt_new = int(brow["n"]), int(brow["tt"] or 0)
    if n_new == 0:
        raise ValueError("merge: batch is empty — nothing to fold")
    dup = (
        doc_len.join(index.doc_dim.select("doc_id"), "doc_id", "left_semi")
        .limit(1).count()
    )
    if dup:
        raise ValueError(
            "merge: batch contains doc_ids already present in the index — "
            "this fold appends documents, it does not upsert"
        )

    stats = (n_old + n_new, (tt_old + tt_new) / (n_old + n_new),
             tt_old + tt_new)
    n_part = max(4, min(
        int(cfg.index_partitions),
        -(-stats[0] // max(1, int(cfg.docs_per_partition))),
    ))

    # segment-append numbering: batch ids ranked among themselves, offset
    # past the existing corpus — old doc_idx (and old doc_dim rows) are
    # reused untouched
    new_dim = (
        assign_global_ids(
            doc_len, key="doc_id", id_col="_bidx", num_partitions=n_part
        )
        .withColumn("doc_idx", (F.col("_bidx") + F.lit(n_old)).cast("long"))
        .select("doc_idx", "doc_id", "dl")
    )
    doc_dim = index.doc_dim.select("doc_idx", "doc_id", "dl").unionByName(
        new_dim
    ).persist()

    new_tf = tf.join(new_dim, "doc_id").select("doc_idx", "dl", "term", "tf")
    tf_all = reconstruct_tf(index).unionByName(new_tf).persist()

    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    try:
        merged = _finish_classic(tf_all, doc_dim, stats, cfg, n_part)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
    tf_all.unpersist()
    doc_len.unpersist()
    return merged


def apply_tombstones(
    index: InvertedIndex,
    drop_ids: DataFrame,
    id_col: str = "doc_id",
) -> InvertedIndex:
    """Remove documents from a built index WITHOUT re-processing the
    surviving corpus — the operation a dedup/curation loop runs most
    (find duplicates with ``dedup_drop_list`` → drop them from the live
    index).

    Exactness: equals ``build_index(kept docs)`` bit-for-bit. Removing
    docs changes n_docs, avgdl and every term's df — so idf shifts for
    EVERY term and the length-normalization K for EVERY posting; exact
    BM25 semantics bake those corpus statistics into each stored impact,
    so no decode-only-touched-blocks shortcut exists for the weights.
    What the tombstone fold skips vs a rebuild is the two costs that
    dominate at corpus scale: re-tokenizing every surviving document
    (CPU) and the corpus-wide doc_id STRING range-sort (shuffle):

    - exact integer tf comes back from the stored impacts
      (``reconstruct_tf`` — narrow block decode + two int-keyed
      equi-joins, no tokenizer);
    - kept docs renumber by ranking their OLD doc_idx (an 8-byte long):
      build numbering is rank of doc_id ascending, and rank order is
      preserved under subset removal, so ranking the kept old indexes
      reproduces the rebuild's doc_idx assignment while the range-sort
      moves longs instead of URL strings;
    - the dictionary / stats / block passes rerun over kept postings
      only — the irreducible work.

    ``drop_ids`` is a one-column DataFrame of doc_ids to REMOVE (e.g.
    ``dedup_drop_list(...).filter(~F.col("keep")).select("doc_id")``).
    Ids not present in the index are ignored; an empty effective drop
    set returns the input index unchanged; dropping every doc raises.
    Same invertibility preconditions as the append fold
    (``_check_invertible``). The rebuilt doc_ids/metadata follow the
    surviving corpus exactly — the reference's index artifact contract
    (/root/reference/src/indexing/sparse_index.py:437-452).
    """
    meta = index.meta
    _check_invertible(meta)
    cfg = cfg_from_meta(meta)
    spark = index.postings.sparkSession

    drop = drop_ids.select(
        F.col(id_col).cast("string").alias("doc_id")
    ).distinct()
    kept = index.doc_dim.join(drop, "doc_id", "left_anti").persist()
    row = kept.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("tt")
    ).collect()[0]
    n_kept, tt_kept = int(row["n"]), int(row["tt"] or 0)
    if n_kept == 0:
        kept.unpersist()
        raise ValueError(
            "apply_tombstones: drop list removes every document"
        )
    if n_kept == int(meta["n_docs"]):
        kept.unpersist()
        return index
    stats = (n_kept, tt_kept / n_kept, tt_kept)
    n_part = max(4, min(
        int(cfg.index_partitions),
        -(-n_kept // max(1, int(cfg.docs_per_partition))),
    ))

    remap = assign_global_ids(
        kept.select(F.col("doc_idx").alias("_old_idx"), "doc_id", "dl"),
        key="_old_idx", id_col="doc_idx", num_partitions=n_part,
    ).persist()
    doc_dim = remap.select("doc_idx", "doc_id", "dl")
    tf_kept = (
        reconstruct_tf(index)
        .withColumnRenamed("doc_idx", "_old_idx")
        .join(remap.select("_old_idx", "doc_idx"), "_old_idx")
        .select("doc_idx", "dl", "term", "tf")
        .persist()
    )
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    try:
        out = _finish_classic(tf_kept, doc_dim, stats, cfg, n_part)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
    tf_kept.unpersist()
    kept.unpersist()
    return out


def merge_index_with_docs(
    index: InvertedIndex,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> InvertedIndex:
    """Fold a raw-text doc batch into ``index``: tokenize ONLY the batch
    (with the index's own frozen settings), then ``merge_index_with_tf``."""
    cfg = cfg_from_meta(index.meta)
    tf, doc_len = doc_term_frequencies(new_docs, id_col, text_col, cfg)
    return merge_index_with_tf(index, tf, doc_len)


def upsert_docs(
    index: InvertedIndex,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> InvertedIndex:
    """Replace-or-insert a doc batch: the mutation API's third verb,
    composed from the two exact primitives — ids already in the index are
    tombstoned out (``apply_tombstones``), then the whole batch folds in
    (``merge_index_with_docs``). A re-crawled page therefore replaces its
    old postings atomically with respect to the returned handle.

    Statistics (n_docs, avgdl, df/idf, every stored impact) equal a full
    rebuild over ``(old \\ batch ids) ∪ batch`` exactly; decoded postings
    as (term, doc_id, weight) sets are identical to that rebuild's
    (doc_idx ASSIGNMENT can differ when batch ids interleave the kept
    ids' sort order — the merge module's documented tie-break caveat).
    Same invertibility preconditions as both primitives."""
    ids = docs.select(F.col(id_col).cast("string").alias("doc_id")).distinct()
    overlapping = index.doc_dim.join(ids, "doc_id", "left_semi").select(
        "doc_id"
    )
    if overlapping.limit(1).count():
        index = apply_tombstones(index, overlapping)
    return merge_index_with_docs(index, docs, id_col=id_col, text_col=text_col)
