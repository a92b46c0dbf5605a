"""Query-time engine: bag-of-words encode → postings join → top-k.

Reference semantics reproduced:
- bag-of-words query encoding (doc_only mode)
  (/root/reference/src/model/retriever/sparse/neural/splade.py:243-265)
- score accumulation `scores[doc] += q_w * d_w`
  (/root/reference/src/indexing/sparse_index.py:661-686) — here the J1
  broadcast join + A1 hash aggregate
- per-query top-k with the deterministic tie rule (score desc, doc_idx asc)
  (/root/reference/src/indexing/sparse_index.py:735-748, SURVEY.md §4.3.2)
- OOV query terms contribute nothing (empty-postings path,
  /root/reference/src/indexing/sparse_index.py:705-714) — inner join drops them

Two physical strategies over the same compressed index:
- ``score_exhaustive``: decode every candidate block (mapInPandas,
  vectorized) → JVM hash aggregate → window top-k. The correctness
  baseline; also the fastest plan for small query batches.
- ``score_wand``: block-max pruned scoring (engine addition, north rule).
  Per query, blocks are processed in descending upper-bound order
  (ub = qtf · block max_weight); once the suffix upper-bound sum falls
  below the running kth score θ, unseen docs are provably out, and the
  remaining blocks are applied only to surviving candidates — blocks whose
  [min_doc, max_doc] range misses all candidates are skipped without
  decoding. Exactness is asserted by tests (WAND ≡ exhaustive ≡ oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import DEFAULT, EngineConfig
from ..functions.codec import decode_block
from ..functions.tokenize import tokens_col
from .indexing import InvertedIndex


def encode_queries(
    queries: DataFrame, term_dict: DataFrame, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """(query_id, text) → (query_id, term_id, qtf float). Bag-of-words with
    the index's own tokenizer; OOV terms dropped by the inner dictionary
    join (the query side is tiny → broadcast)."""
    qt = (
        queries.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.explode(tokens_col("text", cfg.max_tokens)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("float").alias("qtf"))
    )
    return term_dict.select("term", "term_id").join(F.broadcast(qt), "term").select(
        "query_id", "term_id", "qtf"
    )


# above this many distinct query term_ids, skip the isin literal pushdown
# (codegen on huge IN lists costs more than it saves) and rely on the
# broadcast join alone
_ISIN_PUSHDOWN_CAP = 2048


def _candidate_blocks(index: InvertedIndex, q_terms: DataFrame) -> DataFrame:
    """Postings blocks of the query terms.

    The query side is tiny by contract (a query set, not a corpus), so it
    is collected once and re-emitted as a literal local relation: the
    broadcast then costs no extra job, and the distinct term_ids become an
    ``isin`` predicate PUSHED INTO the postings scan — on the term_id-sorted
    parquet layout this prunes row groups before any decode. At 10^12 docs
    this is the difference between scanning the full postings table and
    touching only the query terms' blocks."""
    spark = index.postings.sparkSession
    rows = q_terms.collect()
    if not rows:
        return spark.createDataFrame([], schema=q_terms.schema).join(
            index.postings, "term_id"
        )
    q_local = spark.createDataFrame(rows, schema=q_terms.schema)
    terms = sorted({r["term_id"] for r in rows})
    base = index.postings
    if len(terms) <= _ISIN_PUSHDOWN_CAP:
        base = base.filter(F.col("term_id").isin(terms))
    return base.join(F.broadcast(q_local), "term_id")


def score_exhaustive(
    index: InvertedIndex, q_terms: DataFrame, k: int = 10
) -> DataFrame:
    """Returns (query_id, rank, doc_id, score float)."""
    cand = _candidate_blocks(index, q_terms).select(
        "query_id", "qtf", "doc_gaps", "weights"
    )

    def decode_partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qids, docs, partials = [], [], []
            for qid, qtf, gaps, wts in zip(
                pdf["query_id"], pdf["qtf"], pdf["doc_gaps"], pdf["weights"]
            ):
                d, w = decode_block(gaps, wts)
                if d.size == 0:
                    continue
                qids.append(np.repeat(qid, d.size))
                docs.append(d)
                partials.append(np.float32(qtf) * w)
            if not docs:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qids),
                    "doc_idx": np.concatenate(docs),
                    "partial": np.concatenate(partials),
                }
            )

    partials = cand.mapInPandas(
        decode_partial, schema="query_id string, doc_idx bigint, partial float"
    )
    scores = partials.groupBy("query_id", "doc_idx").agg(
        F.sum("partial").cast("float").alias("score")
    )
    return _topk(scores, index, k)


def score_wand(index: InvertedIndex, q_terms: DataFrame, k: int = 10) -> DataFrame:
    """Block-max pruned scoring; identical results to score_exhaustive."""
    cand = _candidate_blocks(index, q_terms).select(
        "query_id", "qtf", "min_doc", "max_doc", "max_weight",
        "n_postings", "doc_gaps", "weights",
    )

    def wand_one_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        ub = (pdf["qtf"].to_numpy(np.float32) * pdf["max_weight"].to_numpy(np.float32))
        order = np.argsort(-ub, kind="stable")
        ub = ub[order]
        pdf = pdf.iloc[order]
        # suffix[i] = sum of ub[i:] — bound on any doc's remaining gain
        suffix = np.concatenate((np.cumsum(ub[::-1].astype(np.float64))[::-1], [0.0]))

        doc_chunks: list[np.ndarray] = []
        score_chunks: list[np.ndarray] = []
        gaps_arr = pdf["doc_gaps"].to_numpy()
        wts_arr = pdf["weights"].to_numpy()
        qtf_arr = pdf["qtf"].to_numpy(np.float32)
        min_doc = pdf["min_doc"].to_numpy(np.int64)
        max_doc = pdf["max_doc"].to_numpy(np.int64)
        n_blocks = len(pdf)
        theta = -np.inf
        stop_at = n_blocks
        for i in range(n_blocks):
            # refresh θ = kth best exact-so-far; any unseen doc is bounded
            # by suffix[i] → once suffix[i] < θ the candidate set is closed
            # (strict: an unseen doc tying θ could still win the doc_idx
            # tie-break, so it must stay reachable)
            if doc_chunks and suffix[i] < theta:
                stop_at = i
                break
            d, w = decode_block(gaps_arr[i], wts_arr[i])
            doc_chunks.append(d)
            # f32 product (reference weight math), accumulated in f64:
            # sums of ≤2^29 float32 values are EXACT in float64, so the
            # result is independent of block processing order — the same
            # value the exhaustive path's double-sum aggregate produces
            score_chunks.append((qtf_arr[i] * w).astype(np.float64))
            alld = np.concatenate(doc_chunks)
            alls = np.concatenate(score_chunks)
            uniq, inv = np.unique(alld, return_inverse=True)
            acc = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(acc, inv, alls)
            if acc.size >= k:
                theta = np.partition(acc, acc.size - k)[acc.size - k]
            elif acc.size:
                theta = -np.inf

        if not doc_chunks:
            return pd.DataFrame({"query_id": [], "doc_idx": [], "score": []}).astype(
                {"query_id": str, "doc_idx": np.int64, "score": np.float32}
            )
        alld = np.concatenate(doc_chunks)
        alls = np.concatenate(score_chunks)
        cand_docs, inv = np.unique(alld, return_inverse=True)
        acc = np.zeros(cand_docs.size, dtype=np.float64)
        np.add.at(acc, inv, alls)
        # phase 2: apply skipped blocks only to surviving candidates; skip
        # blocks whose doc range misses every candidate (no decode)
        for i in range(stop_at, n_blocks):
            lo = np.searchsorted(cand_docs, min_doc[i], side="left")
            hi = np.searchsorted(cand_docs, max_doc[i], side="right")
            if lo >= hi:
                continue
            d, w = decode_block(gaps_arr[i], wts_arr[i])
            pos = np.searchsorted(cand_docs, d)
            ok = (pos < cand_docs.size) & (cand_docs[np.minimum(pos, cand_docs.size - 1)] == d)
            np.add.at(acc, pos[ok], (qtf_arr[i] * w[ok]).astype(np.float64))
        # final scores are float32 (reference dtype); ties broken on the
        # ROUNDED value so rank order matches the exhaustive plan exactly
        scores32 = acc.astype(np.float32)
        sel = np.lexsort((cand_docs, -scores32.astype(np.float64)))[:k]
        return pd.DataFrame(
            {"query_id": qid, "doc_idx": cand_docs[sel], "score": scores32[sel]}
        )

    schema = "query_id string, doc_idx bigint, score float"
    scores = cand.groupBy("query_id").applyInPandas(
        lambda pdf: wand_one_query(pdf), schema=schema
    )
    return _topk(scores, index, k)


def _topk(scores: DataFrame, index: InvertedIndex, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_idx"))
    ranked = (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return (
        ranked.join(index.doc_dim.select("doc_idx", "doc_id"), "doc_idx")
        .select("query_id", "rank", "doc_id", "score")
    )


def encode_queries_weighted(
    query_weights: DataFrame, term_dict: DataFrame
) -> DataFrame:
    """Pre-expanded query vectors (query_id, term, weight) — e.g. the
    SPLADE-style expander applied to query text — mapped into term-id
    space. The weight takes the place of qtf in the identical downstream
    accumulation (the reference scores q_w·d_w the same way for neural and
    bag-of-words queries, sparse_index.py:661-686)."""
    qt = query_weights.select(
        F.col("query_id").cast("string").alias("query_id"),
        "term",
        F.col("weight").cast("float").alias("qtf"),
    )
    return term_dict.select("term", "term_id").join(F.broadcast(qt), "term").select(
        "query_id", "term_id", "qtf"
    )


def score_local(index: InvertedIndex, q_terms: DataFrame, k: int = 10) -> DataFrame:
    """Low-latency serving path: pull ONLY the query terms' compressed
    blocks to the driver (the ``isin`` pushdown prunes parquet row groups /
    cached batches before any decode — a handful of MB for a typical
    query) and run the same block-max WAND kernel in-process. One Spark
    job instead of a multi-stage DAG: single-query p50 drops from seconds
    (job-scheduling bound) to tens of ms. Results are rank-identical to
    score_wand/score_exhaustive (same decode, same f64 accumulation, same
    tie rule); the distributed paths remain the throughput route for
    query BATCHES. This is the reference's own serving shape — its query
    loop scores postings in-process against a memory-mapped index
    (/root/reference/src/indexing/sparse_index.py:661-755)."""
    spark = index.postings.sparkSession
    q_rows = q_terms.collect()
    if not q_rows:
        return spark.createDataFrame(
            [], schema="query_id string, rank int, doc_id string, score float"
        )
    terms = sorted({int(r["term_id"]) for r in q_rows})
    blocks = (
        index.postings.filter(F.col("term_id").isin(terms))
        .select("term_id", "max_weight", "min_doc", "max_doc",
                "doc_gaps", "weights")
        .collect()
    )
    by_term: dict[int, list] = {}
    for b in blocks:
        by_term.setdefault(int(b["term_id"]), []).append(b)

    out_rows: list[tuple] = []
    by_query: dict[str, list] = {}
    for r in q_rows:
        by_query.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_query.items():
        # flatten this query's candidate blocks with upper bounds
        ub_list, blk_list, qtf_list = [], [], []
        for r in rows:
            for b in by_term.get(int(r["term_id"]), []):
                ub_list.append(np.float32(r["qtf"]) * np.float32(b["max_weight"]))
                blk_list.append(b)
                qtf_list.append(np.float32(r["qtf"]))
        if not blk_list:
            continue
        order = np.argsort(-np.asarray(ub_list, dtype=np.float32), kind="stable")
        ub = np.asarray(ub_list, dtype=np.float64)[order]
        suffix = np.concatenate((np.cumsum(ub[::-1])[::-1], [0.0]))
        docs_acc: dict[int, float] = {}
        theta = -np.inf
        stop_at = len(order)
        for i, oi in enumerate(order):
            if docs_acc and suffix[i] < theta:
                stop_at = i
                break
            b = blk_list[oi]
            d, w = decode_block(b["doc_gaps"], b["weights"])
            contrib = (qtf_list[oi] * w).astype(np.float64)
            for dj, cj in zip(d.tolist(), contrib.tolist()):
                docs_acc[dj] = docs_acc.get(dj, 0.0) + cj
            if len(docs_acc) >= k:
                theta = np.partition(
                    np.fromiter(docs_acc.values(), dtype=np.float64), len(docs_acc) - k
                )[len(docs_acc) - k]
        cand_docs = np.fromiter(docs_acc.keys(), dtype=np.int64)
        acc = np.fromiter(docs_acc.values(), dtype=np.float64)
        sort_c = np.argsort(cand_docs)
        cand_docs, acc = cand_docs[sort_c], acc[sort_c]
        for i in range(stop_at, len(order)):
            oi = order[i]
            b = blk_list[oi]
            lo = np.searchsorted(cand_docs, int(b["min_doc"]), side="left")
            hi = np.searchsorted(cand_docs, int(b["max_doc"]), side="right")
            if lo >= hi:
                continue
            d, w = decode_block(b["doc_gaps"], b["weights"])
            pos = np.searchsorted(cand_docs, d)
            ok = (pos < cand_docs.size) & (
                cand_docs[np.minimum(pos, cand_docs.size - 1)] == d
            )
            np.add.at(acc, pos[ok], (qtf_list[oi] * w[ok]).astype(np.float64))
        scores32 = acc.astype(np.float32)
        sel = np.lexsort((cand_docs, -scores32.astype(np.float64)))[:k]
        for rank, j in enumerate(sel, start=1):
            out_rows.append((qid, rank, int(cand_docs[j]), float(scores32[j])))

    res = spark.createDataFrame(
        out_rows, schema="query_id string, rank int, doc_idx bigint, score float"
    )
    # decode doc ids: broadcast the tiny result into a scan of the (cached)
    # doc dimension — one job, no shuffle of doc_dim
    return (
        index.doc_dim.select("doc_idx", "doc_id")
        .join(F.broadcast(res), "doc_idx")
        .select("query_id", "rank", "doc_id", "score")
    )


def retrieve(
    index: InvertedIndex,
    queries: DataFrame,
    k: int = 10,
    strategy: str = "exhaustive",
    cfg: EngineConfig = DEFAULT,
    query_weights: DataFrame | None = None,
) -> DataFrame:
    if query_weights is not None:
        q_terms = encode_queries_weighted(query_weights, index.term_dict)
    else:
        q_terms = encode_queries(queries, index.term_dict, cfg)
    if strategy == "wand":
        return score_wand(index, q_terms, k)
    if strategy == "local":
        return score_local(index, q_terms, k)
    return score_exhaustive(index, q_terms, k)
