"""Doc-range index sharding + fan-out/merge serving tier.

This makes the serving story real at 10^12 docs: ONE process cannot hold
the whole index, so the index is split into S doc-range shards; every
serving node holds one shard resident (the reference's own serving shape —
it memory-maps term_ptr/postings and scores in-process,
/root/reference/src/indexing/sparse_index.py:502-536,661-755); a broker
fans a query out to all shards and merges per-shard top-k. The merge is
EXACT, not approximate: postings are split by doc_idx range, so the full
score of any doc lives entirely in its shard, and the global top-k is a
subset of the union of per-shard top-ks.

Spark-first design notes (100 TB):
- ``shard_postings`` is a NARROW job — no shuffle. Blocks are already
  doc-range structured (block_id is a doc-range split, indexing.py), so a
  block either falls entirely inside one shard (pass-through: metadata
  compare only, no decode) or crosses a boundary and is decoded, split at
  the boundary, and re-encoded — only boundary blocks pay the codec, and
  there are at most (n_shards − 1) boundaries per term.
- ``save_sharded`` writes ``partitionBy("shard_id")`` so a serving node
  reads ONLY its shard's files (partition pruning on load); doc_dim is
  partitioned the same way.
- the tie rule is preserved end-to-end: (score f32 desc, doc_idx asc),
  identical to the WAND kernel and the exhaustive plan (SURVEY.md §4.3.2).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codec import decode_block, encode_block
from .indexing import POSTINGS_SCHEMA, InvertedIndex

_SHARDED_SCHEMA = "shard_id INT, " + POSTINGS_SCHEMA


def _dps(n_docs: int, n_shards: int) -> int:
    """Docs per shard — THE boundary rule (shard of doc = doc_idx // dps).
    Single definition so split, save, and serve can never diverge."""
    return max(1, math.ceil(n_docs / n_shards))


def shard_postings(index: InvertedIndex, n_shards: int) -> DataFrame:
    """Postings → postings + ``shard_id``, split at doc-range boundaries.

    Shard s owns doc_idx in [s·dps, (s+1)·dps) with
    dps = ceil(n_docs / n_shards). Blocks fully inside a shard pass
    through untouched (no decode — min_doc/max_doc metadata is enough);
    boundary-crossing blocks are decoded once, split with searchsorted,
    and re-encoded per side with fresh (n_postings, min_doc, max_doc,
    max_weight) block metadata."""
    return shard_blocks(index.postings, int(index.meta["n_docs"]), n_shards)


def shard_blocks(postings: DataFrame, n_docs: int, n_shards: int) -> DataFrame:
    """The doc-range splitter on any POSTINGS_SCHEMA DataFrame. Narrow —
    no shuffle; the query engine applies it to an already term-pruned
    block set to give the partial WAND phase doc-disjoint tasks
    (query.py:_wand_scores_sharded)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    dps = _dps(n_docs, n_shards)
    postings = postings.select(*_COLS[1:])  # POSTINGS_SCHEMA order

    def split_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lo_shard = pdf["min_doc"].to_numpy() // dps
            hi_shard = pdf["max_doc"].to_numpy() // dps
            inside = lo_shard == hi_shard
            if inside.any():
                out = pdf.loc[inside].copy()
                out.insert(0, "shard_id", lo_shard[inside].astype(np.int32))
                yield out
            cross = pdf.loc[~inside]
            if len(cross) == 0:
                continue
            rows: dict[str, list] = {c: [] for c in _COLS}
            for r in cross.itertuples(index=False):
                d, w = decode_block(r.doc_gaps, r.weights)
                s_lo = int(d[0] // dps)
                s_hi = int(d[-1] // dps)
                # cut points at each shard boundary inside [d[0], d[-1]]
                bounds = np.arange(s_lo + 1, s_hi + 1, dtype=np.int64) * dps
                cuts = np.searchsorted(d, bounds, side="left")
                starts = np.concatenate(([0], cuts))
                ends = np.concatenate((cuts, [d.size]))
                for s, a, b in zip(range(s_lo, s_hi + 1), starts, ends):
                    if a >= b:
                        continue
                    dd, ww = d[a:b], w[a:b]
                    g, wb = encode_block(dd, ww)
                    rows["shard_id"].append(s)
                    rows["term_id"].append(r.term_id)
                    rows["block_id"].append(r.block_id)
                    rows["n_postings"].append(int(dd.size))
                    rows["min_doc"].append(int(dd[0]))
                    rows["max_doc"].append(int(dd[-1]))
                    rows["max_weight"].append(float(ww.max()))
                    rows["doc_gaps"].append(g)
                    rows["weights"].append(wb)
            if rows["shard_id"]:
                yield pd.DataFrame(rows)[_COLS]

    return postings.mapInPandas(split_batches, schema=_SHARDED_SCHEMA)


_COLS = [
    "shard_id", "term_id", "block_id", "n_postings", "min_doc", "max_doc",
    "max_weight", "doc_gaps", "weights",
]


def save_sharded(index: InvertedIndex, out_dir: str, n_shards: int) -> None:
    """S8 sink, sharded layout: postings and doc_dim written
    ``partitionBy("shard_id")`` so each serving node's load prunes to its
    own shard's files; term_dict and metadata are shared (the term
    dictionary is global — doc sharding does not split the vocab)."""
    import json

    n_docs = int(index.meta["n_docs"])
    dps = _dps(n_docs, n_shards)
    (shard_postings(index, n_shards)
     .repartition("shard_id")
     .sortWithinPartitions("term_id", F.desc("max_weight"))
     .write.mode("overwrite").partitionBy("shard_id")
     .parquet(os.path.join(out_dir, "postings")))
    (index.doc_dim
     .withColumn("shard_id", F.expr(f"CAST(doc_idx DIV {dps} AS INT)"))
     .write.mode("overwrite").partitionBy("shard_id")
     .parquet(os.path.join(out_dir, "doc_dim")))
    index.term_dict.write.mode("overwrite").parquet(
        os.path.join(out_dir, "term_dict"))
    meta = dict(index.meta)
    meta["n_shards"] = int(n_shards)
    meta["docs_per_shard"] = int(dps)
    with open(os.path.join(out_dir, "index_meta.json"), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)


def load_shard(spark: SparkSession, out_dir: str, shard_id: int) -> InvertedIndex:
    """S9 scan for ONE serving node: reads only this shard's postings and
    doc_dim files (partition pruning on the shard_id directory), plus the
    shared term dictionary. Returns a normal InvertedIndex handle — every
    query path (exhaustive / wand / LocalIndexServer) works unchanged on
    a shard."""
    import json

    with open(os.path.join(out_dir, "index_meta.json")) as f:
        meta = json.load(f)
    meta = dict(meta)
    meta["shard_id"] = int(shard_id)
    return InvertedIndex(
        postings=(spark.read.parquet(os.path.join(out_dir, "postings"))
                  .filter(F.col("shard_id") == shard_id).drop("shard_id")),
        term_dict=spark.read.parquet(os.path.join(out_dir, "term_dict")),
        doc_dim=(spark.read.parquet(os.path.join(out_dir, "doc_dim"))
                 .filter(F.col("shard_id") == shard_id).drop("shard_id")),
        meta=meta,
    )


def load_sharded_all(spark: SparkSession, out_dir: str) -> InvertedIndex:
    """Distributed BATCH retrieval over a ``save_sharded`` layout: all
    shards as one handle.

    The serving tier (`ShardedServer.from_saved`) answers interactive
    queries with one resident process per shard; this is the other
    consumption shape — the cluster-wide batch scoring job (the reference
    analogue: the index stage reading the saved layout,
    /root/reference/src/indexing/sparse_index.py:502-536). Postings are
    the union of every shard partition with ``shard_id`` dropped: a
    boundary-split block row is a self-contained block (own n_postings /
    min_doc / max_doc / max_weight and re-encoded payload), and both the
    WAND kernel and the exhaustive plan are agnostic to how postings are
    cut into blocks — so `retrieve()` on this handle is rank-identical to
    the unsharded index and to the broker. The scan stays
    partition-parallel across the shard directories, and the query-term
    ``isin`` pushdown still prunes row groups inside each shard (the
    layout is term_id-sorted within partitions)."""
    import json

    with open(os.path.join(out_dir, "index_meta.json")) as f:
        meta = json.load(f)
    return InvertedIndex(
        postings=spark.read.parquet(
            os.path.join(out_dir, "postings")).drop("shard_id"),
        term_dict=spark.read.parquet(os.path.join(out_dir, "term_dict")),
        doc_dim=spark.read.parquet(
            os.path.join(out_dir, "doc_dim")).drop("shard_id"),
        meta=dict(meta),
    )


class ShardedServer:
    """Broker over S per-shard :class:`LocalIndexServer` handles: fan a
    query out to every shard, merge per-shard top-k by the global tie
    rule (score f32 desc, doc_idx asc). Results are EXACTLY the
    single-server / exhaustive-plan ranking — each doc's postings live
    entirely in one shard, so per-shard scores are complete and the
    global top-k ⊆ union of per-shard top-ks.

    In this sandbox all S servers live in one process; on a real cluster
    each is a separate node holding ~1/S of the index and the broker is a
    thin RPC fan-out — the merge below is the broker's exact logic."""

    def __init__(self, index: InvertedIndex, n_shards: int):
        """Split an IN-MEMORY index into S resident shard servers.

        This constructor funnels the whole sharded postings table through
        the driver (one Arrow toPandas) — fine for demo/test indexes that
        fit one process. For big indexes use ``save_sharded`` +
        ``from_saved`` instead: each shard loads only its own partition
        directory, which is the real fleet's boot path."""
        from .query import LocalIndexServer, load_term_info

        self.n_shards = int(n_shards)
        sharded = shard_postings(index, n_shards).toPandas()
        dps = _dps(int(index.meta["n_docs"]), n_shards)
        dd = index.doc_dim.select("doc_idx", "doc_id").toPandas()
        dd["shard_id"] = (dd["doc_idx"].astype(int) // dps).astype(int)
        # the term dictionary is global; load ONCE, share across shards
        term_info = load_term_info(index.term_dict)
        self.servers: list[LocalIndexServer] = []
        for s in range(self.n_shards):
            srv = LocalIndexServer.__new__(LocalIndexServer)
            srv._init_from_parts(
                index.meta,
                term_info,
                sharded[sharded["shard_id"] == s],
                dd[dd["shard_id"] == s],
            )
            self.servers.append(srv)

    @classmethod
    def from_saved(cls, spark: SparkSession, out_dir: str) -> "ShardedServer":
        """Boot the broker from a ``save_sharded`` layout: one
        LocalIndexServer per shard directory, each load pruned to its own
        shard's files (load_shard), term dictionary loaded once and
        shared. This is the broker a serving fleet runs — except there
        each per-shard server lives on its own node."""
        import json

        from .query import LocalIndexServer, load_term_info

        with open(os.path.join(out_dir, "index_meta.json")) as f:
            meta = json.load(f)
        n_shards = int(meta["n_shards"])
        term_info = load_term_info(
            spark.read.parquet(os.path.join(out_dir, "term_dict"))
        )
        self = cls.__new__(cls)
        self.n_shards = n_shards
        self.servers = []
        for s in range(n_shards):
            shard = load_shard(spark, out_dir, s)
            srv = LocalIndexServer.__new__(LocalIndexServer)
            srv._init_from_parts(
                shard.meta,
                term_info,
                shard.postings.select(
                    "term_id", "max_weight", "min_doc", "max_doc",
                    "doc_gaps", "weights",
                ).toPandas(),
                shard.doc_dim.select("doc_idx", "doc_id").toPandas(),
            )
            self.servers.append(srv)
        return self

    def search(
        self, text: str, k: int = 10, route: bool = True
    ) -> list[tuple[str, float]]:
        from ..functions.tokenize import tokenize_py

        s0 = self.servers[0]
        qtf: dict[int, float] = {}
        for t in tokenize_py(text, s0.max_tokens):
            tid = s0.term_info.get(t)
            if tid is not None and t not in s0.exclude:
                qtf[tid] = qtf.get(tid, 0.0) + 1.0
        return self.search_ids(qtf, k, route=route)

    def search_weighted(
        self, term_weights: dict[str, float], k: int = 10
    ) -> list[tuple[str, float]]:
        s0 = self.servers[0]
        pairs = {
            s0.term_info[t]: float(w)
            for t, w in term_weights.items()
            if t in s0.term_info and t not in s0.exclude
        }
        return self.search_ids(pairs, k)

    def search_ids(
        self, qtf_by_tid: dict[int, float], k: int = 10, route: bool = True
    ) -> list[tuple[str, float]]:
        """Fan-out with RANK-SAFE shard routing (``route=True``).

        Every shard knows its per-term impact ceiling (max block
        max_weight — LocalIndexServer.term_max), so the broker bounds any
        shard's best possible score by ub_s = Σ_t qw_t · max_w(t, s)
        before touching it:

        - a shard where NO query term has postings (ub_s = 0) cannot
          contribute a candidate — skipped outright;
        - remaining shards are visited in DESCENDING ub order; once k
          results are merged with kth score θ, a shard with
          f32(ub_s) < θ is skipped. ub_s mirrors the in-kernel
          ``_wand_topk`` arithmetic exactly: each term contributes the
          FLOAT32 product f32(qw)·f32(max_w) (the same product a doc
          whose weight equals the ceiling would contribute), accumulated
          in float64, and the BOUND is downcast to float32 before the
          strict compare — because shard scores are themselves f32
          downcasts. The safety chain: per-term f32 products dominate
          the doc's products term-by-term, f64 summation is monotone,
          and f32 rounding is monotone, so every doc score there
          satisfies f32(Σ) ≤ f32(ub_s) < θ. Comparing the RAW f64 ub_s
          instead would be wrong at the tie boundary: a ceiling doc's
          score f32(ub_s) can round UP above ub_s, so ub_s < θ =
          f32(ub_s) would skip a shard whose doc ties θ and wins the
          doc_idx tie-break (``<`` is strict: a θ-tying shard stays
          visitable for exactly that reason).

        Results are therefore IDENTICAL to the unrouted fan-out; only
        the number of shards touched changes (``last_shards_visited``).
        On a serving fleet this is the difference between every query
        hitting all S nodes and selective queries hitting the few whose
        doc ranges actually hold their terms — broker-side block-max
        pruning, one level above each node's own WAND.
        """
        candidates = list(enumerate(self.servers))
        self.last_shards_visited = 0
        if route:
            s0 = self.servers[0]
            items = [
                (tid, w) for tid, w in qtf_by_tid.items()
                if w > s0.min_weight
            ]
            if len(items) > s0.top_k_terms:
                items.sort(key=lambda p: (-p[1], p[0]))
                items = items[: s0.top_k_terms]
            ubs = []
            for si, srv in enumerate(self.servers):
                ub = 0.0  # f64 sum of f32 products — _wand_topk parity
                for tid, qw in items:
                    mw = srv.term_max.get(tid)
                    if mw is not None:
                        ub += float(np.float32(qw) * np.float32(mw))
                if ub > 0.0:
                    ubs.append((ub, si))
            ubs.sort(key=lambda p: (-p[0], p[1]))
            candidates = [(si, self.servers[si]) for _, si in ubs]
            bounds = [np.float32(ub) for ub, _ in ubs]
        docs_parts, score_parts, id_parts = [], [], []
        merged_docs = np.empty(0, dtype=np.int64)
        merged_scores = np.empty(0, dtype=np.float32)
        theta = None
        for pos, (si, srv) in enumerate(candidates):
            if route and theta is not None and bounds[pos] < theta:
                break
            d, s = srv.topk_arrays(qtf_by_tid, k)
            self.last_shards_visited += 1
            if not d.size:
                continue
            docs_parts.append(d)
            score_parts.append(s)
            id_parts.extend(srv.doc_ids[int(i) - srv.doc_base] for i in d)
            if route:
                merged_docs = np.concatenate((merged_docs, d))
                merged_scores = np.concatenate((merged_scores, s))
                if merged_docs.size >= k:
                    sel = np.lexsort(
                        (merged_docs, -merged_scores.astype(np.float64))
                    )[:k]
                    merged_docs = merged_docs[sel]
                    merged_scores = merged_scores[sel]
                    theta = merged_scores[-1]
        if not docs_parts:
            return []
        docs = np.concatenate(docs_parts)
        scores = np.concatenate(score_parts)
        sel = np.lexsort((docs, -scores.astype(np.float64)))[:k]
        ids = np.asarray(id_parts, dtype=object)
        return [(ids[i], float(scores[i])) for i in sel]
