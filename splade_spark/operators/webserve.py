"""In-process web-query serving: conjunctive BM25 + exact phrase
filtering at millisecond latency.

The distributed plane answers web-style queries (quoted phrases ∧
implicit AND ∧ BM25, positional.retrieve_web) as Spark jobs; this
module is the SERVING mirror, the same shape LocalIndexServer gives the
bag-of-words path (query.py:615-738): everything warm in one process,
zero Spark jobs per query. A fleet node pairs one doc-range index shard
(LocalIndexServer / ShardedServer) with the SAME doc range's positional
slice; the broker merges per-shard top-k exactly as for OR queries —
conjunctive and phrase constraints are per-doc predicates, so shard
merges stay trivially rank-safe.

Scale notes: the positional store is the memory analogue of the saved
layout (positional.save_positional) — load only this shard's doc range,
and optionally only a query-vocabulary subset (`terms=`), which at
serving time is the live query stream's vocabulary, not the corpus's.
Phrase matching intersects shifted position arrays (NumPy
``intersect1d`` over sorted unique ints) starting from the rarest slot,
so cost tracks the phrase's own postings exactly like the distributed
matcher.

Score parity: products f32, accumulation f64, final score f32 — the
engine's A1 contract — and the (score desc, doc_idx asc) tie rule, so
served results are rank-identical to positional.retrieve_web
(pinned by tests/test_webserve.py).
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import replace

import numpy as np

from ..config import DEFAULT
from ..functions.codec import decode_block, varint_decode
from ..functions.tokenize import tokenize_py
from .positional import parse_web_query
from .query import LocalIndexServer


class PositionalStore:
    """Warm positional lists: term → {doc_id: ascending int64 positions}."""

    def __init__(self, by_term: dict[str, dict[str, np.ndarray]]):
        self.by_term = by_term

    @classmethod
    def from_saved(
        cls, pos_dir: str, terms: list[str] | None = None
    ) -> "PositionalStore":
        """Load a saved positional layout (positional.save_positional:
        term-partitioned parquet, delta+varint position bytes) via Arrow.
        ``terms`` prunes to a vocabulary — the serving fleet loads only
        the query stream's terms for its own doc range."""
        import pyarrow.dataset as ds

        dataset = ds.dataset(pos_dir, format="parquet")
        flt = None
        if terms is not None:
            flt = ds.field("term").isin(sorted(set(terms)))
        tbl = dataset.to_table(
            columns=["term", "doc_id", "positions"], filter=flt
        )
        by_term: dict[str, dict[str, np.ndarray]] = {}
        for t, d, p in zip(
            tbl.column("term").to_pylist(),
            tbl.column("doc_id").to_pylist(),
            tbl.column("positions").to_pylist(),
        ):
            by_term.setdefault(t, {})[d] = varint_decode(bytes(p)).astype(
                np.int64
            ).cumsum()
        return cls(by_term)

    @classmethod
    def from_rows(
        cls, rows: "Iterable[tuple[str, str, list[int]]]"
    ) -> "PositionalStore":
        """(term, doc_id, ascending positions) rows — the test/demo path
        (collect a positional_postings DataFrame)."""
        by_term: dict[str, dict[str, np.ndarray]] = {}
        for t, d, ps in rows:
            by_term.setdefault(t, {})[d] = np.asarray(ps, dtype=np.int64)
        return cls(by_term)

    @classmethod
    def from_positional(cls, positional) -> "PositionalStore":
        """Load directly from a positional_postings DataFrame via ONE
        Arrow transfer (``toPandas`` under
        spark.sql.execution.arrow.pyspark.enabled) — the warm-load path
        when no saved layout exists yet. Arrow hands positions over as
        numpy arrays already; Row-object collection measured ~5x slower
        at 10^6 (term, doc) rows."""
        pdf = positional.select("term", "doc_id", "positions").toPandas()
        return cls.from_rows(
            zip(
                pdf["term"].tolist(),
                pdf["doc_id"].tolist(),
                pdf["positions"].tolist(),
            )
        )

    def docs_with_phrase(self, ptoks: list[str]) -> set[str]:
        """doc_ids containing the exact phrase. Intersection walks start
        from the rarest slot's postings; shifted-position intersects are
        linear in the touched lists."""
        maps = [self.by_term.get(t) for t in ptoks]
        if not maps or any(m is None for m in maps):
            return set()
        seed = min(range(len(maps)), key=lambda i: len(maps[i]))
        out: set[str] = set()
        for doc in maps[seed]:
            if any(doc not in m for m in maps):
                continue
            starts = maps[0][doc]
            for off in range(1, len(maps)):
                starts = np.intersect1d(
                    starts, maps[off][doc] - off, assume_unique=True
                )
                if starts.size == 0:
                    break
            if starts.size:
                out.add(doc)
        return out


class WebQueryServer:
    """One serving node: a warm index shard + its positional slice."""

    def __init__(self, srv: LocalIndexServer, store: PositionalStore):
        self.srv = srv
        self.store = store
        if float(srv.min_weight) > 0.0 or srv.top_k_terms < srv.max_tokens:
            raise ValueError(
                "WebQueryServer: conjunctive serving needs a complete "
                "index (min_weight == 0 and a non-binding per-doc term "
                "cap) — pruned postings make the all-terms test "
                "undecidable"
            )

    def search(self, raw: str, k: int = 10) -> list[tuple[str, float]]:
        """'"exact phrase" bare terms' → [(doc_id, score f32)] — docs
        matching every quoted phrase AND containing every token, ranked
        by BM25 over the full token bag, (score desc, doc_idx asc)."""
        srv = self.srv
        docs, scores = self.topk_arrays(raw, k)
        return [
            (srv.doc_ids[int(d) - srv.doc_base], float(s))
            for d, s in zip(docs, scores)
        ]

    def topk_arrays(
        self, raw: str, k: int = 10
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k as (global doc_idx int64, score float32), ranked
        (score desc, doc_idx asc) — the sharded broker's merge currency
        (ShardedWebServer), mirroring LocalIndexServer.topk_arrays."""
        srv = self.srv
        empty = (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.float32),
        )
        qtf: dict[int, float] = {}
        req: set[str] = set()
        for t in tokenize_py(raw, srv.max_tokens):
            if t in srv.exclude:
                continue
            req.add(t)
            tid = srv.term_info.get(t)
            if tid is not None:
                qtf[tid] = qtf.get(tid, 0.0) + 1.0
        if not req or any(t not in srv.term_info for t in req):
            return empty  # OOV token: implicit AND can never hold
        d_parts, s_parts = [], []
        for tid in sorted(qtf):
            blocks = srv.by_term.get(tid, ())
            if not blocks:
                return empty  # term absent from this shard: no AND match
            qw = np.float32(qtf[tid])
            for _, _, _, g, wbytes in blocks:
                d, w = decode_block(g, wbytes)
                d_parts.append(d)
                # A1 contract: f32 products, f64 accumulation
                s_parts.append(
                    (qw * w.astype(np.float32)).astype(np.float64)
                )
        docs = np.concatenate(d_parts)
        prods = np.concatenate(s_parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        sums = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(sums, inv, prods)
        cnt = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(cnt, inv, 1)  # blocks hold disjoint docs within a term
        mask = cnt == len(qtf)
        cand, csum = uniq[mask], sums[mask]
        if cand.size == 0:
            return empty
        # the index's own max_tokens (from saved meta) must govern the
        # phrase parse too — an empty-after-tokenize quoted segment is
        # pruned only under the SAME truncation rule the distributed
        # retrieve_web(cfg=...) path applies, keeping served/distributed
        # rank identity for non-default configs.
        phrases = parse_web_query(
            raw, replace(DEFAULT, max_tokens=srv.max_tokens)
        )
        if phrases:
            allowed: set[str] | None = None
            for ph in phrases:
                hit = self.store.docs_with_phrase(
                    tokenize_py(ph, srv.max_tokens)
                )
                allowed = hit if allowed is None else (allowed & hit)
                if not allowed:
                    return empty
            keep = np.array(
                [
                    srv.doc_ids[int(d) - srv.doc_base] in allowed
                    for d in cand
                ],
                dtype=bool,
            )
            cand, csum = cand[keep], csum[keep]
            if cand.size == 0:
                return empty
        scores = csum.astype(np.float32)
        order = np.lexsort((cand, -scores.astype(np.float64)))[:k]
        return cand[order], scores[order]


class ShardedWebServer:
    """Web-query broker over doc-range shards: each node is a
    WebQueryServer (index shard + its positional slice); the broker
    routes, fans out, and merges per-shard top-k by the engine tie rule
    — results identical to one unsharded server (pytest-pinned).

    Conjunctive routing is STRONGER than the OR broker's
    (sharding.ShardedServer.search_ids): a shard missing ANY required
    term cannot hold an AND candidate and is skipped outright, on top of
    the same Σ qw·max_w(term, shard) upper-bound descent with strict
    θ-cut. Selective multi-term web queries therefore touch only the
    shards whose doc ranges hold ALL their terms."""

    def __init__(self, index, positional_rows, n_shards: int = 4):
        from .sharding import ShardedServer

        self._broker = ShardedServer(index, n_shards=n_shards)
        self._attach_positional(
            (t, d, np.asarray(ps, dtype=np.int64))
            for t, d, ps in positional_rows
        )

    @classmethod
    def from_saved(
        cls,
        spark,
        index_dir: str,
        pos_dir: str,
        terms: list[str] | None = None,
    ) -> "ShardedWebServer":
        """Boot the web broker from a ``save_sharded`` index layout plus
        a ``save_positional`` layout. Demo path loads the positional
        table once (optionally vocabulary-pruned) and splits it by each
        node's doc set; on a fleet each node instead loads only its own
        doc range's positional files next to its index shard."""
        from .sharding import ShardedServer

        self = cls.__new__(cls)
        self._broker = ShardedServer.from_saved(spark, index_dir)
        store = PositionalStore.from_saved(pos_dir, terms=terms)
        self._attach_positional(
            (t, d, ps)
            for t, m in store.by_term.items()
            for d, ps in m.items()
        )
        return self

    def _attach_positional(self, rows) -> None:
        by_doc_shard: dict[str, int] = {}
        for si, srv in enumerate(self._broker.servers):
            for d in srv.doc_ids:
                if d is not None:
                    by_doc_shard[d] = si
        slices: list[dict] = [dict() for _ in self._broker.servers]
        for t, d, ps in rows:
            si = by_doc_shard.get(d)
            if si is not None:
                slices[si].setdefault(t, {})[d] = ps
        self.nodes = [
            WebQueryServer(srv, PositionalStore(slc))
            for srv, slc in zip(self._broker.servers, slices)
        ]
        self.last_shards_visited = 0

    def search(
        self, raw: str, k: int = 10, route: bool = True
    ) -> list[tuple[str, float]]:
        s0 = self.nodes[0].srv
        qtf: dict[int, float] = {}
        req_ok = True
        for t in tokenize_py(raw, s0.max_tokens):
            if t in s0.exclude:
                continue
            tid = s0.term_info.get(t)
            if tid is None:
                req_ok = False
                break
            qtf[tid] = qtf.get(tid, 0.0) + 1.0
        self.last_shards_visited = 0
        if not req_ok or not qtf:
            return []
        candidates = list(enumerate(self.nodes))
        bounds = None
        if route:
            ubs = []
            for si, node in enumerate(self.nodes):
                tm = node.srv.term_max
                if any(tid not in tm for tid in qtf):
                    continue  # a missing term kills every AND candidate
                # f64 sum of f32 products, downcast to f32 — exactly the
                # node's scoring arithmetic, so the strict theta cut is
                # rank-safe at ulp granularity INCLUDING the tie
                # boundary: scores are f32(sum) and f32 rounding is
                # monotone, so score <= f32(ub); comparing the raw f64
                # ub instead could skip a shard whose ceiling doc rounds
                # up to exactly theta (see sharding.search_ids).
                ub = sum(
                    float(np.float32(qw) * np.float32(tm[tid]))
                    for tid, qw in qtf.items()
                )
                ubs.append((ub, si))
            ubs.sort(key=lambda p: (-p[0], p[1]))
            candidates = [(si, self.nodes[si]) for _, si in ubs]
            bounds = [np.float32(ub) for ub, _ in ubs]
        merged_d = np.empty(0, dtype=np.int64)
        merged_s = np.empty(0, dtype=np.float32)
        theta = None
        for pos, (si, node) in enumerate(candidates):
            if route and theta is not None and bounds[pos] < theta:
                break
            d, s = node.topk_arrays(raw, k)
            self.last_shards_visited += 1
            if not d.size:
                continue
            merged_d = np.concatenate((merged_d, d))
            merged_s = np.concatenate((merged_s, s))
            sel = np.lexsort((merged_d, -merged_s.astype(np.float64)))[:k]
            merged_d, merged_s = merged_d[sel], merged_s[sel]
            if merged_d.size >= k:
                theta = merged_s[-1]
        out = []
        for d, s in zip(merged_d, merged_s):
            si = None
            for node in self.nodes:
                base = node.srv.doc_base
                if base <= int(d) < base + len(node.srv.doc_ids):
                    si = node
                    break
            out.append((si.srv.doc_ids[int(d) - si.srv.doc_base], float(s)))
        return out
