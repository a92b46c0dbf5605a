"""NumPy reference oracle — a single-process reimplementation of the
reference's index-build + scoring semantics, used only by pytest.

Mirrors (semantics, not code):
- two-pass index build: DF counts then counting-sort postings fill
  (/root/reference/src/indexing/sparse_index.py:614-658)
- score accumulation `scores[doc] += q_w * d_w` in float32
  (/root/reference/src/indexing/sparse_index.py:661-686)
- per-query top-k, ties broken by ascending doc_idx — the documented
  deterministic tightening of the reference's unstable argsort
  (/root/reference/src/indexing/sparse_index.py:735-748, SURVEY.md §4.3.2)
- bag-of-words query encoding with exclusions
  (/root/reference/src/model/retriever/sparse/neural/splade.py:243-265)

The classic path assigns BM25 impact weights at index time so the
accumulation operator is identical to the reference's dot-product
(SURVEY.md §4.3.1).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .config import DEFAULT, EngineConfig
from .functions.tokenize import tokenize_py


@dataclass
class OracleIndex:
    doc_ids: list[str]              # doc_idx -> external id (sorted order)
    vocab: dict[str, int]           # term -> term_id (sorted terms)
    terms: list[str]
    df: np.ndarray                  # per term_id
    dl: np.ndarray                  # per doc_idx
    avgdl: float
    n_docs: int
    postings: dict[int, tuple[np.ndarray, np.ndarray]]  # term_id -> (doc_idx asc, w f32)
    cfg: EngineConfig


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_weight(tf: int, dl: int, avgdl: float, n_docs: int, df: int,
                k1: float, b: float) -> float:
    idf = bm25_idf(n_docs, df)
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def _doc_cap_py(entries: list[tuple[int, float]], cap: int) -> list[tuple[int, float]]:
    """Per-doc top-k term cap (W2/W4, sparse_index.py:76-158): keep the
    ``cap`` highest-weight (term_id, w32) entries, ties broken by
    ascending term_id — the engine's window tie rule."""
    if len(entries) <= cap:
        return entries
    return sorted(entries, key=lambda p: (-p[1], p[0]))[:cap]


def build_oracle_index(docs: list[tuple[str, str]],
                       cfg: EngineConfig = DEFAULT) -> OracleIndex:
    """docs: list of (doc_id, text). Doc numbering = ascending doc_id order
    (the engine's deterministic global numbering rule, SURVEY.md §4.3.5).
    Mirrors the engine's exclusion (P2: excluded terms never reach the
    vocab/df/postings; dl still counts them) and per-doc top-k cap."""
    docs = sorted(docs, key=lambda x: x[0])
    doc_ids = [d for d, _ in docs]
    tokenized = [tokenize_py(t, cfg.max_tokens) for _, t in docs]
    dl = np.array([len(t) for t in tokenized], dtype=np.int64)
    # dl counts all tokens; avgdl over all docs (empty docs included)
    avgdl = float(dl.mean()) if len(dl) else 0.0
    n_docs = len(docs)

    exclude = set(cfg.exclude_terms)
    terms = sorted(
        {t for toks in tokenized for t in toks if t not in exclude}
    )
    vocab = {t: i for i, t in enumerate(terms)}

    # tf per (doc, term)
    tf_map: list[dict[int, int]] = []
    for toks in tokenized:
        m: dict[int, int] = {}
        for t in toks:
            if t in exclude:
                continue
            tid = vocab[t]
            m[tid] = m.get(tid, 0) + 1
        tf_map.append(m)

    df = np.zeros(len(terms), dtype=np.int64)
    for m in tf_map:
        for tid in m:
            df[tid] += 1

    postings: dict[int, list[tuple[int, float]]] = {i: [] for i in range(len(terms))}
    for didx, m in enumerate(tf_map):
        doc_entries: list[tuple[int, float]] = []
        for tid, tf in m.items():
            w = bm25_weight(tf, int(dl[didx]), avgdl, n_docs, int(df[tid]),
                            cfg.k1, cfg.b)
            w32 = np.float32(w)
            if w32 > cfg.min_weight:  # strict > filter, sparse_index.py:65-68
                doc_entries.append((tid, float(w32)))
        for tid, w in _doc_cap_py(doc_entries, cfg.top_k_terms):
            postings[tid].append((didx, w))

    packed = {}
    for tid, plist in postings.items():
        if not plist:
            continue
        plist.sort()  # ascending doc_idx (reference postings order)
        d = np.array([p[0] for p in plist], dtype=np.int64)
        w = np.array([p[1] for p in plist], dtype=np.float32)
        packed[tid] = (d, w)

    return OracleIndex(doc_ids=doc_ids, vocab=vocab, terms=terms, df=df,
                       dl=dl, avgdl=avgdl, n_docs=n_docs, postings=packed,
                       cfg=cfg)


def build_oracle_index_weighted(
    doc_vectors: dict[str, dict[str, float]], cfg: EngineConfig = DEFAULT
) -> OracleIndex:
    """Oracle index over externally-weighted sparse vectors (the SPLADE
    expansion path): doc numbering = ascending doc_id, vocab = sorted
    terms, float32 weights, strict > min_weight filter, exclusion and
    per-doc top-k cap mirroring the engine."""
    exclude = set(cfg.exclude_terms)
    doc_ids = sorted(doc_vectors)
    terms = sorted(
        {t for v in doc_vectors.values() for t in v if t not in exclude}
    )
    vocab = {t: i for i, t in enumerate(terms)}
    df = np.zeros(len(terms), dtype=np.int64)
    postings: dict[int, list[tuple[int, float]]] = {i: [] for i in range(len(terms))}
    for didx, did in enumerate(doc_ids):
        doc_entries: list[tuple[int, float]] = []
        for t, w in doc_vectors[did].items():
            if t in exclude:
                continue
            tid = vocab[t]
            df[tid] += 1
            w32 = np.float32(w)
            if w32 > cfg.min_weight:
                doc_entries.append((tid, float(w32)))
        for tid, w in _doc_cap_py(doc_entries, cfg.top_k_terms):
            postings[tid].append((didx, w))
    packed = {}
    for tid, plist in postings.items():
        if not plist:
            continue
        plist.sort()
        packed[tid] = (
            np.array([p[0] for p in plist], dtype=np.int64),
            np.array([p[1] for p in plist], dtype=np.float32),
        )
    return OracleIndex(doc_ids=doc_ids, vocab=vocab, terms=terms, df=df,
                       dl=np.zeros(len(doc_ids), dtype=np.int64), avgdl=0.0,
                       n_docs=len(doc_ids), postings=packed, cfg=cfg)


def sparsify_query_oracle(
    q: dict[int, float], cfg: EngineConfig
) -> dict[int, float]:
    """W3 mirror (reference sparse_index.py:539-578 via retrieval.py:133-144):
    strict > min_weight, then keep the top_k_terms highest weights, ties
    broken by ascending term_id — the engine's query sparsify rule."""
    items = [(tid, w) for tid, w in q.items() if w > cfg.min_weight]
    if len(items) > cfg.top_k_terms:
        items.sort(key=lambda p: (-p[1], p[0]))
        items = items[: cfg.top_k_terms]
    return dict(items)


def score_weighted_query_oracle(
    q_vec: dict[str, float], idx: OracleIndex, k: int = 10
) -> list[tuple[str, float]]:
    """Like score_query_oracle but with an externally-weighted query vector
    (term -> weight). OOV and excluded terms dropped; index sparsify
    settings mirrored onto the query."""
    exclude = set(idx.cfg.exclude_terms)
    q = {
        idx.vocab[t]: float(np.float32(w))
        for t, w in q_vec.items()
        if t in idx.vocab and t not in exclude
    }
    q = sparsify_query_oracle(q, idx.cfg)
    scores = np.zeros(idx.n_docs, dtype=np.float32)
    touched = np.zeros(idx.n_docs, dtype=bool)
    for tid in sorted(q):
        if tid not in idx.postings:
            continue
        d, w = idx.postings[tid]
        scores[d] += np.float32(q[tid]) * w
        touched[d] = True
    cand = np.nonzero(touched)[0]
    if cand.size == 0:
        return []
    order = np.lexsort((cand, -scores[cand]))[:k]
    return [(idx.doc_ids[int(cand[i])], float(scores[cand[i]])) for i in order]


def encode_query_oracle(text: str, idx: OracleIndex) -> dict[int, float]:
    """Bag-of-words query: term -> qtf (float32). OOV terms dropped
    (empty-postings path, sparse_index.py:705-714); exclusion + sparsify
    mirrored from the index settings (P2/W3)."""
    exclude = set(idx.cfg.exclude_terms)
    q: dict[int, float] = {}
    for t in tokenize_py(text, idx.cfg.max_tokens):
        tid = idx.vocab.get(t)
        if tid is not None and t not in exclude:
            q[tid] = q.get(tid, 0.0) + 1.0
    return sparsify_query_oracle(q, idx.cfg)


def score_query_oracle(text: str, idx: OracleIndex, k: int = 10
                       ) -> list[tuple[str, float]]:
    """Exhaustive accumulation in float32, canonical order: ascending
    term_id, then ascending doc_idx (SURVEY.md §4.3.1). Returns
    [(doc_id, score)] ranked by (score desc, doc_idx asc)."""
    q = encode_query_oracle(text, idx)
    scores = np.zeros(idx.n_docs, dtype=np.float32)
    touched = np.zeros(idx.n_docs, dtype=bool)
    for tid in sorted(q):
        if tid not in idx.postings:
            continue
        d, w = idx.postings[tid]
        scores[d] += np.float32(q[tid]) * w
        touched[d] = True
    cand = np.nonzero(touched)[0]
    if cand.size == 0:
        return []
    # rank by (-score, doc_idx): lexsort keys, last key is primary
    order = np.lexsort((cand, -scores[cand]))[:k]
    return [(idx.doc_ids[int(cand[i])], float(scores[cand[i]])) for i in order]
