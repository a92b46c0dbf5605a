"""Corpus-driven subword tokenizer (functions/subword.py) + index/query
round trip on subword terms.

The `subword_tokenize` oracle entry pins Spark ≡ DuckDB; these tests pin
the Python form (`split_word`) against the Spark pipeline, determinism of
the vocab build, and — the D3 surface — that the whole index/query stack
(index_from_tf → wand/exhaustive) runs rank-identically on subword terms
against an independent NumPy BM25 oracle.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from splade_spark.fixtures import gen_pages
from splade_spark.functions.subword import (
    UNK,
    build_subword_vocab,
    split_word,
    split_word_wordpiece,
    subword_tf,
)
from splade_spark.functions.tokenize import tokenize_py

N_DOCS, SW_LEN, SW_V = 80, 6, 300
K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def docs_df(spark):
    pages = gen_pages(N_DOCS, seed=55)
    return spark.createDataFrame(pages[["url", "text"]]).select(
        F.col("url").alias("doc_id"), "text"
    )


@pytest.fixture(scope="module")
def vocab(docs_df):
    return build_subword_vocab(
        docs_df, max_piece_len=SW_LEN, vocab_size=SW_V
    ).persist()


def test_vocab_deterministic_and_covering(docs_df, vocab):
    v1 = {r["piece"] for r in vocab.collect()}
    v2 = {
        r["piece"]
        for r in build_subword_vocab(
            docs_df, max_piece_len=SW_LEN, vocab_size=SW_V
        ).collect()
    }
    assert v1 == v2
    # every observed character is in the vocab (coverage invariant)
    chars = {
        c
        for r in docs_df.select("text").collect()
        for w in tokenize_py(r["text"])
        for c in w
    }
    assert chars <= v1


def test_split_word_semantics():
    v = frozenset({"un", "related", "rel", "a", "t", "e", "d", "u", "n", "x"})
    # longest match wins at each position
    assert split_word("unrelated", v, 8) == ["un", "related"]
    assert split_word("relatedun", v, 8) == ["related", "un"]
    # piece length capped
    assert split_word("unrelated", v, 3) == ["un", "rel", "a", "t", "e", "d"]
    # unknown character stops the walk (mirrors the SQL join semantics)
    assert split_word("unzzz", v, 8) == ["un"]
    assert split_word("", v, 8) == []


def _hf_wordpiece_oracle(word, vocab, max_input_chars_per_word=100):
    """Independent reimplementation of the published HF WordpieceTokenizer
    algorithm (BERT tokenization paper / transformers source semantics):
    whole-word [UNK] on overlength or any dead-end; greedy longest match;
    '##' lookup prefix for non-initial positions."""
    if len(word) > max_input_chars_per_word:
        return ["[UNK]"]
    is_bad, start, sub_tokens = False, 0, []
    while start < len(word):
        end, cur = len(word), None
        while start < end:
            substr = word[start:end]
            if start > 0:
                substr = "##" + substr
            if substr in vocab:
                cur = substr
                break
            end -= 1
        if cur is None:
            is_bad = True
            break
        sub_tokens.append(cur)
        start = end
    return ["[UNK]"] if is_bad else sub_tokens


def test_wordpiece_split_matches_hf_rules():
    """Round-3 verdict item 6: byte-identical segmentation vs HF
    WordPiece rules on a hand-built vocab, including the ## continuation
    marker, whole-word [UNK] fallback, and the 100-char cap."""
    v = frozenset({"un", "##related", "##rel", "##ated", "##a", "##ted",
                   "rel", "related", "want", "##ed", "wa", "##nt",
                   "x", "##x", "q"})
    words = ["unrelated", "related", "wanted", "want", "unrelatedz",
             "zebra", "x", "xx", "xxx", "q", "qx", "" , "unx",
             "relatedrelated", "x" * 100, "x" * 101]
    for w in words:
        if not w:
            continue
        assert split_word_wordpiece(w, v) == _hf_wordpiece_oracle(w, v), w
    # spot-check the interesting shapes explicitly
    assert split_word_wordpiece("unrelated", v) == ["un", "##related"]
    assert split_word_wordpiece("unrelatedz", v) == [UNK]  # dead-end → whole-word UNK
    assert split_word_wordpiece("zebra", v) == [UNK]        # bad first char
    assert split_word_wordpiece("xx", v) == ["x", "##x"]
    assert split_word_wordpiece("x" * 101, v) == [UNK]      # overlength


def test_wordpiece_vocab_and_tf_end_to_end(spark, docs_df):
    """Corpus-built wordpiece vocab + subword_tf(style='wordpiece') ≡ the
    HF-rules python oracle per word; in-corpus text never hits [UNK] at
    word-initial chars (single-char coverage in both forms)."""
    vocab = build_subword_vocab(
        docs_df, max_piece_len=SW_LEN, vocab_size=SW_V, style="wordpiece"
    ).persist()
    vset = frozenset(r["piece"] for r in vocab.collect())
    # continuation pieces really exist and are marked
    assert any(p.startswith("##") for p in vset)
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in subword_tf(
            docs_df, vocab, max_piece_len=SW_LEN, style="wordpiece"
        ).collect()
    }
    want: dict[tuple, int] = {}
    for r in docs_df.collect():
        for w in tokenize_py(r["text"]):
            for piece in _hf_wordpiece_oracle(w, vset):
                key = (r["doc_id"], piece)
                want[key] = want.get(key, 0) + 1
    assert got == want
    vocab.unpersist()


def test_vocab_top_cut_equals_global_ranking(docs_df, vocab):
    """The distributed TakeOrdered cut must equal the global
    (freq desc, piece asc) ranking the old single-task window produced."""
    counts: dict[str, int] = {}
    for r in docs_df.select("text").collect():
        for w in tokenize_py(r["text"]):
            for s in range(len(w)):
                for ln in range(1, SW_LEN + 1):
                    if s + ln <= len(w):
                        p = w[s:s + ln]
                        counts[p] = counts.get(p, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    want = {p for p, _ in ranked[:SW_V]} | {p for p in counts if len(p) == 1}
    assert {r["piece"] for r in vocab.collect()} == want


def test_subword_tf_matches_python(spark, docs_df, vocab):
    vset = frozenset(r["piece"] for r in vocab.collect())
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in subword_tf(docs_df, vocab, max_piece_len=SW_LEN).collect()
    }
    want: dict[tuple, int] = {}
    for r in docs_df.collect():
        for w in tokenize_py(r["text"]):
            for piece in split_word(w, vset, SW_LEN):
                key = (r["doc_id"], piece)
                want[key] = want.get(key, 0) + 1
    assert got == want


def test_subword_index_query_roundtrip(spark, docs_df, vocab):
    """Subword tf → index_from_tf → WAND/exhaustive retrieve with
    subword-encoded queries ≡ NumPy BM25 oracle over the same tf."""
    from splade_spark.config import EngineConfig
    from splade_spark.operators.indexing import index_from_tf
    from splade_spark.operators.query import retrieve

    cfg = EngineConfig(block_size=64, index_partitions=4)
    tf = subword_tf(docs_df, vocab, max_piece_len=SW_LEN).persist()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("int").alias("dl"))
    idx = index_from_tf(tf, dl, cfg=cfg)

    # queries: subword-encode a few corpus snippets with the same vocab
    vset = frozenset(r["piece"] for r in vocab.collect())
    texts = [r["text"] for r in docs_df.limit(6).collect()]
    qrows = []
    qbags: dict[str, dict[str, float]] = {}
    for i, t in enumerate(texts):
        qid = f"q{i}"
        bag: dict[str, float] = {}
        for w in tokenize_py(t)[:5]:
            for piece in split_word(w, vset, SW_LEN):
                bag[piece] = bag.get(piece, 0.0) + 1.0
        qbags[qid] = bag
        qrows.extend((qid, p, c) for p, c in bag.items())
    qw = spark.createDataFrame(qrows, "query_id string, term string, weight float")
    queries = spark.createDataFrame(
        [(q, "") for q in qbags], "query_id string, text string"
    )

    def ranks(strategy):
        res = retrieve(idx, queries, k=10, strategy=strategy, query_weights=qw)
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"]) for r in res.collect()
        )

    wand, exh = ranks("wand"), ranks("exhaustive")
    assert wand == exh

    # independent NumPy oracle from the same tf/dl
    tf_rows = tf.collect()
    dl_map = {r["doc_id"]: r["dl"] for r in dl.collect()}
    n = len(dl_map)
    avgdl = sum(dl_map.values()) / n
    df_map: dict[str, int] = {}
    tf_map: dict[tuple, int] = {}
    for r in tf_rows:
        df_map[r["term"]] = df_map.get(r["term"], 0) + 1
        tf_map[(r["term"], r["doc_id"])] = r["tf"]
    expected = []
    for qid, bag in qbags.items():
        scores: dict[str, float] = {}
        for term, qtf in bag.items():
            if term not in df_map:
                continue
            idf = math.log(1.0 + (n - df_map[term] + 0.5) / (df_map[term] + 0.5))
            for (t2, did), tfv in tf_map.items():
                if t2 != term:
                    continue
                w = (
                    idf * tfv * (K1 + 1.0)
                    / (tfv + K1 * (1.0 - B + B * dl_map[did] / avgdl))
                )
                # engine dtype path: f32 weight, f32 product, f64 accum
                prod = np.float32(np.float32(qtf) * np.float32(w))
                scores[did] = scores.get(did, 0.0) + float(prod)
        top = sorted(scores.items(), key=lambda kv: (-np.float32(kv[1]), kv[0]))[:10]
        expected.extend((qid, rk + 1, did) for rk, (did, _s) in enumerate(top))
    assert wand == sorted(expected)
    tf.unpersist()
