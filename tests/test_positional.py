"""Positional index + phrase retrieval vs a brute-force Python oracle."""

import numpy as np
import pytest

from splade_spark.functions.codec import varint_decode, varint_encode
from splade_spark.functions.tokenize import tokenize_py
from splade_spark.operators.positional import (
    decode_positional,
    encode_positional,
    phrase_occurrences,
    phrase_search,
    positional_postings,
)

DOCS = [
    ("d01", "Hash join beats sort merge join when the build side is small"),
    ("d02", "a a a a"),                       # overlapping repeats
    ("d03", "table scan, table scan, table scan!"),
    ("d04", "the hash JOIN; the hash-join"),  # punctuation splits to tokens
    ("d05", ""),                              # empty doc
    ("d06", None),                            # null text
    ("d07", "join hash"),                     # reversed — must NOT match
    ("d08", "x " * 300 + "needle gold"),      # truncated at max_tokens=256
]

PHRASES = [
    ("q_bigram", "hash join"),
    ("q_rep", "a a"),
    ("q_tri", "table scan table"),
    ("q_single", "join"),
    ("q_oov", "hash nosuchtoken"),
    ("q_punct", "Table! SCAN?"),
    ("q_trunc", "needle gold"),
    ("q_empty", "!!!"),
]


def _py_phrase_counts(docs, phrases, max_tokens=256):
    """Brute-force oracle: scan every start offset of every doc."""
    out = {}
    for qid, phrase in phrases:
        p = tokenize_py(phrase, max_tokens)
        if not p:
            continue
        n = len(p)
        for did, text in docs:
            toks = tokenize_py(text, max_tokens)
            c = sum(
                1
                for i in range(len(toks) - n + 1)
                if toks[i : i + n] == p
            )
            if c:
                out[(qid, did)] = c
    return out


def test_phrase_search_matches_bruteforce(spark):
    got = {
        (r["query_id"], r["doc_id"]): r["n_occurrences"]
        for r in phrase_search(
            spark.createDataFrame(DOCS, "doc_id string, text string"),
            PHRASES,
        ).collect()
    }
    assert got == _py_phrase_counts(DOCS, PHRASES)


def test_phrase_edges(spark):
    got = _py_phrase_counts(DOCS, PHRASES)
    # overlap: "a a a a" contains "a a" at starts 1,2,3
    assert got[("q_rep", "d02")] == 3
    # order matters: d07 has both terms but never adjacent in order
    assert ("q_bigram", "d07") not in got
    # tokenizer normalization: punctuation/case phrase still matches
    assert got[("q_punct", "d03")] == 3
    # OOV term matches nothing anywhere
    assert not any(q == "q_oov" for q, _ in got)
    # truncation: tokens beyond max_tokens never match
    assert not any(q == "q_trunc" for q, _ in got)
    # single-token phrase degenerates to tf
    assert got[("q_single", "d01")] == 2


def test_positional_postings_positions(spark):
    rows = positional_postings(
        spark.createDataFrame(
            [("d1", "b a c a")], "doc_id string, text string"
        )
    ).collect()
    got = {r["term"]: (list(r["positions"]), r["tf"]) for r in rows}
    assert got == {"b": ([1], 1), "a": ([2, 4], 2), "c": ([3], 1)}


def test_positional_codec_roundtrip(spark):
    pos = positional_postings(
        spark.createDataFrame(DOCS, "doc_id string, text string")
    )
    back = decode_positional(encode_positional(pos))
    a = {
        (r["term"], r["doc_id"]): list(r["positions"])
        for r in pos.collect()
    }
    b = {
        (r["term"], r["doc_id"]): list(r["positions"])
        for r in back.collect()
    }
    assert a == b and len(a) > 0


def test_varint_positions_delta():
    gaps = np.array([5, 2, 130, 1], dtype=np.int64)
    assert list(varint_decode(varint_encode(gaps))) == [5, 2, 130, 1]


def test_phrase_occurrences_empty_phrase_set(spark):
    pos = positional_postings(
        spark.createDataFrame(DOCS, "doc_id string, text string")
    )
    empty = spark.createDataFrame([], "query_id string, phrase string")
    assert phrase_occurrences(pos, empty).count() == 0
