"""Sequence packing (operators/packing.py) vs a sequential Python mirror,
plus the packing invariants a pretraining writer relies on."""

import pytest

from splade_spark.functions.tokenize import tokenize_py
from splade_spark.operators.packing import pack_sequences, packing_stats

DOCS = [
    ("a01", "alpha beta gamma delta"),                      # 4 tokens
    ("a02", ""),                                            # 0 tokens
    ("a03", " ".join(f"w{i}" for i in range(19))),          # 19 tokens
    ("a04", "one"),                                         # 1 token
    ("a05", " ".join(f"x{i}" for i in range(8))),           # 8 tokens
    ("a06", None),                                          # null text
    ("a07", " ".join(f"y{i}" for i in range(13))),          # 13 tokens
]
L = 8


def _mirror(rows, seq_len):
    out = []
    off = 0
    for doc_id, text in sorted(rows):
        dl = len(tokenize_py(text))
        if dl == 0:
            continue
        first, last = off // seq_len, (off + dl - 1) // seq_len
        for s in range(first, last + 1):
            out.append(
                (
                    s,
                    doc_id,
                    dl,
                    max(0, s * seq_len - off),
                    min(dl, (s + 1) * seq_len - off),
                    max(0, off - s * seq_len),
                )
            )
        off += dl
    return sorted(out)


@pytest.fixture(scope="module")
def plan(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    return [
        tuple(r)
        for r in pack_sequences(docs, seq_len=L)
        .select(
            "seq_id", "doc_id", "n_doc_tokens", "tok_from", "tok_to", "seq_off"
        )
        .collect()
    ]


def test_plan_matches_python_mirror(plan):
    assert sorted(plan) == _mirror(DOCS, L)


def test_packing_invariants(plan):
    total = sum(len(tokenize_py(t)) for _, t in DOCS)
    # token conservation: spans cover every token exactly once
    assert sum(to - fr for _, _, _, fr, to, _ in plan) == total
    # every sequence except the last is exactly full, with no gaps
    by_seq = {}
    for s, _, _, fr, to, so in plan:
        by_seq.setdefault(s, []).append((so, so + (to - fr)))
    last = max(by_seq)
    assert sorted(by_seq) == list(range(last + 1))
    for s, spans in by_seq.items():
        spans.sort()
        assert spans[0][0] == 0
        for (_, e1), (b2, _) in zip(spans, spans[1:]):
            assert e1 == b2  # contiguous
        assert spans[-1][1] == (L if s < last else total - last * L)


def test_stats_match_plan(spark, plan):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    row = packing_stats(
        pack_sequences(docs, seq_len=L), seq_len=L
    ).collect()[0]
    total = sum(len(tokenize_py(t)) for _, t in DOCS)
    n_seq = max(s for s, *_ in plan) + 1
    assert row["n_sequences"] == n_seq
    assert row["total_tokens"] == total
    assert row["total_spans"] == len(plan)
    assert row["fill_rate"] == pytest.approx(total / (n_seq * L))


def test_deterministic_across_partitionings(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    a = sorted(map(tuple, pack_sequences(docs, seq_len=L).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(
                docs.repartition(7), seq_len=L, num_partitions=3
            ).collect(),
        )
    )
    assert a == b


def test_empty_and_bad_args(spark):
    docs = spark.createDataFrame([], "doc_id string, text string")
    assert pack_sequences(docs, seq_len=4).count() == 0
    with pytest.raises(ValueError):
        pack_sequences(docs, seq_len=0)
    with pytest.raises(ValueError):
        packing_stats(docs, seq_len=-1)


def test_materialize_packed_reassembles_stream(spark, plan):
    """Concatenating seq_text in seq_id order must reproduce the exact
    token stream of the corpus in doc_id order; every sequence except
    the last is exactly full."""
    from splade_spark.operators.packing import materialize_packed

    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    rows = {
        r["seq_id"]: r
        for r in materialize_packed(
            docs, pack_sequences(docs, seq_len=L), seq_len=L
        ).collect()
    }
    stream = [
        t for _, text in sorted(DOCS) for t in tokenize_py(text)
    ]
    rebuilt = []
    for s in sorted(rows):
        r = rows[s]
        toks = r["seq_text"].split(" ")
        assert r["n_filled"] == len(toks)
        if s < max(rows):
            assert r["n_filled"] == L
        rebuilt.extend(toks)
    assert rebuilt == stream
    # span counts agree with the plan
    from collections import Counter

    plan_docs = Counter(s for s, *_ in plan)
    assert {s: rows[s]["n_docs"] for s in rows} == dict(plan_docs)


def test_pack_sequences_randomized_vs_mirror(spark):
    """Seeded random corpora × several seq_lens against the sequential
    Python mirror — catches span-arithmetic edge cases (docs exactly on
    a boundary, single-token docs, empty docs, L=1)."""
    import random

    rng = random.Random(11)
    for trial, L_ in [(0, 1), (1, 5), (2, 16)]:
        rows = []
        for i in range(60):
            n = rng.choice([0, 1, 2, 3, 7, 15, 16, 17, 40])
            rows.append(
                (f"r{trial}-{i:03d}", " ".join(f"t{j}" for j in range(n)))
            )
        docs = spark.createDataFrame(rows, "doc_id string, text string")
        got = sorted(
            map(tuple, pack_sequences(docs, seq_len=L_).collect())
        )
        assert got == _mirror(rows, L_), (trial, L_)
