"""Text-analysis operator library (operators/textstats.py).

The driver-gated entries (text_quality / token_counts / lang_id_heuristic /
dedup_exact / doc_fingerprint / simhash_groups / simhash_wide_groups) pin
these operators at their oracle operating points; these tests exercise the
parameterized surface.
"""

import pytest

from splade_spark.operators.textstats import (
    exact_dup_stats,
    exact_duplicate_groups,
    fingerprint_col,
    lang_id,
    simhash,
    simhash_dup_groups,
    text_quality_features,
    token_count_features,
)

DOCS = [
    (1, "the cat and the dog", "en"),
    (2, "THE CAT AND THE DOG", "en"),  # case-normalized dup of 1
    (3, "aaaa bbbb cccc dddd", "xx"),  # zero stopwords
    (4, "", "xx"),                      # empty text
    (5, "the cat and the dog", "en"),  # exact dup of 1
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string, lang string")


def test_quality_features(docs_df):
    got = {r["doc_id"]: r for r in text_quality_features(docs_df).collect()}
    assert got[1]["n_tokens"] == 5
    assert got[1]["stopword_ratio"] == pytest.approx(3 / 5)  # the, and, the
    assert got[1]["mean_tok_len"] == pytest.approx(15 / 5)
    assert got[4]["n_tokens"] == 0
    assert got[4]["mean_tok_len"] == 0.0 and got[4]["stopword_ratio"] == 0.0
    assert got[3]["stopword_ratio"] == 0.0


def test_token_counts(docs_df):
    got = {r["doc_id"]: r for r in token_count_features(docs_df).collect()}
    assert got[1]["n_tokens"] == 5
    assert got[1]["n_distinct"] == 4  # 'the' twice
    assert got[1]["n_ws_tokens"] == 5


def test_lang_id_threshold(docs_df):
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs_df).collect()}
    assert got[1] == "en" and got[3] == "unknown" and got[4] == "unknown"
    strict = {
        r["doc_id"]: r["pred_lang"]
        for r in lang_id(docs_df, min_hit_pct=70).collect()
    }
    assert strict[1] == "unknown"  # 60% < 70%


def test_exact_dup_groups_and_stats(docs_df):
    # normalized: docs 1/2/5 share a fingerprint
    groups = {r["n_docs"] for r in exact_duplicate_groups(docs_df).collect()}
    assert 3 in groups
    s = exact_dup_stats(docs_df).first()
    assert (s["n_groups"], s["n_dup_groups"], s["n_dup_docs"]) == (3, 1, 3)
    # unnormalized: only 1/5 collide
    s2 = exact_dup_stats(docs_df, normalize=False).first()
    assert (s2["n_groups"], s2["n_dup_groups"], s2["n_dup_docs"]) == (4, 1, 2)


def test_fingerprint_ignores_case_and_punct(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "hello worlds")],
        "doc_id int, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", fingerprint_col("text").alias("fp")).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_simhash_widths_and_validation(docs_df):
    h16 = {r["doc_id"]: r["simhash"] for r in simhash(docs_df, bits=16).collect()}
    h60 = {r["doc_id"]: r["simhash"] for r in simhash(docs_df, bits=60).collect()}
    assert all(0 <= v < 2**16 for v in h16.values())
    assert all(0 <= v < 2**60 for v in h60.values())
    # case-normalized dups tokenize identically -> identical fingerprints
    assert h60[1] == h60[2] == h60[5]
    assert h60[1] != h60[3]
    with pytest.raises(ValueError):
        simhash(docs_df, bits=64)
    with pytest.raises(ValueError):
        simhash(docs_df, bits=10)


def test_simhash_group_sizes(docs_df):
    got = {
        r["doc_id"]: r["group_size"]
        for r in simhash_dup_groups(docs_df, bits=60).collect()
    }
    assert got[1] == got[2] == got[5] == 3
    assert got[3] == 1


def test_repetition_stats_pinned(spark):
    from splade_spark.operators.textstats import repetition_stats

    rows = [
        # 4 non-empty lines, "promo line" repeats twice -> dup 1/4;
        # tokens: promo line appears 3x -> bigram "promo line" count 3
        ("d1", "promo line\nreal content here\npromo line\n\nends promo line"),
        ("d2", "solo"),          # 1 token -> no bigrams, frac 0
        ("d3", ""),              # empty -> zeros
        ("d4", "a b a b a b"),   # "a b" x3, "b a" x2 -> top 3, frac 6/6
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}

    assert got["d1"]["n_lines"] == 4
    assert got["d1"]["dup_line_frac"] == pytest.approx(0.25)
    assert got["d1"]["top_bigram_count"] == 3
    assert got["d2"]["n_tokens"] == 1
    assert got["d2"]["top_bigram_count"] == 0
    assert got["d2"]["top_bigram_frac"] == 0.0
    assert got["d3"]["n_lines"] == 0
    assert got["d3"]["dup_line_frac"] == 0.0
    assert got["d4"]["top_bigram_count"] == 3
    assert got["d4"]["top_bigram_frac"] == pytest.approx(1.0)


def test_pii_stats_counts_and_redaction_order(spark):
    from splade_spark.operators.textstats import pii_stats

    rows = [
        ("d1", "mail a.b+c@ex-site.org or x@y.io, host 192.168.1.4 "
               "call +44 20 7946 0958 end"),
        ("d2", "no pii at all"),
        # an IPv4 must redact as <IP>, not get half-eaten by the phone
        # pattern (which needs a leading +)
        ("d3", "+1 555-010-2233 then 10.20.30.40"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_stats(df).collect()}

    assert (got["d1"]["n_emails"], got["d1"]["n_ipv4"], got["d1"]["n_phones"]) \
        == (2, 1, 1)
    assert "<EMAIL>" in got["d1"]["redacted"]
    assert "<IP>" in got["d1"]["redacted"]
    assert "<PHONE>" in got["d1"]["redacted"]
    assert "ex-site" not in got["d1"]["redacted"]
    assert got["d2"]["redacted"] == "no pii at all"
    assert (got["d2"]["n_emails"], got["d2"]["n_ipv4"], got["d2"]["n_phones"]) \
        == (0, 0, 0)
    assert got["d3"]["redacted"] == "<PHONE> then <IP>"


def test_chunk_documents_windows(spark):
    from splade_spark.operators.textstats import chunk_documents

    rows = [
        ("d1", " ".join(f"t{i}" for i in range(10))),  # 10 toks
        ("d2", "one two"),                             # fits one chunk
        ("d3", ""),                                    # empty -> 1 empty chunk
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = chunk_documents(df, chunk_tokens=4, overlap=2)  # step 2
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = (
            r["chunk_text"], r["n_chunk_tokens"], r["n_chunks"]
        )
    # d1: starts 0,2,4,6,8 -> 5 chunks; last is the 2-token tail
    assert sorted(got["d1"]) == [0, 1, 2, 3, 4]
    assert got["d1"][0] == ("t0 t1 t2 t3", 4, 5)
    assert got["d1"][1][0] == "t2 t3 t4 t5"
    assert got["d1"][4] == ("t8 t9", 2, 5)
    assert got["d2"] == {0: ("one two", 2, 1)}
    assert got["d3"] == {0: ("", 0, 1)}
    # windows reconstruct the doc: every token appears in some chunk
    toks = set()
    for text, _, _ in got["d1"].values():
        toks.update(text.split())
    assert toks == {f"t{i}" for i in range(10)}


def test_chunk_documents_rejects_bad_overlap(spark):
    from splade_spark.operators.textstats import chunk_documents

    df = spark.createDataFrame([("d", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_strip_boilerplate_lines(spark):
    from splade_spark.operators.textstats import strip_boilerplate_lines

    # host A: 3 docs sharing nav+footer; host B: same nav text but only
    # 2 docs (below min_docs) -> B keeps its chrome
    rows = [
        ("a1", "A", "NAV\nunique a1 body\n\nFOOT"),
        ("a2", "A", "NAV\nunique a2 body\nFOOT"),
        ("a3", "A", " NAV \nunique a3 body\nFOOT"),  # trims to same line
        ("b1", "B", "NAV\nunique b1 body"),
        ("b2", "B", "NAV\nunique b2 body"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, src string, text string")
    out = strip_boilerplate_lines(
        docs, group_col="src", min_docs=3
    )
    got = {r["doc_id"]: (r["n_lines"], r["n_kept"], r["text"]) for r in out.collect()}
    # host A chrome stripped (incl. the padded " NAV " via trim), empty
    # line inside a1 survives (only non-empty lines count as chrome)
    assert got["a1"] == (4, 2, "unique a1 body\n")
    assert got["a2"] == (3, 1, "unique a2 body")
    assert got["a3"] == (3, 1, "unique a3 body")
    # host B below threshold: untouched
    assert got["b1"] == (2, 2, "NAV\nunique b1 body")
    assert got["b2"] == (2, 2, "NAV\nunique b2 body")
