"""Spell suggestion (operators/spell.py): gram algebra and ranking rules.

The driver-gated `spell_suggest` entry pins the corpus-dictionary path vs
DuckDB; these tests pin the ranking contract on a handcrafted dictionary.
"""

import pytest

from splade_spark.operators.spell import char_ngrams, term_suggestions

from pyspark.sql import functions as F


def test_char_ngrams_distinct_and_short_guard(spark):
    df = spark.createDataFrame(
        [("banana",), ("ab",), ("abc",)], ["s"]
    ).select(char_ngrams(F.col("s")).alias("g"))
    got = [r["g"] for r in df.collect()]
    assert got[0] == ["ban", "ana", "nan"]   # 'ana' deduped, order kept
    assert got[1] == []
    assert got[2] == ["abc"]


def _dict(spark):
    return spark.createDataFrame(
        [("partition", 50), ("partner", 30), ("petition", 50),
         ("zebra", 99)],
        ["term", "df"],
    )


def test_term_suggestions_ranking_and_tiebreak(spark):
    terms = spark.createDataFrame([("partitio",)], ["qterm"])
    got = [
        (r["rank"], r["suggestion"])
        for r in term_suggestions(_dict(spark), terms, topn=3)
        .orderBy("rank").collect()
    ]
    # partition shares 6/7 grams (j=6/8); petition 4; partner 2; zebra 0
    assert got[0] == (1, "partition")
    assert [s for _, s in got] == ["partition", "petition", "partner"]


def test_term_suggestions_df_tiebreak_and_min_jaccard(spark):
    d = spark.createDataFrame(
        [("abcx", 10), ("abcy", 90)], ["term", "df"]
    )
    terms = spark.createDataFrame([("abcz",)], ["qterm"])
    got = [
        (r["rank"], r["suggestion"])
        for r in term_suggestions(d, terms, topn=2).orderBy("rank").collect()
    ]
    # equal jaccard (share 'abc' only) -> higher df wins
    assert got == [(1, "abcy"), (2, "abcx")]
    none = term_suggestions(d, terms, topn=2, min_jaccard=0.9).count()
    assert none == 0


def test_term_suggestions_short_query_no_rows(spark):
    terms = spark.createDataFrame([("ab",)], ["qterm"])
    assert term_suggestions(_dict(spark), terms).count() == 0


# --- synonym expansion (query.expand_queries_with_synonyms) ---------------

def test_synonym_expansion_weights_and_direction(spark):
    from splade_spark.operators.query import expand_queries_with_synonyms

    qs = spark.createDataFrame(
        [("q1", "fast fast join")], ["query_id", "text"]
    )
    syn = spark.createDataFrame(
        # directional: fast->quick, join->merge, quick->NOTHING
        [("fast", "quick"), ("join", "merge"), ("join", "fast")],
        ["term", "syn"],
    )
    got = {
        (r["query_id"], r["term"]): r["weight"]
        for r in expand_queries_with_synonyms(qs, syn, syn_weight=0.5)
        .collect()
    }
    # fast: base 2 + 0.5 from join->fast; quick: 0.5*2; merge: 0.5*1
    assert got[("q1", "fast")] == pytest.approx(2.5)
    assert got[("q1", "quick")] == pytest.approx(1.0)
    assert got[("q1", "join")] == pytest.approx(1.0)
    assert got[("q1", "merge")] == pytest.approx(0.5)
    assert len(got) == 4


def test_synonym_expansion_retrieval_recall(spark):
    from splade_spark.operators.indexing import build_index
    from splade_spark.operators.query import (
        expand_queries_with_synonyms,
        retrieve,
    )

    docs = spark.createDataFrame(
        [("a", "the quick fox"), ("b", "unrelated words only")],
        ["doc_id", "text"],
    )
    idx = build_index(docs, id_col="doc_id", text_col="text")
    qs = spark.createDataFrame([("q", "fast")], ["query_id", "text"])
    # without expansion: 'fast' is OOV, zero results
    assert retrieve(idx, qs, k=5).count() == 0
    syn = spark.createDataFrame([("fast", "quick")], ["term", "syn"])
    w = expand_queries_with_synonyms(qs, syn)
    top = retrieve(idx, qs, k=5, query_weights=w).collect()
    assert [r["doc_id"] for r in top] == ["a"]
