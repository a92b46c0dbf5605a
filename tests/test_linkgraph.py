"""Link-graph operators (operators/linkgraph.py): href extraction rules
and PageRank against a NumPy power-iteration mirror.

The driver-gated `link_extraction` / `link_pagerank` entries pin the
DuckDB-portable surface; these tests exercise what the entries cannot:
binary html input, the full URL-resolution rule table, dangling-mass
redistribution, tolerance-based early exit, and duplicate-edge collapse.
"""

import numpy as np
import pytest

from splade_spark.operators.linkgraph import extract_links, pagerank

PAGES = [
    (
        "https://a.example/p/1",
        """<html><body>
        <a href="https://b.example/x">abs</a>
        <a href = "/local/2">root-relative</a>
        <a href="relative/path">dropped: path-relative</a>
        <a href="#frag">dropped: fragment</a>
        <a href="mailto:x@y.z">dropped: mailto</a>
        <a href="//b.example/proto">dropped: protocol-relative</a>
        <a href="https://a.example/p/1">dropped: self</a>
        <a href="">dropped: empty</a>
        <a href="https://b.example/x">duplicate collapses</a>
        </body></html>""",
    ),
    ("https://c.example/q", '<p>no links here</p>'),
]


def _edges(spark, pages, **kw):
    df = spark.createDataFrame(pages, ["url", "html"])
    return {
        (r["src"], r["dst"])
        for r in extract_links(df, **kw).collect()
    }


def test_extract_links_resolution_rules(spark):
    got = _edges(spark, PAGES)
    assert got == {
        ("https://a.example/p/1", "https://b.example/x"),
        ("https://a.example/p/1", "https://a.example/local/2"),
    }


def test_extract_links_binary_html_and_keep_self(spark):
    pages = [
        (
            "https://a.example/p",
            '<a href="/s">x</a><a href="https://a.example/p">self</a>'.encode(),
        )
    ]
    df = spark.createDataFrame(pages, "url string, html binary")
    got = {
        (r["src"], r["dst"])
        for r in extract_links(df, keep_self=True).collect()
    }
    assert got == {
        ("https://a.example/p", "https://a.example/s"),
        ("https://a.example/p", "https://a.example/p"),
    }


def _np_pagerank(n, edges, d=0.85, iters=40):
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        dangling = r[outdeg == 0].sum()
        nxt += d * dangling / n
        for s, t in edges:
            nxt[t] += d * r[s] / outdeg[s]
        r = nxt
    return r


@pytest.fixture(scope="module")
def random_graph():
    rng = np.random.default_rng(7)
    n = 40
    edges = {
        (int(rng.integers(n)), int(rng.integers(n))) for _ in range(160)
    }
    edges = sorted((s, t) for s, t in edges if s != t)
    # force several dangling (sink) nodes: strip all out-edges of 0..4
    edges = [(s, t) for s, t in edges if s >= 5]
    assert any(t < 5 for _, t in edges)  # sinks still reachable
    return n, edges


def test_pagerank_matches_numpy_mirror_with_dangling(spark, random_graph):
    _, edges = random_graph
    # the operator's node universe = ids appearing in the edge list;
    # reindex the mirror over exactly that set
    seen = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {v: i for i, v in enumerate(seen)}
    want = _np_pagerank(
        len(seen), [(idx[s], idx[t]) for s, t in edges], iters=40
    )
    df = spark.createDataFrame(edges, ["src", "dst"])
    got_rows = pagerank(df, n_iter=40).collect()
    assert {r["id"] for r in got_rows} == set(seen)
    got = dict((r["id"], r["rank"]) for r in got_rows)
    for v in seen:
        assert got[v] == pytest.approx(want[idx[v]], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_duplicate_edges_collapse(spark):
    once = [(0, 1), (1, 2), (2, 0)]
    twice = once + once
    a = pagerank(spark.createDataFrame(once, ["src", "dst"]), n_iter=10)
    b = pagerank(spark.createDataFrame(twice, ["src", "dst"]), n_iter=10)
    da = {r["id"]: r["rank"] for r in a.collect()}
    db = {r["id"]: r["rank"] for r in b.collect()}
    assert da == db


def test_pagerank_tol_early_exit_converges(spark):
    # ring graph converges to uniform immediately; tol exit must still
    # return the exact stationary distribution
    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["rank"] for r in pagerank(df, n_iter=50, tol=1e-12).collect()}
    for i in range(n):
        assert got[i] == pytest.approx(1.0 / n, abs=1e-12)


def test_pagerank_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, 1)], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)


# --- authority-prior blending (query.retrieve_with_prior) -----------------

CORPUS = [
    ("a", "spark shuffle partition join"),
    ("b", "spark shuffle partition join"),   # lexical twin of a
    ("c", "unrelated text about gardening"),
    ("d", "spark only"),
]


@pytest.fixture(scope="module")
def prior_index(spark):
    from splade_spark.operators.indexing import build_index

    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    return build_index(docs, id_col="doc_id", text_col="text")


def test_prior_beta_zero_equals_plain_retrieve(spark, prior_index):
    from splade_spark.operators.query import retrieve, retrieve_with_prior

    qs = spark.createDataFrame([("q1", "spark shuffle")], ["query_id", "text"])
    priors = spark.createDataFrame(
        [("a", 0.1), ("b", 0.9)], ["doc_id", "prior"]
    )
    plain = [
        (r["rank"], r["doc_id"])
        for r in retrieve(prior_index, qs, k=4).collect()
    ]
    blended = [
        (r["rank"], r["doc_id"])
        for r in retrieve_with_prior(
            prior_index, qs, priors, k=4, beta=0.0
        ).collect()
    ]
    assert sorted(plain) == sorted(blended)


def test_prior_flips_lexical_tie_and_zero_boost_for_absent(spark, prior_index):
    from splade_spark.operators.query import retrieve_with_prior

    qs = spark.createDataFrame([("q1", "spark shuffle")], ["query_id", "text"])
    # a and b are lexical twins; tie-break alone ranks a first. A heavier
    # prior on b must flip the order; c/d absent from priors -> zero boost.
    priors = spark.createDataFrame(
        [("a", 0.1), ("b", 0.9)], ["doc_id", "prior"]
    )
    got = {
        r["rank"]: r["doc_id"]
        for r in retrieve_with_prior(
            prior_index, qs, priors, k=4, beta=1.0
        ).collect()
    }
    assert got[1] == "b" and got[2] == "a"


# --- anchor text (extract_anchors / enrich_with_anchor_text) ---------------

def test_extract_anchors_keeps_duplicates_drops_empty(spark):
    from splade_spark.operators.linkgraph import extract_anchors

    pages = [
        (
            "https://a.example/p",
            '<a href="/t">great page</a>'
            '<a href="https://b.example/x">great page</a>'
            '<a href="/t"></a>'           # empty anchor dropped
            '<a href="rel/x">nope</a>',   # unresolvable dropped
        ),
        (
            "https://c.example/q",
            '<a href="https://a.example/t">great page</a>',
        ),
    ]
    df = spark.createDataFrame(pages, ["url", "html"])
    got = sorted(
        (r["src"], r["dst"], r["anchor"])
        for r in extract_anchors(df).collect()
    )
    assert got == [
        ("https://a.example/p", "https://a.example/t", "great page"),
        ("https://a.example/p", "https://b.example/x", "great page"),
        ("https://c.example/q", "https://a.example/t", "great page"),
    ]


def test_enrich_with_anchor_text_and_retrieval(spark):
    from splade_spark.operators.indexing import build_index
    from splade_spark.operators.linkgraph import enrich_with_anchor_text
    from splade_spark.operators.query import retrieve

    docs = spark.createDataFrame(
        [
            ("https://s/a", "a", "nothing relevant here"),
            ("https://s/b", "b", "other content entirely"),
        ],
        ["url", "doc_id", "text"],
    )
    anchors = spark.createDataFrame(
        [
            ("https://s/x", "https://s/a", "zebra manual"),
            ("https://s/y", "https://s/a", "best zebra guide"),
        ],
        ["src", "dst", "anchor"],
    )
    enriched = enrich_with_anchor_text(docs, anchors, weight=2)
    texts = {r["doc_id"]: r["text"] for r in enriched.collect()}
    block = "best zebra guide zebra manual"   # sorted anchors
    assert texts["a"] == "nothing relevant here" + (" " + block) * 2
    assert texts["b"] == "other content entirely"   # untouched
    # the target now ranks for a term it never says
    idx = build_index(
        enriched.select("doc_id", "text"), id_col="doc_id", text_col="text"
    )
    qs = spark.createDataFrame([("q", "zebra")], ["query_id", "text"])
    top = retrieve(idx, qs, k=1).collect()
    assert top[0]["doc_id"] == "a"


def test_enrich_rejects_bad_weight(spark):
    from splade_spark.operators.linkgraph import enrich_with_anchor_text

    docs = spark.createDataFrame([("u", "t")], ["url", "text"])
    anchors = spark.createDataFrame([("s", "u", "a")], ["src", "dst", "anchor"])
    with pytest.raises(ValueError):
        enrich_with_anchor_text(docs, anchors, weight=0)


# --- SERP diversification (query.collapse_by_group) ------------------------

def test_collapse_by_group_promotes_and_reranks(spark):
    from splade_spark.operators.query import collapse_by_group

    results = spark.createDataFrame(
        [("q", r, f"d{r}", 10.0 - r) for r in range(1, 7)],
        ["query_id", "rank", "doc_id", "score"],
    )
    groups = spark.createDataFrame(
        # d1,d2,d3 same host; d4 other; d5,d6 unmapped -> singletons
        [("d1", "h1"), ("d2", "h1"), ("d3", "h1"), ("d4", "h2")],
        ["doc_id", "group"],
    )
    got = [
        (r["rank"], r["doc_id"])
        for r in collapse_by_group(
            results, groups, max_per_group=2
        ).orderBy("rank").collect()
    ]
    # d3 (third hit of h1) drops; everyone below promotes one slot
    assert got == [(1, "d1"), (2, "d2"), (3, "d4"), (4, "d5"), (5, "d6")]


def test_collapse_by_group_k_cut_and_guard(spark):
    from splade_spark.operators.query import collapse_by_group

    results = spark.createDataFrame(
        [("q", r, f"d{r}", 1.0) for r in range(1, 5)],
        ["query_id", "rank", "doc_id", "score"],
    )
    groups = spark.createDataFrame([("d1", "g")], ["doc_id", "group"])
    got = collapse_by_group(results, groups, max_per_group=1, k=2).collect()
    assert sorted((r["rank"], r["doc_id"]) for r in got) == [
        (1, "d1"), (2, "d2")
    ]
    with pytest.raises(ValueError):
        collapse_by_group(results, groups, max_per_group=0)


def test_extract_links_non_http_base_drops_root_relative(spark):
    """ADVICE r4: a page whose own URL is not absolute http(s) has no
    site prefix — its root-relative hrefs must be DROPPED, not emitted
    as malformed bare-path '/x' nodes."""
    pages = [
        ("warc:rec-001", '<a href="/x">r</a><a href="https://b.ex/y">a</a>'),
        ("ftp://h/p", '<a href="/only-root-relative">r</a>'),
    ]
    got = _edges(spark, pages)
    assert got == {("warc:rec-001", "https://b.ex/y")}
