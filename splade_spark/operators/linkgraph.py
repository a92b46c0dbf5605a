"""Web link graph: href extraction and PageRank over page-to-page edges.

The reference (`hyukkyukang/SPLADE`) ranks purely lexically; a web-scale
corpus engine additionally needs the *graph* plane — which pages link to
which, and a query-independent authority prior (PageRank) to blend into
retrieval or to steer crawl/curation budgets. Both operators here are
Spark-first:

- ``extract_links`` is pure Column work (``regexp_extract_all`` over the
  raw ``html`` column + deterministic URL resolution) — zero shuffle
  until the final ``distinct``; it runs inside whole-stage codegen on the
  same scan that feeds text extraction, so the edge list costs one pass
  over the corpus.
- ``pagerank`` is hash-partitioned power iteration, exactly ONE shuffle
  per iteration for the inflow aggregation (the rank ⋈ edges equi-join on
  the source key hash-partitions both sides; the per-destination sum runs
  map-side partial first). Dangling mass is handled exactly: when the
  graph has sink nodes their rank is redistributed uniformly each pass
  (the per-iteration scalar is skipped entirely for sink-free graphs, so
  fixed-iteration runs on cleaned graphs schedule zero extra actions).

At 10^12 documents the edge list dwarfs the corpus (~50 links/page);
everything here keeps the edge table on the (src) hash partitioning end
to end, labels ride (id, rank) pairs only, and per-iteration lineage is
truncated with lazy ``localCheckpoint`` (the same discipline as
``operators.dedup.connected_components``, whose diameter argument does
NOT apply here — PageRank is fixed-depth by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# href="..." with a double-quoted value; group 1 is the raw target.
# RE2-compatible and byte-identical in DuckDB's regexp_extract_all.
HREF_RE = r'href\s*=\s*"([^"]*)"'


def site_of(url: Column | str) -> Column:
    """``scheme://host`` prefix of an absolute http(s) URL ('' if none)."""
    return F.regexp_extract(url, r"^(https?://[^/]+)", 1)


def resolve_href(href: Column, base_url: Column) -> Column:
    """Resolve one raw href against its page URL; NULL when out of scope.

    Deterministic subset of RFC 3986 resolution, chosen so the DuckDB
    oracle can reproduce it exactly:

    - absolute ``http://`` / ``https://`` targets pass through verbatim
    - root-relative ``/path`` targets resolve against the page's
      ``scheme://host`` — ONLY when the page URL actually has one; a
      page whose own URL is not absolute http(s) has no site prefix, so
      its root-relative hrefs are dropped rather than emitted as
      malformed bare-path nodes
    - everything else (path-relative, fragments, ``mailto:``,
      ``javascript:``, protocol-relative ``//host``) resolves to NULL and
      is dropped — a curation edge list wants unambiguous targets, not
      best-effort guesses.
    """
    t = F.trim(href)
    site = site_of(base_url)
    return (
        F.when(t.rlike("^https?://"), t)
        .when(
            t.startswith("/") & ~t.startswith("//") & (site != ""),
            F.concat(site, t),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def extract_links(
    pages: DataFrame,
    *,
    url_col: str = "url",
    html_col: str = "html",
    keep_self: bool = False,
) -> DataFrame:
    """Distinct page-to-page edges ``(src, dst)`` from raw HTML.

    ``html_col`` may be binary (the corpus contract stores raw bytes) or
    string; bytes are decoded as UTF-8 with replacement via the string
    cast. Self-links are dropped unless ``keep_self``. The extraction is
    a single projection — the shuffle is only the final ``distinct`` on
    the edge key, which downstream ``pagerank`` needs hash-partitioned
    anyway.
    """
    html_str = F.col(html_col).cast("string")
    raw = F.explode(F.regexp_extract_all(html_str, F.lit(HREF_RE), 1))
    edges = (
        pages.select(F.col(url_col).alias("src"), raw.alias("_href"))
        .select("src", resolve_href(F.col("_href"), F.col("src")).alias("dst"))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != ""))
    )
    if not keep_self:
        edges = edges.filter(F.col("dst") != F.col("src"))
    return edges.distinct()


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 20,
    tol: float | None = None,
) -> DataFrame:
    """PageRank over a directed edge list: ``(id, rank)``, ranks sum to 1.

    Standard damped power iteration with exact dangling-mass
    redistribution::

        rank'(v) = (1-d)/n + d * ( Σ_{u→v} rank(u)/outdeg(u)
                                   + dangling_mass/n )

    Node set = every id appearing as source OR destination. Duplicate
    edges collapse first (an edge list from ``extract_links`` is already
    distinct; re-distincting here keeps the operator safe on raw input
    — PageRank semantics count a link once).

    Scale shape: the node table (id, outdeg) is built once and lazily
    checkpointed; each iteration is one equi-join of the current ranks
    with the edge list on the source key followed by a per-destination
    sum with map-side partial aggregation — one shuffle per pass. The
    dangling scalar (an ``agg`` action) is only scheduled when the graph
    actually has sink nodes; ``tol`` adds an L1-delta action per pass for
    early exit, otherwise exactly ``n_iter`` passes run (deterministic —
    the mode the oracle entry pins).

    Iterate-and-checkpoint discipline mirrors
    ``dedup.connected_components``: lazy ``localCheckpoint`` per pass so
    lineage stays O(1) and the ContextCleaner can release old blocks.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    nodes = (
        nodes.join(deg, "id", "left")
        .select("id", "outdeg")
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))
    has_dangling = nodes.filter(F.col("outdeg").isNull()).limit(1).count() > 0
    d = float(damping)
    base = (1.0 - d) / n
    ranks = nodes.select(
        "id", "outdeg", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=False)
    for _ in range(n_iter):
        if has_dangling:
            dangling = (
                ranks.filter(F.col("outdeg").isNull())
                .agg(F.sum("rank"))
                .collect()[0][0]
                or 0.0
            )
        else:
            dangling = 0.0
        inflow = (
            ranks.join(e, ranks["id"] == e["src"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            nodes.join(inflow, "id", "left")
            .select(
                "id",
                "outdeg",
                (
                    F.lit(base)
                    + F.lit(d)
                    * (F.coalesce("inflow", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        if tol is not None:
            delta = (
                new_ranks.select("id", "rank")
                .join(
                    ranks.select("id", F.col("rank").alias("_prev")), "id"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("_prev"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks.select("id", "rank")


# full <a ...>inner</a> elements with a double-quoted href and text-only
# body; RE2-safe and byte-identical in DuckDB
ANCHOR_TAG_RE = r'<a\s[^>]*href\s*=\s*"[^"]*"[^>]*>[^<]*</a>'
ANCHOR_TEXT_RE = r">([^<]*)</a>"


def extract_anchors(
    pages: DataFrame,
    *,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Anchor edges ``(src, dst, anchor)`` — the inner text of every link.

    Unlike :func:`extract_links` this keeps duplicates: the same anchor
    text repeated across many source pages is the signal (anchor-text
    frequency is how link context ranks a target for terms the target
    itself never says). URL resolution matches ``extract_links``
    (absolute / root-relative only); anchors with empty inner text are
    dropped. Pure Column work — one projection, zero shuffle.
    """
    html_str = F.col(html_col).cast("string")
    tag = F.explode(F.regexp_extract_all(html_str, F.lit(ANCHOR_TAG_RE), 0))
    return (
        pages.select(F.col(url_col).alias("src"), tag.alias("_tag"))
        .select(
            "src",
            resolve_href(
                F.regexp_extract("_tag", HREF_RE, 1), F.col("src")
            ).alias("dst"),
            F.trim(F.regexp_extract("_tag", ANCHOR_TEXT_RE, 1)).alias(
                "anchor"
            ),
        )
        .filter(
            F.col("dst").isNotNull()
            & (F.col("dst") != "")
            & (F.col("dst") != F.col("src"))
            & (F.col("anchor") != "")
        )
    )


def enrich_with_anchor_text(
    docs: DataFrame,
    anchors: DataFrame,
    *,
    url_col: str = "url",
    text_col: str = "text",
    weight: int = 1,
) -> DataFrame:
    """Append incoming anchor text to each target document's text field —
    the classic anchor-text enrichment (targets rank for how the web
    DESCRIBES them, not just what they say). Returns ``docs`` with
    ``text_col`` rewritten; docs nothing links to pass through unchanged.

    Deterministic composition: incoming anchors sort lexicographically,
    join on single spaces, and the whole block repeats ``weight`` times
    (an integer field boost — BM25 tf saturates it exactly like any
    repeated term). Feed the result straight to ``build_index``.

    Scale shape: one groupBy on the target URL (map-side combine over
    the anchor stream — the same magnitude as the edge list), then one
    hash equi-join back to the corpus on the URL key. No per-row Python.
    """
    if weight < 1:
        raise ValueError("weight must be >= 1")
    agg = (
        anchors.groupBy(F.col("dst").alias(url_col))
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("anchor")), " "
            ).alias("_atext")
        )
    )
    joined = docs.join(agg, url_col, "left")
    enriched = F.when(
        F.col("_atext").isNotNull(),
        F.concat(
            F.col(text_col),
            F.repeat(F.concat(F.lit(" "), F.col("_atext")), weight),
        ),
    ).otherwise(F.col(text_col))
    return joined.withColumn(text_col, enriched).drop("_atext")
