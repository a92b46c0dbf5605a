"""Near-duplicate candidate generation for web-scale corpora.

The reference (`hyukkyukang/SPLADE`) has no dedup stage — these are the
LLM-training-data operators the engine adds as first-class components,
designed Spark-first: shingle -> minhash -> band -> bucket equi-join, so
candidate generation is one hash-partitioned shuffle on the band bucket
key, never an all-pairs comparison.

Two hash families ship:

- ``xxhash64`` (production default): one JVM hash call per (shingle, seed)
  and per band signature, 64-bit output, stays fully inside whole-stage
  codegen — the scale path.
- ``md5`` (oracle-portable): string md5 reproducible bit-for-bit in DuckDB;
  the driver-gated `minhash_band_pairs` entry query is this operator pinned
  at (n_hashes=8, rows_per_band=2, hash_fn="md5").

Scale guard: `bucket_cap` keeps band buckets holding more than `cap` docs
OUT of the quadratic self-join. A giant bucket is boilerplate (licence
headers, navigation chrome) whose pair-count grows quadratically; at
100 TB one such bucket would dominate the whole job. Over-cap bucket
members are NOT discarded (a round-3 finding): they are routed through a
dedicated linear grouping pass — docs whose FULL minhash signature is
identical form a group, emitted as star edges to the group's min id —
so a 5,000-doc boilerplate family still resolves to one cluster at
O(n) edges instead of O(n^2) pairs. Members of an over-cap bucket whose
full signatures differ can still pair through their other (under-cap)
bands; only the over-cap bucket itself is exempted from pairing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def shingles_col(text_col: Column | str, n: int = 3) -> Column:
    """array<string> of word n-gram shingles (pure JVM Column).

    Guarded: Spark's sequence(1, 0) counts DOWN, so docs shorter than n
    tokens get an explicit empty array.
    """
    from splade_spark.functions.tokenize import tokens_col

    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda j: F.concat_ws(
            " ", *[F.element_at(toks, j + off) for off in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 128,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, i, h): the i-th minhash of each doc's shingle set.

    One row per doc per hash seed; `h` is string for md5, bigint for
    xxhash64. The (shingle x seed) expansion is a broadcast crossJoin with
    a tiny seed dimension followed by a (doc, i) min-aggregate — partial
    aggregation runs map-side, so the shuffle carries n_hashes rows per
    doc, not n_hashes x n_shingles.
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"hash_fn must be xxhash64 or md5, got {hash_fn!r}")
    dt = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_col(text_col, n=shingle_n)).alias("term"),
    ).distinct()
    hi = (
        docs.sparkSession.range(n_hashes)
        .select(F.col("id").cast("int").alias("i"))
    )
    if hash_fn == "xxhash64":
        hv = F.xxhash64("term", F.col("i"))
    else:
        hv = F.md5(F.concat_ws(":", "term", F.col("i").cast("string")))
    return (
        dt.crossJoin(F.broadcast(hi))
        .select("id", "i", hv.alias("hv"))
        .groupBy("id", "i")
        .agg(F.min("hv").alias("h"))
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 128,
    rows_per_band: int = 4,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
    bucket_cap: int | None = 1000,
) -> DataFrame:
    """MinHash + LSH near-duplicate candidate pairs (doc_a, doc_b).

    Banding: n_bands = n_hashes / rows_per_band; two docs become a
    candidate pair iff at least one band signature collides. Jaccard
    similarity s collides per band with probability s^rows_per_band, so
    the candidate-recall curve is 1 - (1 - s^r)^b — pick (r, b) for the
    corpus' similarity target instead of hardcoding toy widths.

    Docs whose ids compare equal are never paired; output is the distinct
    set with doc_a < doc_b (ids compared in their column's natural order).
    """
    if n_hashes % rows_per_band != 0:
        raise ValueError(
            f"n_hashes ({n_hashes}) must be a multiple of rows_per_band "
            f"({rows_per_band})"
        )
    mh = minhash_signatures(
        docs,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        shingle_n=shingle_n,
        hash_fn=hash_fn,
    )
    sig = F.transform(
        F.sort_array(F.collect_list(F.struct("i", "h"))), lambda s: s["h"]
    )
    if hash_fn == "xxhash64":
        bh = F.xxhash64(sig)
    else:
        bh = F.md5(F.array_join(sig, "|"))
    bands = (
        mh.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(bh.alias("bh"))
        # materialized eagerly so the self-join reads computed bands once
        # instead of recomputing the shingle -> minhash pipeline per join
        # side; localCheckpoint (vs persist) truncates lineage AND lets the
        # ContextCleaner release the blocks when the result goes out of
        # scope — repeated calls no longer accumulate session-lifetime
        # cached plans
        .localCheckpoint(eager=True)
    )
    star_pairs = None
    if bucket_cap is not None:
        bcounts = bands.groupBy("band", "bh").agg(
            F.count(F.lit(1)).alias("n")
        )
        over = bcounts.filter(F.col("n") > bucket_cap).select("band", "bh")
        ok = bcounts.filter(F.col("n") <= bucket_cap).select("band", "bh")
        # boilerplate pass: members of over-cap buckets group by their FULL
        # minhash signature (hash over all band hashes, band-ordered) —
        # identical signatures are near-identical docs by construction, and
        # star edges to the group's min id keep the edge count linear
        over_ids = (
            bands.join(over, ["band", "bh"], "left_semi")
            .select("id").distinct()
        )
        sig_parts = F.transform(
            F.sort_array(F.collect_list(F.struct("band", "bh"))),
            lambda s: s["bh"].cast("string"),
        )
        fullsig = (
            bands.join(over_ids, "id", "left_semi")
            .groupBy("id")
            .agg(F.md5(F.array_join(sig_parts, "|")).alias("sig"))
        )
        heads = fullsig.groupBy("sig").agg(F.min("id").alias("doc_a"))
        star_pairs = (
            fullsig.join(heads, "sig")
            .filter(F.col("id") != F.col("doc_a"))
            .select("doc_a", F.col("id").alias("doc_b"))
        )
        bands = bands.join(ok, ["band", "bh"], "left_semi")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh")),
        )
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
    )
    if star_pairs is not None:
        pairs = pairs.unionByName(star_pairs)
    return pairs.distinct()


def connected_components(
    pairs: DataFrame,
    *,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over candidate pairs: ``(id, cluster_id)`` with
    ``cluster_id`` = the minimum node id in the component.

    Iterative hash-partitioned min-label propagation — no graph-library
    dependency. Each iteration is ONE shuffle: propagate every node's
    current label across its edges (a hash join on the edge endpoint),
    then take the per-node min (partial aggregation runs map-side).
    Convergence is an EXACT changed-row count that is id-type agnostic
    (numeric doc_idx, URL strings, uuids — anything orderable): each
    node's previous label rides the same union/groupBy shuffle as a
    ``min(when(self))`` side-aggregate, so ``count(label != old)`` needs
    no extra join and no numeric cast. (An earlier revision summed labels
    CAST to DECIMAL(38,0); on string ids that cast crashes under ANSI
    mode and silently yields NULL==NULL "convergence" without it.)

    Each iteration's labels are localCheckpoint-ed: lineage would otherwise
    grow linearly with iterations and re-execute the whole history on every
    convergence check. Iterations needed = component diameter; dedup
    clusters (boilerplate families, mirror sets) have small diameters, so
    this converges in a handful of passes. Raises RuntimeError if
    ``max_iter`` passes don't converge rather than returning a partial
    clustering.

    Only nodes that appear in ``pairs`` get a row — join the result back to
    the corpus (see ``dedup_drop_list``) to give singletons their identity
    cluster.
    """
    # lazy localCheckpoints: the changed-count below is the single FULL
    # action per iteration and materializes the checkpoint as it runs —
    # one Spark job per propagation round, not two
    edges = (
        pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(pairs.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        nbr = edges.join(
            labels.withColumnRenamed("id", "a"), "a"
        ).select(F.col("b").alias("id"), "label", F.lit(False).alias("_self"))
        new_labels = (
            labels.select("id", "label", F.lit(True).alias("_self"))
            .unionByName(nbr)
            .groupBy("id")
            .agg(
                F.min("label").alias("label"),
                # every id has exactly one self row (labels ids are unique),
                # so this min IS the previous label
                F.min(F.when(F.col("_self"), F.col("label"))).alias("_old"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            return labels.select("id", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def dedup_drop_list(
    docs: DataFrame,
    clusters: DataFrame,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Resolve clusters to a per-doc drop list: ``(doc_id, cluster_id,
    keep)``.

    Every corpus doc gets a row: docs absent from ``clusters`` (singletons
    — never a near-dup candidate) keep themselves with their own id as
    cluster. The survivor rule is deterministic: the cluster's canonical
    doc is its minimum ``doc_id`` (exactly the component label), so
    ``keep = (doc_id == cluster_id)`` — one survivor per cluster,
    reproducible across runs and cluster sizes. Downstream, the training
    pipeline keeps ``keep`` rows and drops the rest.

    The join is a plain hash equi-join on ``doc_id``; ``clusters`` (nodes
    that appeared in a candidate pair) is usually a small fraction of the
    corpus, so Catalyst/AQE broadcasts it when it fits.
    """
    c = clusters.withColumnRenamed("id", id_col)
    return (
        docs.select(id_col)
        .join(c, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )


def deduplicate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 128,
    rows_per_band: int = 4,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
    bucket_cap: int | None = 1000,
    max_iter: int = 50,
) -> DataFrame:
    """End-to-end near-dedup: candidates -> components -> drop list.

    ``minhash_lsh_candidates`` (bucketed pair generation, never all-pairs)
    -> ``connected_components`` (min-label propagation) ->
    ``dedup_drop_list`` (deterministic min-id survivor per cluster).
    Returns ``(doc_id, cluster_id, keep)`` covering every input doc.
    """
    pairs = minhash_lsh_candidates(
        docs,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        rows_per_band=rows_per_band,
        shingle_n=shingle_n,
        hash_fn=hash_fn,
        bucket_cap=bucket_cap,
    )
    cc = connected_components(pairs, max_iter=max_iter)
    return dedup_drop_list(docs, cc, id_col=id_col)


def embedding_near_dup_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    threshold: float = 0.7,
    hyperplanes: str = "axis",
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale: bucket vectors by
    sign-LSH, score cosine ONLY within a bucket, keep pairs at or above
    ``threshold``. Returns (id_a, id_b, cos) with id_a < id_b.

    This is the production counterpart of the brute-force all-pairs demo
    (entry ``embedding_near_dup``): the self-join is an equi-join on the
    bucket key — one hash-partitioned shuffle, never a cross join — so
    pair-generation cost follows bucket occupancy, not corpus size
    squared. Recall follows the LSH collision bound: a pair at cosine c
    lands in the same bucket with probability (1 - acos(c)/pi)^n_bits;
    near-dup thresholds (c >= 0.9) keep that high at 8 bits, and banding
    over independent bucket functions recovers the rest if needed
    (run with several ``seed`` values and union the pairs).

    ``hyperplanes``: "axis" (first n_bits coordinates — portable to the
    DuckDB oracle bit-for-bit) or "random" (seeded hash-derived
    projections from ``operators.ann.random_hyperplane_bucket``, which
    needs the vector width ``dim`` — the production pick for anisotropic
    embeddings).
    """
    from splade_spark.operators.ann import (
        random_hyperplane_bucket,
        sign_lsh_bucket,
    )

    if hyperplanes == "random":
        if dim is None:
            raise ValueError("hyperplanes='random' needs dim= (vector width)")
        bucket = random_hyperplane_bucket(
            F.col(vec_col), n_bits, dim, seed=seed
        )
    elif hyperplanes == "axis":
        bucket = sign_lsh_bucket(F.col(vec_col), n_bits)
    else:
        raise ValueError(f"unknown hyperplanes {hyperplanes!r}")
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, p: acc + p,
    )
    e = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        bucket.alias("_bucket"),
    ).withColumn("_nrm", F.sqrt(dot(F.col("_v"), F.col("_v"))))
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a._bucket") == F.col("b._bucket"))
        & (F.col("a._id") < F.col("b._id")),
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        (
            dot(F.col("a._v"), F.col("b._v"))
            / (F.col("a._nrm") * F.col("b._nrm"))
        ).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= threshold)


def duplicate_span_removal(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exact-substring dedup (the Lee et al. 2021 "deduplicating training
    data" operator): any ``window``-token span occurring MORE THAN ONCE
    corpus-wide is removed from every occurrence except the canonical
    first one (lowest (doc id, position)); surviving tokens rebuild the
    document. Returns (id_col, n_tokens, n_removed, text).

    Mechanics: rolling token windows (stride 1) are hashed; occurrences
    of the same hash are ranked by (doc id, position) with a window
    function — rank 1 is canonical and kept, every later occurrence
    marks its ``window`` token positions for removal; covered positions
    union (handling overlaps of long repeated spans, which produce
    many overlapping duplicated windows) and the kept tokens re-join.

    Spans repeated WITHIN one doc dedup too (second occurrence removed);
    docs shorter than ``window`` pass through untouched; a doc that is an
    exact duplicate of an earlier doc is scrubbed to nothing (its every
    window loses to the canonical doc).

    Scale shape: the window-hash table is ~one row per token — the same
    magnitude as an inverted-index build's posting stream — shuffled
    once by hash for the occurrence ranking (md5/xxhash keys are
    uniform, no skew), once by (doc, position) for coverage distinct +
    the kept-token anti join, and once by doc for the rebuild. All
    hash-partitioned sort/agg exchanges with map-side combine; nothing
    quadratic anywhere (contrast suffix arrays, which need a global
    sort of every suffix).

    ``hash_fn``: "xxhash64" (production: 8-byte keys, fully codegen) or
    "md5" (bit-portable to the DuckDB oracle).
    """
    from splade_spark.functions.tokenize import tokens_col
    from pyspark.sql.window import Window as W

    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    L = int(window)
    if L < 2:
        raise ValueError("window must be >= 2")
    t = docs.select(
        F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks")
    )
    joined = lambda p: F.array_join(  # noqa: E731
        F.slice("_toks", p, L), " "
    )
    hashed = (
        (lambda p: F.xxhash64(joined(p))) if hash_fn == "xxhash64"
        else (lambda p: F.md5(joined(p)))
    )
    starts = F.when(
        F.size("_toks") >= L,
        F.sequence(F.lit(1), F.size("_toks") - L + 1),
    ).otherwise(F.array().cast("array<int>"))
    wtab = t.select("_id", "_toks", F.explode(starts).alias("_p")) \
        .select("_id", "_p", hashed(F.col("_p")).alias("_h"))
    occ = W.partitionBy("_h").orderBy(F.asc("_id"), F.asc("_p"))
    dup = (
        wtab.withColumn("_rn", F.row_number().over(occ))
        .filter(F.col("_rn") >= 2)
        .select("_id", "_p")
    )
    covered = dup.select(
        "_id", F.explode(F.sequence(F.col("_p"), F.col("_p") + L - 1))
        .alias("_tp")
    ).distinct()
    # mark covered positions with a LEFT join (not an anti join) so a
    # fully-scrubbed doc still aggregates to an empty-text row
    toks = t.select(
        "_id", F.size("_toks").alias("_n"),
        F.posexplode_outer("_toks").alias("_tp0", "_tok"),
    ).withColumn("_tp", F.col("_tp0") + 1)
    marked = toks.join(
        covered.withColumn("_cov", F.lit(True)), ["_id", "_tp"], "left"
    ).withColumn(
        "_keep", F.col("_tok").isNotNull() & F.col("_cov").isNull()
    )
    return (
        marked.groupBy("_id")
        .agg(
            F.max("_n").alias("_n"),
            F.sum(F.col("_keep").cast("long")).alias("_nk"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(
                                F.struct("_tp", "_tok", "_keep")
                            )
                        ),
                        lambda s: s["_keep"],
                    ),
                    lambda s: s["_tok"],
                ),
                " ",
            ).alias("text"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_n").cast("bigint").alias("n_tokens"),
            (F.col("_n") - F.col("_nk")).cast("bigint").alias("n_removed"),
            "text",
        )
    )
