"""Approximate-nearest-neighbor search over dense embedding columns.

The reference (`hyukkyukang/SPLADE`) is a sparse-retrieval engine; these
are the dense-similarity operators a training-data pipeline adds next to
it (brief: similarity search as a first-class component). All paths are
pure Catalyst expressions — `functions.vector.dot` is a zip_with +
aggregate fold, no Python in any hot path — and every scale path replaces
the all-pairs cross join with an equi-join on a bucket/list key:

- ``cosine_topk``: exact brute force — the correctness baseline the
  approximate paths are measured against. Queries broadcast; the corpus
  side never shuffles.
- ``lsh_topk``: sign-bit random-hyperplane LSH. Single-probe, or
  multi-probe over every hamming-1 neighbor bucket (the standard recall
  fix — a neighbor that falls one hyperplane to the other side is found
  in the flipped bucket). Probes stay query-side, so candidates remain
  one equi-join shuffled by bucket id.
- ``ivf_topk``: IVF coarse quantization (FAISS-IVF shape). Centroids are
  broadcast, every vector is assigned to its nearest centroid map-side
  (no shuffle), queries probe their ``nprobe`` nearest lists, and exact
  cosine runs only inside probed lists. Centroid count O(sqrt(N)) keeps
  both sides balanced at scale.
- ``train_kmeans_centroids``: deterministic seeded Lloyd iterations over
  a subsample — the trained coarse quantizer for ``ivf_topk``. Broadcast
  assignment + one groupBy per iteration; never collects vectors beyond
  the k centroids themselves.

All top-k functions return ``(query_id, rank, <id_col>, cos)`` with the
raw double cosine; callers needing hash-stable output round it (the
driver-gated entries emit ``cos_micro``). Ties break by ascending id —
deterministic across partitionings.

``exclude_self`` defaults to "auto": ON when the queries are a predicate
over the vector table itself (a query row trivially retrieves itself at
cos=1), OFF when queries are an external DataFrame — an external id space
can collide with corpus ids by coincidence, and silently dropping those
corpus vectors was a round-3 ADVICE finding. Pass an explicit bool to
override either way.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from splade_spark.functions.vector import dot, l2_norm


def _resolve_exclude_self(exclude_self, queries) -> bool:
    if exclude_self is None:
        return isinstance(queries, Column)
    return bool(exclude_self)


def sign_lsh_bucket(vec_col: Column | str, n_bits: int) -> Column:
    """bigint bucket id from the sign bits of the first ``n_bits`` dims.

    Axis-aligned hyperplanes (no projection matrix to ship, and — because
    it is expressible in ANSI SQL — the DuckDB-portable variant the oracle
    entries pin). On real (non-centered) embeddings axis-aligned planes
    skew bucket balance; production paths should prefer
    ``random_hyperplane_bucket``. Bit i is set iff vec[i] > 0.
    """
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.element_at(vec, i + 1) > 0, F.pow(F.lit(2.0), i).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )


def random_hyperplane_bucket(
    vec_col: Column | str, n_bits: int, dim: int, seed: int = 0
) -> Column:
    """bigint bucket id from ``n_bits`` SEEDED random hyperplanes.

    The projection matrix is drawn once, driver-side, from
    ``numpy.random.RandomState(seed)`` (standard normal — rotation
    invariant, so bucket balance does not depend on the embedding basis
    the way axis-aligned planes do) and embedded as literal arrays: the
    executors evaluate a pure Catalyst dot-product fold per plane, no
    Python, no shipped state beyond the plan itself. Deterministic across
    runs, partitionings, and cluster sizes for a given (n_bits, dim,
    seed). Bit i is set iff vec · plane_i > 0.
    """
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = np.random.RandomState(seed).standard_normal((n_bits, dim))
    bucket = F.lit(0).cast("long")
    for i in range(n_bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(
            proj > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def _rank_topk(cos: DataFrame, k: int, id_col: str) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), id_col, "cos")
    )


def _queries_from(e: DataFrame, queries: DataFrame | Column, id_col: str,
                  vec_col: str) -> DataFrame:
    """Normalize the query side to (query_id, qe, qn).

    ``queries`` is either a predicate Column over the vector table (self-
    query: corpus vectors matching it become the queries) or a DataFrame
    with its own (id, vector) columns.
    """
    if isinstance(queries, Column):
        q = e.filter(queries)
    else:
        q = queries.withColumn("nrm", l2_norm(vec_col))
    return q.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qe"),
        F.col("nrm").alias("qn"),
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame | Column,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k (W6 baseline; F5 dot, W1 top-k).

    Queries broadcast against the corpus: the corpus side stays where its
    scan put it, every executor scores its own slice, and only the
    per-query candidates shuffle into the rank window. Exact — use as the
    recall oracle for the approximate paths.
    """
    e = vectors.select(id_col, vec_col).withColumn("nrm", l2_norm(vec_col))
    q = _queries_from(e, queries, id_col, vec_col)
    pairs = e.crossJoin(F.broadcast(q))
    if _resolve_exclude_self(exclude_self, queries):
        pairs = pairs.filter(F.col(id_col) != F.col("query_id"))
    cos = pairs.select(
        "query_id", id_col,
        (dot("qe", vec_col) / (F.col("qn") * F.col("nrm"))).alias("cos"),
    )
    return _rank_topk(cos, k, id_col)


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame | Column,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_bits: int = 8,
    multiprobe: bool = False,
    exclude_self: bool | None = None,
    hyperplanes: str = "axis",
    dim: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """Sign-bit LSH approximate top-k; optionally multi-probe hamming-1.

    The bucket join replaces the all-pairs cross join: candidates are an
    equi-join on bucket id, which Spark shuffles (or broadcasts the query
    side of) by bucket. With ``multiprobe`` each query also probes its
    ``n_bits`` hamming-1 neighbor buckets — the probe list is query-side
    rows (n_bits+1 per query), so the join shape is unchanged.

    ``hyperplanes``: "axis" (portable sign-bit buckets — the oracle pin)
    or "random" (seeded random projections via
    ``random_hyperplane_bucket`` — better bucket balance on non-centered
    embeddings; requires ``dim``).
    """
    if hyperplanes == "random":
        if dim is None:
            raise ValueError("hyperplanes='random' requires dim")
        bucket_col = random_hyperplane_bucket(vec_col, n_bits, dim, seed)
    elif hyperplanes == "axis":
        bucket_col = sign_lsh_bucket(vec_col, n_bits)
    else:
        raise ValueError(f"hyperplanes must be axis or random, got {hyperplanes!r}")
    e = (
        vectors.select(id_col, vec_col)
        .withColumn("nrm", l2_norm(vec_col))
        .withColumn("bucket", bucket_col)
    )
    if isinstance(queries, Column):
        qsrc = e.filter(queries)
    else:
        qsrc = queries.withColumn("nrm", l2_norm(vec_col)).withColumn(
            "bucket", bucket_col
        )
    q = qsrc.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"),
        F.col("nrm").alias("qn"), F.col("bucket").alias("qb"),
    )
    if multiprobe:
        probes = q.select(
            "query_id", "qe", "qn", "qb",
            F.explode(F.sequence(F.lit(0), F.lit(n_bits))).alias("j"),
        ).select(
            "query_id", "qe", "qn",
            F.when(F.col("j") == 0, F.col("qb"))
            .otherwise(
                F.col("qb").bitwiseXOR(
                    F.pow(F.lit(2.0), F.col("j") - 1).cast("long")
                )
            ).alias("probe"),
        )
    else:
        probes = q.select("query_id", "qe", "qn", F.col("qb").alias("probe"))
    cond = F.col("bucket") == F.col("probe")
    if _resolve_exclude_self(exclude_self, queries):
        cond = cond & (F.col(id_col) != F.col("query_id"))
    cand = e.join(F.broadcast(probes), cond)
    cos = cand.select(
        "query_id", id_col,
        (dot("qe", vec_col) / (F.col("qn") * F.col("nrm"))).alias("cos"),
    )
    return _rank_topk(cos, k, id_col)


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nearest: int = 1,
) -> DataFrame:
    """(id, cid, rn): each vector's ``nearest`` centroids by cosine.

    Centroids broadcast; assignment is map-side (no shuffle) except the
    tiny per-vector rank window. ``centroids`` is (cid, ce).
    """
    e = vectors.select(id_col, vec_col).withColumn("nrm", l2_norm(vec_col))
    cent = centroids.select("cid", "ce").withColumn("cn", l2_norm("ce"))
    acos = e.crossJoin(F.broadcast(cent)).select(
        id_col, "cid",
        (dot(vec_col, "ce") / (F.col("nrm") * F.col("cn"))).alias("cos"),
    )
    wv = Window.partitionBy(id_col).orderBy(F.desc("cos"), F.asc("cid"))
    return (
        acos.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") <= nearest)
        .select(id_col, "cid", "rn")
    )


def train_kmeans_centroids(
    vectors: DataFrame,
    *,
    n_centroids: int,
    iters: int = 5,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic sampled k-means coarse quantizer: (cid, ce).

    Seeding is deterministic (the ``n_centroids`` lowest-id vectors of the
    training sample), so the trained quantizer — and everything downstream
    — is reproducible across runs and cluster sizes. Each Lloyd iteration
    is one broadcast assignment (map-side) plus one groupBy(cid) mean —
    a single shuffle carrying dim doubles per vector. ``sample_mod``
    trains on the ``id % sample_mod == 0`` subsample; quantizer quality
    needs only a sample, not the corpus.

    Empty clusters keep their previous centroid (standard Lloyd fallback)
    so the centroid count never shrinks.
    """
    train = vectors.select(id_col, vec_col)
    if sample_mod is not None:
        train = train.filter(F.col(id_col) % sample_mod == 0)
    train = train.localCheckpoint(eager=True)
    seeds = (
        train.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(F.col(id_col).alias("sid"), F.col(vec_col).alias("ce"))
    )
    w = Window.orderBy(F.col("sid").asc())
    cent = (
        seeds.withColumn("cid", F.row_number().over(w) - 1)
        .select("cid", "ce")
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        a = assign_to_centroids(train, cent, id_col=id_col, vec_col=vec_col)
        means = (
            train.join(a.select(id_col, "cid"), id_col)
            .select("cid", F.col(vec_col).alias("v"))
            .select(
                "cid",
                F.posexplode(F.col("v")).alias("pos", "x"),
            )
            .groupBy("cid", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select("cid", F.transform("pm", lambda s: s["m"]).alias("new_ce"))
        )
        cent = (
            cent.join(means, "cid", "left")
            .select("cid", F.coalesce("new_ce", "ce").alias("ce"))
            .localCheckpoint(eager=True)
        )
    return cent


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame | Column,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
    exclude_self: bool | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe ``nprobe`` centroid lists, exact
    cosine inside them.

    ``centroids`` is (cid, ce) — a deterministic subsample or the output
    of ``train_kmeans_centroids``. Assignment and probing are both
    broadcast map-side; the candidate join shuffles by centroid id only.
    """
    e = vectors.select(id_col, vec_col).withColumn("nrm", l2_norm(vec_col))
    assign = assign_to_centroids(
        vectors, centroids, id_col=id_col, vec_col=vec_col, nearest=1
    ).select(id_col, "cid")
    if isinstance(queries, Column):
        qvecs = vectors.filter(queries)
    else:
        qvecs = queries
    probes = assign_to_centroids(
        qvecs, centroids, id_col=id_col, vec_col=vec_col, nearest=nprobe
    ).select(F.col(id_col).alias("query_id"), "cid")
    cand = probes.join(assign, "cid")
    if _resolve_exclude_self(exclude_self, queries):
        cand = cand.filter(F.col(id_col) != F.col("query_id"))
    cand = cand.select("query_id", id_col)
    q = qvecs.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"),
        l2_norm(vec_col).alias("qn"),
    )
    cos = (
        cand.join(F.broadcast(q), "query_id")
        .join(e, id_col)
        .select(
            "query_id", id_col,
            (dot("qe", vec_col) / (F.col("qn") * F.col("nrm"))).alias("cos"),
        )
    )
    return _rank_topk(cos, k, id_col)
