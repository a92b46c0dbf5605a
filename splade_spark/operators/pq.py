"""Product quantization (PQ) for embedding columns: train per-subspace
codebooks, encode vectors to m-byte codes, and answer top-k via
asymmetric distance computation (ADC).

Engine addition for 100 TB-scale similarity search (no reference
counterpart — the reference is sparse-only): PQ stores an m-code array
(m bytes at k<=256) instead of dim floats — a 32x payload cut at
dim=64/m=8 — and ADC scores documents WITHOUT decompressing: each query
precomputes an (m x k) distance table, a document's approximate squared
L2 distance is the sum of m table lookups.

Determinism contract (mirrors `ann.train_kmeans_centroids`): codebook
seeds are the subvectors of the k lowest-id vectors; Lloyd assignment
breaks ties toward the lower cid; all per-subspace distance sums fold in
coordinate order and per-document ADC sums fold in subspace order, so
results are bit-reproducible across runs, partitionings and engines.
With ``iters=0`` the codebook IS the seed set — closed-form enough for
the DuckDB oracle gate (entry ``pq_adc_topk``); trained codebooks
(iters>0) are pinned by pytest + the recall table in BENCH.md.

Scale shapes:
- training runs on an ``id % sample_mod`` subsample; each Lloyd
  iteration is one broadcast assignment + one (sub, cid) mean shuffle;
- encode explodes each vector into m subvector rows, probes the
  BROADCAST codebook (m*k candidate rows per vector, map-side min via
  struct-min partial aggregation), and regroups on the id — two
  hash-partitioned aggregates, no wide join;
- ADC broadcasts the per-query distance table (n_q * m * k rows) onto
  the exploded code table, so the scan side never shuffles until the
  final (query, doc) sum — whose input is m rows per (query, doc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _subvectors(
    df: DataFrame, *, id_col: str, vec_col: str, m: int, dsub: int
) -> DataFrame:
    """(id, sub, sv: array<double>) — m contiguous subvectors per row."""
    subs = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub")
    return df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")) \
        .select("_id", subs, F.col("_v")) \
        .select(
            "_id",
            "sub",
            F.transform(
                F.slice("_v", F.col("sub") * dsub + 1, dsub),
                lambda x: x.cast("double"),
            ).alias("sv"),
        )


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance between two equal-length double arrays, folded
    in coordinate order (deterministic summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def infer_dim(df: DataFrame, vec_col: str) -> int:
    """Vector width off one row (driver-side single-row job)."""
    row = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not row:
        raise ValueError("empty vector table")
    return int(row[0]["d"])


def train_pq_codebooks(
    vectors: DataFrame,
    *,
    m: int,
    k: int,
    iters: int = 5,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Codebooks (sub, cid, ce: array<double>): per-subspace k-means with
    squared-L2 assignment. ``dim`` must divide by ``m``. ``iters=0``
    returns the deterministic seed codebook (the k lowest-id vectors'
    subvectors) — the oracle-expressible operating point."""
    if dim is None:
        dim = infer_dim(vectors, vec_col)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    train = vectors.select(id_col, vec_col)
    if sample_mod is not None:
        train = train.filter(F.col(id_col) % sample_mod == 0)
    seed_ids = train.orderBy(F.col(id_col).asc()).limit(k)
    sub_seeds = _subvectors(seed_ids, id_col=id_col, vec_col=vec_col, m=m,
                            dsub=dsub)
    w = Window.partitionBy("sub").orderBy(F.col("_id").asc())
    cb = (
        sub_seeds.withColumn("cid", F.row_number().over(w) - 1)
        .select("sub", "cid", F.col("sv").alias("ce"))
        .localCheckpoint(eager=True)
    )
    if iters == 0:
        return cb
    subs = _subvectors(train, id_col=id_col, vec_col=vec_col, m=m,
                       dsub=dsub).localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = (
            subs.join(F.broadcast(cb), "sub")
            .groupBy("_id", "sub")
            .agg(
                F.min(
                    F.struct(_l2sq(F.col("sv"), F.col("ce")).alias("d"),
                             F.col("cid"))
                ).alias("best")
            )
            .select("_id", "sub", F.col("best.cid").alias("cid"))
        )
        means = (
            subs.join(assigned, ["_id", "sub"])
            .select("sub", "cid", F.posexplode("sv").alias("pos", "x"))
            .groupBy("sub", "cid", "pos")
            .agg(F.avg("x").alias("mx"))
            .groupBy("sub", "cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mx")))
                 .alias("pm"))
            .select("sub", "cid",
                    F.transform("pm", lambda s: s["mx"]).alias("new_ce"))
        )
        cb = (
            cb.join(means, ["sub", "cid"], "left")
            .select("sub", "cid", F.coalesce("new_ce", "ce").alias("ce"))
            .localCheckpoint(eager=True)
        )
    return cb


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int,
    dim: int | None = None,
) -> DataFrame:
    """(id_col, codes: array<int>) — per-subspace nearest codeword ids in
    subspace order. Codebook broadcast; min is a struct-min partial
    aggregation (ties toward the lower cid)."""
    if dim is None:
        dim = infer_dim(vectors, vec_col)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    subs = _subvectors(vectors, id_col=id_col, vec_col=vec_col, m=m,
                       dsub=dsub)
    best = (
        subs.join(F.broadcast(codebooks), "sub")
        .groupBy("_id", "sub")
        .agg(
            F.min(
                F.struct(_l2sq(F.col("sv"), F.col("ce")).alias("d"),
                         F.col("cid"))
            ).alias("best")
        )
        .select("_id", "sub", F.col("best.cid").alias("cid"))
    )
    return (
        best.groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "cid")))
             .alias("sc"))
        .select(
            F.col("_id").alias(id_col),
            F.transform("sc", lambda s: s["cid"].cast("int")).alias("codes"),
        )
    )


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    m: int,
    dim: int | None = None,
    exclude_same_id: bool = False,
) -> DataFrame:
    """Top-k by asymmetric distance: (query_id, rank, id_col, dist).

    ``codes`` is the pq_encode output; ``queries`` holds raw vectors.
    Each query's (m x k) distance table is tiny and broadcast; a doc's
    distance is the table-lookup sum folded in subspace order
    (deterministic). Ascending distance, ties toward the lower doc id.
    ``exclude_same_id=True`` drops rows whose doc id equals the query id
    (self-matches when queries are drawn from the corpus).
    """
    if dim is None:
        dim = infer_dim(queries, query_vec_col)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    qsubs = _subvectors(queries, id_col=query_id_col, vec_col=query_vec_col,
                        m=m, dsub=dsub)
    dtab = (
        qsubs.join(F.broadcast(codebooks), "sub")
        .select(
            F.col("_id").alias("_qid"),
            "sub",
            "cid",
            _l2sq(F.col("sv"), F.col("ce")).alias("d"),
        )
    )
    exploded = codes.select(
        F.col(id_col).alias("_doc"),
        F.posexplode("codes").alias("sub", "cid"),
    )
    scored = (
        exploded.join(F.broadcast(dtab), ["sub", "cid"])
        .groupBy("_qid", "_doc")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "d"))).alias("sd"))
        .select(
            "_qid",
            "_doc",
            F.aggregate(
                F.transform("sd", lambda s: s["d"]),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ).alias("dist"),
        )
    )
    if exclude_same_id:
        scored = scored.filter(F.col("_qid") != F.col("_doc"))
    wq = Window.partitionBy("_qid").orderBy(F.asc("dist"), F.asc("_doc"))
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            "rank",
            F.col("_doc").alias(id_col),
            "dist",
        )
    )
