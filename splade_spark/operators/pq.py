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


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted lists + residual product quantization — the
# standard billion-scale ANN index layout (route to nprobe lists, ADC on
# residual codes). Composes train_pq_codebooks(m=1) as the L2 coarse
# quantizer, so the whole stack shares one determinism contract.
# ---------------------------------------------------------------------------


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _assign_coarse(
    vectors: DataFrame, coarse: DataFrame, *, id_col: str, vec_col: str
) -> DataFrame:
    """(id, list_cid, res: array<double>) — nearest coarse centroid by
    squared L2 (ties toward the lower cid) and the residual vector.
    Centroids broadcast; assignment map-side."""
    cents = coarse.select(
        F.col("cid").alias("list_cid"), F.col("ce").alias("_ce")
    )
    cand = vectors.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    ).crossJoin(F.broadcast(cents))
    best = (
        cand.groupBy("_id")
        .agg(
            F.min(
                F.struct(
                    _l2sq(F.col("_v"), F.col("_ce")).alias("d"),
                    F.col("list_cid"),
                    F.col("_v").alias("v"),
                    F.col("_ce").alias("ce"),
                )
            ).alias("b")
        )
    )
    return best.select(
        "_id",
        F.col("b.list_cid").alias("list_cid"),
        F.zip_with("b.v", "b.ce", lambda a, c: a - c).alias("res"),
    )


def train_ivfpq(
    vectors: DataFrame,
    *,
    n_lists: int,
    m: int,
    k: int,
    coarse_iters: int = 3,
    pq_iters: int = 3,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(coarse, codebooks): full-vector L2 k-means (``train_pq_codebooks``
    at m=1 — same seeds/tie rules) for the inverted lists, then PQ
    codebooks trained on the RESIDUALS v − centroid (residual energy is
    what PQ must encode once routing is known — the standard IVF-PQ
    layout)."""
    if dim is None:
        dim = infer_dim(vectors, vec_col)
    coarse = train_pq_codebooks(
        vectors, m=1, k=n_lists, iters=coarse_iters,
        sample_mod=sample_mod, id_col=id_col, vec_col=vec_col, dim=dim,
    ).select("cid", "ce")
    train = vectors
    if sample_mod is not None:
        train = train.filter(F.col(id_col) % sample_mod == 0)
    res = _assign_coarse(train, coarse, id_col=id_col, vec_col=vec_col) \
        .select(F.col("_id").alias(id_col), F.col("res"))
    cb = train_pq_codebooks(
        res, m=m, k=k, iters=pq_iters, id_col=id_col, vec_col="res",
        dim=dim,
    )
    return coarse, cb


def ivfpq_encode(
    vectors: DataFrame,
    coarse: DataFrame,
    codebooks: DataFrame,
    *,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id_col, list_cid, codes): coarse list assignment + PQ codes of
    the residual. This is the persisted index payload: one int + m small
    ints per vector."""
    if dim is None:
        dim = infer_dim(vectors, vec_col)
    assigned = _assign_coarse(vectors, coarse, id_col=id_col,
                              vec_col=vec_col)
    codes = pq_encode(
        assigned.select(F.col("_id").alias(id_col), "res"),
        codebooks, id_col=id_col, vec_col="res", m=m, dim=dim,
    )
    return assigned.select(
        F.col("_id").alias(id_col), "list_cid"
    ).join(codes, id_col)


def ivfpq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    coarse: DataFrame,
    codebooks: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 4,
    m: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    exclude_same_id: bool = False,
) -> DataFrame:
    """Top-k over the IVF-PQ index: each query probes its ``nprobe``
    nearest coarse lists, builds a PER-LIST ADC table over the query's
    residual against that list's centroid, and scores only the codes in
    probed lists. Candidate cost is (nprobe / n_lists) of the corpus —
    the routing prune — and every join is broadcast-driven on the query
    side; the code table never shuffles until the final (query, doc)
    fold. Approximate distance = residual ADC (list-centroid offset
    shared by all docs in a list is not re-added — standard IVF-PQ ADC).
    Ascending distance, ties toward the lower doc id."""
    if dim is None:
        dim = infer_dim(queries, query_vec_col)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    cents = coarse.select(
        F.col("cid").alias("list_cid"), F.col("ce").alias("_ce")
    )
    qc = queries.select(
        F.col(query_id_col).alias("_qid"),
        _as_double(F.col(query_vec_col)).alias("_qv"),
    ).crossJoin(F.broadcast(cents))
    wp = Window.partitionBy("_qid").orderBy(
        F.asc(_l2sq(F.col("_qv"), F.col("_ce"))), F.asc("list_cid")
    )
    probed = (
        qc.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select(
            "_qid", "list_cid",
            F.zip_with("_qv", "_ce", lambda a, c: a - c).alias("_qres"),
        )
    )
    qsub = probed.select(
        "_qid", "list_cid",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        "_qres",
    ).select(
        "_qid", "list_cid", "sub",
        F.slice("_qres", F.col("sub") * dsub + 1, dsub).alias("qsv"),
    )
    dtab = qsub.join(F.broadcast(codebooks), "sub").select(
        "_qid", "list_cid", "sub", "cid",
        _l2sq(F.col("qsv"), F.col("ce")).alias("d"),
    )
    exploded = encoded.select(
        F.col(id_col).alias("_doc"), "list_cid",
        F.posexplode("codes").alias("sub", "cid"),
    )
    scored = (
        exploded.join(F.broadcast(dtab), ["list_cid", "sub", "cid"])
        .groupBy("_qid", "_doc")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "d"))).alias("sd"))
        .select(
            "_qid", "_doc",
            F.aggregate(
                F.transform("sd", lambda s: s["d"]),
                F.lit(0.0), lambda acc, d: acc + d,
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
            F.col("_qid").alias(query_id_col), "rank",
            F.col("_doc").alias(id_col), "dist",
        )
    )
