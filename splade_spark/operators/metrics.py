"""Retrieval metrics over (results ⋈ qrels) — pure SQL aggregations.

Reproduces the reference's evaluation semantics
(/root/reference/src/metric/retrieval.py:13,59-78 and
/root/reference/src/model/pl_module/retrieval.py:222-258), which feed
torchmetrics Retrieval* collections:

- label join with 0 default for unjudged docs (J4)
- **missed-positive sentinel**: qrels positives NOT retrieved are appended
  with score = min(retrieved score) − 1.0 so Recall/nDCG see them (J5/F8,
  /root/reference/src/model/pl_module/retrieval.py:236-241). A query with
  positives but ZERO results is kept — the reference sets min_score = 0.0
  there and still appends its positives at −1.0 (retrieval.py:236-241);
  only queries with no results AND no positives drop out
  (retrieval.py:242-243).
- metrics at k ∈ k_list (cutoffs /root/reference/config/testing/_base.yaml:19):
  HitRate, MRR, MAP, Recall, nDCG with torchmetrics semantics —
  Recall@k = hits-in-top-k / TOTAL relevant (RetrievalRecall),
  MAP@k normalized by min(k, total relevant) (RetrievalMAP),
  nDCG with LINEAR gain rel / log2(rank+1) (RetrievalNormalizedDCG).

The reference's cross-rank all_gather (metric/retrieval.py:88-188) is
unnecessary — a groupBy is already cluster-wide.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import DEFAULT, EngineConfig


def label_results(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """results (query_id, rank, doc_id, score) × qrels (query_id, doc_id,
    relevance) → labeled rows incl. missed positives at min_score − 1
    (−1.0 for queries with no results, matching the reference's
    min_score = 0.0 default), re-ranked by (score desc, doc_id asc)."""
    labeled = results.join(
        qrels, ["query_id", "doc_id"], "left"
    ).select(
        "query_id", "doc_id", "score",
        F.coalesce(F.col("relevance"), F.lit(0.0)).alias("relevance"),
    )
    min_scores = results.groupBy("query_id").agg(
        (F.min("score") - F.lit(1.0)).alias("_sentinel")
    )
    missed = (
        qrels.filter(F.col("relevance") > 0)
        .join(results.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_anti")
        # left join: queries with positives but no results keep their rows
        # at the reference's 0.0 − 1.0 sentinel (retrieval.py:236-241)
        .join(min_scores, "query_id", "left")
        .select(
            "query_id", "doc_id",
            F.coalesce(F.col("_sentinel"), F.lit(-1.0)).alias("score"),
            "relevance",
        )
    )
    full = labeled.unionByName(missed)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return full.withColumn("rank", F.row_number().over(w))


def retrieval_metrics(
    results: DataFrame, qrels: DataFrame, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """→ (metric string, k int, value double), averaged over queries.

    The labeled ranking is localCheckpoint-ed (computed once, reused by
    every cutoff's aggregation) instead of cache()-d: the ContextCleaner
    releases the blocks when the result goes out of scope, so repeated
    metric runs in a long-lived session don't accumulate cached plans."""
    ranked = label_results(results, qrels).localCheckpoint(eager=True)
    n_pos = ranked.filter(F.col("relevance") > 0).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_pos")
    )

    out = None
    for k in cfg.k_list:
        topk = ranked.filter(F.col("rank") <= k)
        per_q = (
            topk.groupBy("query_id")
            .agg(
                F.max((F.col("relevance") > 0).cast("double")).alias("hit"),
                F.sum((F.col("relevance") > 0).cast("double")).alias("n_hits"),
                # MRR: 1/rank of first positive
                F.max(
                    F.when(F.col("relevance") > 0, 1.0 / F.col("rank")).otherwise(0.0)
                ).alias("mrr"),
                # DCG with LINEAR gain rel / log2(rank+1) — torchmetrics
                # RetrievalNormalizedDCG semantics
                F.sum(
                    F.col("relevance") / F.log2(F.col("rank") + 1.0)
                ).alias("dcg"),
            )
        )
        # precision@i at each hit position → AP
        w = Window.partitionBy("query_id").orderBy("rank")
        ap = (
            topk.withColumn(
                "cum_hits", F.sum((F.col("relevance") > 0).cast("double")).over(w)
            )
            .filter(F.col("relevance") > 0)
            .groupBy("query_id")
            .agg(F.sum(F.col("cum_hits") / F.col("rank")).alias("ap_sum"))
        )
        # ideal DCG: relevances sorted desc, top k (linear gain)
        wi = Window.partitionBy("query_id").orderBy(F.desc("relevance"))
        idcg = (
            ranked.filter(F.col("relevance") > 0)
            .withColumn("irank", F.row_number().over(wi))
            .filter(F.col("irank") <= k)
            .groupBy("query_id")
            .agg(
                F.sum(
                    F.col("relevance") / F.log2(F.col("irank") + 1.0)
                ).alias("idcg")
            )
        )
        per_q = (
            per_q.join(n_pos, "query_id", "left")
            .join(ap, "query_id", "left")
            .join(idcg, "query_id", "left")
            .select(
                "query_id",
                F.col("hit"),
                F.col("mrr"),
                # Recall@k = hits / TOTAL relevant (torchmetrics
                # RetrievalRecall — the sentinel rows put every positive
                # in n_pos)
                F.when(F.col("n_pos") > 0, F.col("n_hits") / F.col("n_pos"))
                .otherwise(0.0).alias("recall"),
                # MAP@k normalized by min(k, total relevant) — torchmetrics
                # RetrievalMAP
                F.when(
                    F.col("n_pos") > 0,
                    F.coalesce(F.col("ap_sum"), F.lit(0.0))
                    / F.least(F.col("n_pos"), F.lit(float(k))),
                ).otherwise(0.0).alias("map"),
                F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
                .otherwise(0.0).alias("ndcg"),
            )
        )
        metr = per_q.agg(
            F.avg("hit").alias("HitRate"),
            F.avg("mrr").alias("MRR"),
            F.avg("map").alias("MAP"),
            F.avg("recall").alias("Recall"),
            F.avg("ndcg").alias("nDCG"),
        ).selectExpr(
            "stack(5, 'HitRate', HitRate, 'MRR', MRR, 'MAP', MAP, "
            "'Recall', Recall, 'nDCG', nDCG) as (metric, value)"
        ).withColumn("k", F.lit(k))
        out = metr if out is None else out.unionByName(metr)
    return out.select("metric", "k", "value")


def write_metrics_json(metrics: DataFrame, path: str) -> dict:
    """S12 metrics JSON sink (reference script/evaluate.py:254-258 writes
    the metrics dict as one JSON file from the driver): collect the tiny
    (metric, k, value) result and dump ``{"<metric>@<k>": value}``.
    Returns the dict."""
    out = {
        f"{r['metric']}@{r['k']}": float(r["value"])
        for r in metrics.collect()
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    return out
