"""Retrieval metrics over (results ⋈ qrels) — pure SQL aggregations.

Reproduces the reference's evaluation semantics
(/root/reference/src/metric/retrieval.py:13,59-78 and
/root/reference/src/model/pl_module/retrieval.py:222-258):

- label join with 0 default for unjudged docs (J4)
- **missed-positive sentinel**: qrels positives NOT retrieved are appended
  with score = min(retrieved score) − 1.0 so Recall/nDCG see them (J5/F8,
  /root/reference/src/model/pl_module/retrieval.py:236-241)
- metrics at k ∈ k_list: HitRate, MRR, MAP, Recall, nDCG
  (cutoffs from /root/reference/config/testing/_base.yaml:19)

The reference's cross-rank all_gather (metric/retrieval.py:88-188) is
unnecessary — a groupBy is already cluster-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import DEFAULT, EngineConfig


def label_results(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """results (query_id, rank, doc_id, score) × qrels (query_id, doc_id,
    relevance) → labeled rows incl. missed positives at min_score − 1,
    re-ranked by (score desc, doc_id asc)."""
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
        .join(min_scores, "query_id")  # queries with no results drop out, as in ref
        .select("query_id", "doc_id", F.col("_sentinel").alias("score"), "relevance")
    )
    full = labeled.unionByName(missed)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return full.withColumn("rank", F.row_number().over(w))


def retrieval_metrics(
    results: DataFrame, qrels: DataFrame, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """→ (metric string, k int, value double), averaged over queries."""
    ranked = label_results(results, qrels).cache()
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
                # DCG with gain 2^rel − 1
                F.sum(
                    (F.pow(F.lit(2.0), F.col("relevance")) - 1.0)
                    / F.log2(F.col("rank") + 1.0)
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
        # ideal DCG: relevances sorted desc, top k
        wi = Window.partitionBy("query_id").orderBy(F.desc("relevance"))
        idcg = (
            ranked.filter(F.col("relevance") > 0)
            .withColumn("irank", F.row_number().over(wi))
            .filter(F.col("irank") <= k)
            .groupBy("query_id")
            .agg(
                F.sum(
                    (F.pow(F.lit(2.0), F.col("relevance")) - 1.0)
                    / F.log2(F.col("irank") + 1.0)
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
                F.when(F.col("n_pos") > 0, F.col("n_hits") / F.least(F.col("n_pos"), F.lit(float(k))))
                .otherwise(0.0).alias("recall"),
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
