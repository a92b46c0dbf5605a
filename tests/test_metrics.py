"""Hand-computed metrics example incl. the missed-positive sentinel
(/root/reference/src/model/pl_module/retrieval.py:236-241) and the
zero-result-query case (reference min_score = 0.0 default → sentinel −1.0),
with torchmetrics semantics: linear-gain nDCG, Recall = hits / total
relevant, MAP normalized by min(k, total relevant)."""

import json

import numpy as np

from splade_spark.config import EngineConfig
from splade_spark.operators.metrics import (
    label_results,
    retrieval_metrics,
    write_metrics_json,
)

CFG = EngineConfig(k_list=(1, 5))


def _dfs(spark):
    results = spark.createDataFrame(
        [
            ("q1", 1, "d1", 5.0), ("q1", 2, "d3", 4.0), ("q1", 3, "d2", 3.0),
            ("q2", 1, "d5", 1.0),
        ],
        "query_id string, rank int, doc_id string, score float",
    )
    qrels = spark.createDataFrame(
        [("q1", "d1", 2.0), ("q1", "d2", 1.0), ("q1", "d9", 1.0),
         # q3 has a positive but retrieved NOTHING — must still contribute
         ("q3", "d7", 1.0)],
        "query_id string, doc_id string, relevance double",
    )
    return results, qrels


def test_sentinel_rank(spark):
    results, qrels = _dfs(spark)
    ranked = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"])
              for r in label_results(results, qrels).collect()}
    # missed positive d9 appended at min(5,4,3) - 1 = 2.0 → rank 4
    assert ranked[("q1", "d9")] == (4, 2.0)
    assert ranked[("q1", "d1")][0] == 1
    # zero-result query: reference min_score = 0.0 → sentinel 0.0 - 1.0
    assert ranked[("q3", "d7")] == (1, -1.0)


def test_metrics_hand_example(spark):
    results, qrels = _dfs(spark)
    got = {(r["metric"], r["k"]): r["value"]
           for r in retrieval_metrics(results, qrels, cfg=CFG).collect()}
    # q1@5: ranks of positives = 1,3,4 (incl. sentinel d9); n_pos = 3
    ap_q1 = (1 / 1 + 2 / 3 + 3 / 4) / 3
    dcg_q1 = 2.0 + 1.0 / np.log2(4.0) + 1.0 / np.log2(5.0)  # linear gain
    idcg_q1 = 2.0 + 1.0 / np.log2(3.0) + 1.0 / np.log2(4.0)
    # q2: no positives → 0 everywhere. q3: its only row IS its positive
    # (sentinel −1.0, rank 1) → 1.0 everywhere (reference torchmetrics
    # behavior for zero-result queries).
    expect = {
        ("HitRate", 1): 2 / 3, ("MRR", 1): 2 / 3, ("MAP", 1): 2 / 3,
        ("Recall", 1): (1 / 3 + 0 + 1) / 3, ("nDCG", 1): 2 / 3,
        ("HitRate", 5): 2 / 3, ("MRR", 5): 2 / 3,
        ("MAP", 5): (ap_q1 + 0 + 1) / 3, ("Recall", 5): 2 / 3,
        ("nDCG", 5): (dcg_q1 / idcg_q1 + 0 + 1) / 3,
    }
    for key, want in expect.items():
        assert np.isclose(got[key], want, rtol=1e-9), (key, got[key], want)


def test_metrics_json_sink(spark, tmp_path):
    """S12: the metrics JSON sink writes the reference's flat dict shape
    (script/evaluate.py:254-258)."""
    results, qrels = _dfs(spark)
    path = str(tmp_path / "metrics.json")
    out = write_metrics_json(retrieval_metrics(results, qrels, cfg=CFG), path)
    with open(path) as f:
        on_disk = json.load(f)
    assert on_disk == out
    assert set(out) == {
        f"{m}@{k}" for m in ("HitRate", "MRR", "MAP", "Recall", "nDCG")
        for k in (1, 5)
    }
    assert np.isclose(on_disk["HitRate@1"], 2 / 3)


def test_eval_harness_strategy_parity(spark):
    """Round-3 verdict item 8: the NanoBEIR-style harness reports
    identical metrics AND identical rankings across wand / exhaustive /
    served — the three retrieval surfaces' exactness contract, checked
    end-to-end through the metrics layer."""
    from pyspark.sql import functions as F

    from splade_spark.evaluate import evaluate_retrieval
    from splade_spark.fixtures import gen_pages, gen_qrels, gen_queries

    pages = gen_pages(150, seed=77)
    queries = gen_queries(20, pages, seed=78)
    qrels = gen_qrels(queries, pages, seed=79)
    docs = spark.createDataFrame(pages[["url", "text"]]).select(
        F.col("url").alias("doc_id"), "text"
    )
    report = evaluate_retrieval(
        spark,
        docs,
        spark.createDataFrame(queries[["query_id", "text"]]),
        spark.createDataFrame(qrels),
        cfg=EngineConfig(block_size=64, index_partitions=4, k_list=(1, 5, 10)),
        n_shards=3,
    )
    assert report["parity"] == {"wand==exhaustive": True, "wand==served": True}
    m = report["metrics"]
    assert m["wand"] == m["exhaustive"] == m["served"]
    # sanity: fixture queries are drawn from documents, so retrieval works
    assert 0.0 < m["wand"]["nDCG@10"] <= 1.0
    assert 0.0 < m["wand"]["HitRate@10"] <= 1.0
    assert m["wand"]["MRR@1"] <= m["wand"]["MRR@10"]
