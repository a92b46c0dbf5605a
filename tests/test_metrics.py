"""Hand-computed metrics example incl. the missed-positive sentinel
(/root/reference/src/model/pl_module/retrieval.py:236-241)."""

import numpy as np

from splade_spark.config import EngineConfig
from splade_spark.operators.metrics import label_results, retrieval_metrics

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
        [("q1", "d1", 2.0), ("q1", "d2", 1.0), ("q1", "d9", 1.0)],
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


def test_metrics_hand_example(spark):
    results, qrels = _dfs(spark)
    got = {(r["metric"], r["k"]): r["value"]
           for r in retrieval_metrics(results, qrels, cfg=CFG).collect()}
    # q1@5: ranks of positives = 1,3,4 (incl. sentinel d9)
    ap_q1 = (1 / 1 + 2 / 3 + 3 / 4) / 3
    dcg_q1 = 3.0 + 0.5 + 1.0 / np.log2(5.0)
    idcg_q1 = 3.0 + 1.0 / np.log2(3.0) + 0.5
    expect = {
        ("HitRate", 1): 0.5, ("MRR", 1): 0.5, ("MAP", 1): 0.5,
        ("Recall", 1): 0.5, ("nDCG", 1): 0.5,
        ("HitRate", 5): 0.5, ("MRR", 5): 0.5,
        ("MAP", 5): ap_q1 / 2, ("Recall", 5): 0.5,
        ("nDCG", 5): dcg_q1 / idcg_q1 / 2,
    }
    for key, want in expect.items():
        assert np.isclose(got[key], want, rtol=1e-9), (key, got[key], want)
