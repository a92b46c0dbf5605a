"""Resumable build: per-partition lineage checkpoints (checkpoint.py).

Simulates a crash-and-restart: encode part of the corpus, "lose" the rest,
restart — the second run must skip committed buckets, and the final index
must equal a direct single-shot build_index result exactly.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from splade_spark.config import EngineConfig
from splade_spark.fixtures import gen_pages
from splade_spark.operators.checkpoint import (
    build_index_from_shards,
    committed_buckets,
    encode_corpus_resumable,
    read_build_log,
)
from splade_spark.operators.indexing import build_index

N_DOCS = 200
N_BUCKETS = 8
CFG = EngineConfig(block_size=64, index_partitions=4)


@pytest.fixture(scope="module")
def docs_df(spark):
    pages = gen_pages(N_DOCS, seed=42)
    return spark.createDataFrame(pages[["url", "text"]]).select(
        F.col("url").alias("doc_id"), "text"
    ).persist()


def _postings_long(idx):
    """Decode the compressed postings back to (term, doc_id, weight) rows
    for comparison (layout-independent)."""
    from splade_spark.functions.codec import decode_block

    rows = []
    term_names = {r["term_id"]: r["term"] for r in idx.term_dict.collect()}
    doc_names = {r["doc_idx"]: r["doc_id"] for r in idx.doc_dim.collect()}
    for r in idx.postings.collect():
        d, w = decode_block(r["doc_gaps"], r["weights"])
        for di, wi in zip(d, w):
            rows.append((term_names[r["term_id"]], doc_names[int(di)], float(wi)))
    return sorted(rows)


def test_resume_skips_committed_and_matches_direct(spark, docs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt"))

    # --- run 1: "crash" after only half the corpus was visible ------------
    half = docs_df.filter(F.pmod(F.xxhash64("doc_id"), N_BUCKETS) < 4)
    s1 = encode_corpus_resumable(half, out, n_buckets=N_BUCKETS, cfg=CFG)
    # buckets 4..7 were committed EMPTY (their docs were not in the input),
    # exactly like a partition whose input went missing mid-build — drop
    # their commit records to model the crash
    log = read_build_log(spark, out).filter(F.col("doc_count") > 0)
    rows = log.collect()
    import shutil, os

    shutil.rmtree(os.path.join(out, "build_log"))
    spark.createDataFrame(rows, schema=log.schema).write.parquet(
        os.path.join(out, "build_log")
    )
    done_after_crash = committed_buckets(spark, out)
    assert set(done_after_crash) == {r["bucket"] for r in rows} == set(range(4))

    # --- run 2: restart with the FULL corpus ------------------------------
    s2 = encode_corpus_resumable(docs_df, out, n_buckets=N_BUCKETS, cfg=CFG)
    assert sorted(s2["skipped_buckets"]) == sorted(done_after_crash)
    assert sorted(s2["processed_buckets"]) == sorted(
        set(range(N_BUCKETS)) - set(done_after_crash)
    )

    # --- run 3: everything committed → no-op ------------------------------
    s3 = encode_corpus_resumable(docs_df, out, n_buckets=N_BUCKETS, cfg=CFG)
    assert s3["processed_buckets"] == []
    assert len(s3["skipped_buckets"]) == N_BUCKETS

    # --- stage 2 equals the single-shot build -----------------------------
    idx_resumed = build_index_from_shards(spark, out, cfg=CFG)
    idx_direct = build_index(docs_df, cfg=CFG)
    a = _postings_long(idx_resumed)
    b = _postings_long(idx_direct)
    assert len(a) == len(b)
    for (ta, da, wa), (tb, db, wb) in zip(a, b):
        assert (ta, da) == (tb, db)
        assert np.isclose(wa, wb, rtol=1e-6)
    assert idx_resumed.meta["n_docs"] == idx_direct.meta["n_docs"] == N_DOCS
    assert idx_resumed.meta["nnz"] == idx_direct.meta["nnz"]
    idx_resumed.unpersist()
    idx_direct.unpersist()


def test_build_log_metrics(spark, docs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt_log"))
    s = encode_corpus_resumable(docs_df, out, n_buckets=4, cfg=CFG)
    log = read_build_log(spark, out).collect()
    assert len(log) == 4
    assert all(r["status"] == "committed" for r in log)
    assert sum(r["doc_count"] for r in log) == N_DOCS
    assert sum(r["nnz"] for r in log) == s["nnz"] > 0
    assert all(r["run_wall_ms"] >= 0 for r in log)
    # fingerprints are deterministic: re-encode into a fresh dir → same
    out2 = str(tmp_path_factory.mktemp("ckpt_log2"))
    encode_corpus_resumable(docs_df, out2, n_buckets=4, cfg=CFG)
    fp1 = {r["bucket"]: r["input_fingerprint"] for r in log}
    fp2 = {
        r["bucket"]: r["input_fingerprint"]
        for r in read_build_log(spark, out2).collect()
    }
    assert fp1 == fp2


def test_legacy_wall_ms_log_resumes_cleanly(spark, docs_df, tmp_path):
    """Round-3 ADVICE: a build_log written by the pre-rename version
    (column `wall_ms`) that later receives post-rename appends is a
    mixed-schema parquet directory; read_build_log must merge the
    generations and surface one non-null `run_wall_ms`."""
    out = str(tmp_path / "legacy")
    # half the buckets committed under the LEGACY schema
    legacy_schema = (
        "bucket INT, input_fingerprint BIGINT, doc_count BIGINT, nnz BIGINT, "
        "wall_ms BIGINT, status STRING, attempt INT"
    )
    spark.createDataFrame(
        [(b, 0, 0, 0, 111, "committed", 1) for b in range(2)],
        schema=legacy_schema,
    ).coalesce(1).write.mode("append").parquet(f"{out}/build_log")
    # resume with the current version: must skip legacy-committed buckets
    s = encode_corpus_resumable(docs_df, out, n_buckets=N_BUCKETS, cfg=CFG)
    assert s["skipped_buckets"] == [0, 1]
    assert s["processed_buckets"] == list(range(2, N_BUCKETS))
    log = read_build_log(spark, out)
    assert "wall_ms" not in log.columns
    rows = log.select("bucket", "run_wall_ms").collect()
    assert len(rows) == N_BUCKETS
    assert all(r["run_wall_ms"] is not None for r in rows)
    assert committed_buckets(spark, out) == {b: 1 for b in range(N_BUCKETS)}
