"""Structured Streaming ingestion: streamed shards must produce the same
index as the batch build; restart must not duplicate batches; windowed
telemetry must match a batch aggregation."""

import os

import pytest
from pyspark.sql import functions as F

from splade_spark.config import EngineConfig
from splade_spark.fixtures import gen_pages
from splade_spark.operators.indexing import build_index
from splade_spark.streaming.stream_index import (
    build_index_from_batches,
    start_ingest_stats_stream,
    start_shard_stream,
    stream_corpus,
)

N_DOCS = 120
CFG = EngineConfig(block_size=64, index_partitions=4)
SCHEMA = "url STRING, warc_ts TIMESTAMP, text STRING"


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """Corpus staged as three parquet 'drops' (micro-batch sources)."""
    src = str(tmp_path_factory.mktemp("stream_src"))
    pages = gen_pages(N_DOCS, seed=42)
    pdf = pages[["url", "warc_ts", "text"]]
    for i, chunk in enumerate((pdf[:40], pdf[40:80], pdf[80:])):
        # one file per drop, written in event-time order: the file stream
        # picks them up oldest-first so the watermark never drops a full
        # window as late
        spark.createDataFrame(chunk).repartition(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"drop{i}"))
    return src, pages


def test_streamed_shards_equal_batch_index(spark, staged, tmp_path_factory):
    src, pages = staged
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))

    pattern = os.path.join(src, "drop*")
    q = start_shard_stream(
        stream_corpus(spark, pattern, SCHEMA), out, ckpt, cfg=CFG,
        available_now=True,
    )
    q.awaitTermination(120)

    # restart on the same checkpoint: nothing new → no duplicate shards
    n_tf = spark.read.parquet(os.path.join(out, "tf")).count()
    q2 = start_shard_stream(
        stream_corpus(spark, pattern, SCHEMA), out, ckpt, cfg=CFG,
        available_now=True,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out, "tf")).count() == n_tf

    idx_stream = build_index_from_batches(spark, out, cfg=CFG)
    docs = spark.createDataFrame(pages[["url", "text"]])
    idx_batch = build_index(docs, id_col="url", text_col="text", cfg=CFG)
    assert idx_stream.meta["n_docs"] == idx_batch.meta["n_docs"] == N_DOCS
    assert idx_stream.meta["nnz"] == idx_batch.meta["nnz"]
    assert idx_stream.meta["avgdl"] == pytest.approx(idx_batch.meta["avgdl"])
    # identical postings layout: same per-term block stats
    def sig(idx):
        return sorted(
            (r["term_id"], r["block_id"], r["n_postings"], r["min_doc"],
             r["max_doc"], round(float(r["max_weight"]), 5))
            for r in idx.postings.collect()
        )
    assert sig(idx_stream) == sig(idx_batch)
    idx_stream.unpersist()
    idx_batch.unpersist()


def test_batch_retry_is_idempotent(spark, staged, tmp_path_factory):
    """Exactly-once under retries: re-running a micro-batch (crash between
    the tf and dl writes, or after write but before checkpoint commit)
    must not duplicate any shard rows — the batch_id partition is
    overwritten, not appended."""
    from splade_spark.streaming.stream_index import write_tf_dl_batch

    _, pages = staged
    out = str(tmp_path_factory.mktemp("retry_out"))
    batch = spark.createDataFrame(pages[["url", "text"]][:40])
    write_tf_dl_batch(batch, 0, out, cfg=CFG)
    tf_once = sorted(
        (r["doc_id"], r["term"], r["tf"])
        for r in spark.read.parquet(os.path.join(out, "tf")).collect()
    )
    dl_once = spark.read.parquet(os.path.join(out, "dl")).count()
    # simulated retry of the SAME batch id
    write_tf_dl_batch(batch, 0, out, cfg=CFG)
    tf_twice = sorted(
        (r["doc_id"], r["term"], r["tf"])
        for r in spark.read.parquet(os.path.join(out, "tf")).collect()
    )
    assert tf_twice == tf_once
    assert spark.read.parquet(os.path.join(out, "dl")).count() == dl_once
    # a different batch id appends its own partition, untouched by retries
    batch2 = spark.createDataFrame(pages[["url", "text"]][40:80])
    write_tf_dl_batch(batch2, 1, out, cfg=CFG)
    write_tf_dl_batch(batch, 0, out, cfg=CFG)  # retry batch 0 again
    by_batch = {
        r["batch_id"]: r["n"]
        for r in spark.read.parquet(os.path.join(out, "dl"))
        .groupBy("batch_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_batch[0] == 40 and by_batch[1] == 40


def test_windowed_ingest_stats(spark, staged, tmp_path_factory):
    src, pages = staged
    out = str(tmp_path_factory.mktemp("stats_out"))
    ckpt = str(tmp_path_factory.mktemp("stats_ckpt"))
    # one file per micro-batch so the watermark advances batch-to-batch
    # (append mode emits a window only once the watermark passes its end;
    # a single giant batch would close nothing)
    q = start_ingest_stats_stream(
        stream_corpus(spark, os.path.join(src, "drop*"), SCHEMA,
                      max_files_per_trigger=1),
        out, ckpt, cfg=CFG, available_now=True,
        window="30 seconds", watermark="10 seconds",
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    # batch oracle: same windowed agg without streaming
    batch = (
        spark.createDataFrame(pages[["url", "warc_ts", "text"]])
        .groupBy(F.window("warc_ts", "30 seconds"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    got_rows = {
        (r["window_start"], r["n_docs"]) for r in got.collect()
    }
    batch_rows = {
        (r["window"]["start"], r["n_docs"]) for r in batch.collect()
    }
    # closed windows must agree exactly with the batch oracle; the tail
    # windows past the final watermark stay open (append-mode semantics)
    assert got_rows <= batch_rows
    assert len(got_rows) >= 1


def test_incremental_fold_of_new_batches(spark, tmp_path_factory):
    """fold_new_batches: an index built from the first drops is extended
    with ONLY the newly arrived micro-batch shards (operators/merge fold)
    and must match the batch build over everything — the old corpus is
    never re-read."""
    from splade_spark.streaming.stream_index import fold_new_batches

    src = str(tmp_path_factory.mktemp("inc_src"))
    out = str(tmp_path_factory.mktemp("inc_out"))
    ckpt = str(tmp_path_factory.mktemp("inc_ckpt"))
    pages = gen_pages(N_DOCS, seed=47)
    pdf = pages[["url", "warc_ts", "text"]]

    # stage + stream the first two drops
    for i, chunk in enumerate((pdf[:40], pdf[40:80])):
        spark.createDataFrame(chunk).repartition(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"drop{i}"))
    pattern = os.path.join(src, "drop*")
    start_shard_stream(
        stream_corpus(spark, pattern, SCHEMA), out, ckpt, cfg=CFG,
        available_now=True,
    ).awaitTermination(120)
    idx = build_index_from_batches(spark, out, cfg=CFG)
    assert idx.meta["streamed_batches"]
    assert idx.meta["n_docs"] == 80

    # nothing new arrived -> fold is a no-op returning the same handle
    assert fold_new_batches(idx, spark, out) is idx

    # a third drop arrives; the stream picks up only the new files
    spark.createDataFrame(pdf[80:]).repartition(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "drop2"))
    start_shard_stream(
        stream_corpus(spark, pattern, SCHEMA), out, ckpt, cfg=CFG,
        available_now=True,
    ).awaitTermination(120)

    folded = fold_new_batches(idx, spark, out)
    assert folded.meta["n_docs"] == N_DOCS

    rebuilt = build_index(
        spark.createDataFrame(pages[["url", "text"]]),
        id_col="url", text_col="text", cfg=CFG,
    )

    def sig(ix):
        return sorted(
            (r["term_id"], r["block_id"], r["n_postings"], r["min_doc"],
             r["max_doc"], round(float(r["max_weight"]), 5))
            for r in ix.postings.collect()
        )

    assert folded.meta["nnz"] == rebuilt.meta["nnz"]
    assert folded.meta["avgdl"] == pytest.approx(rebuilt.meta["avgdl"])
    assert sig(folded) == sig(rebuilt)
    folded.unpersist()
    rebuilt.unpersist()


# ---------------------------------------------------------------------------
# Stateful cross-batch dedup (applyInPandasWithState)
# ---------------------------------------------------------------------------

def test_streaming_first_seen_dedup(spark, tmp_path):
    """State must survive across micro-batches: within-batch dups keep the
    min doc_id; re-deliveries in LATER batches are suppressed entirely."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from splade_spark.streaming.stream_dedup import run_first_seen_over_files

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    b1 = pd.DataFrame({
        "doc_id": ["d3", "d1", "d2", "d9"],
        "text": ["alpha beta gamma", "unique one", "Alpha  beta,gamma", "solo nine"],
    })  # d2 normalizes to d3's fingerprint; min doc_id d2 survives
    b2 = pd.DataFrame({
        "doc_id": ["d4", "d5"],
        "text": ["ALPHA beta gamma!", "brand new content"],
    })  # d4 re-delivers the alpha fp -> suppressed by STATE
    pq.write_table(pa.Table.from_pandas(b1, preserve_index=False),
                   f"{in_dir}/b1.parquet")
    pq.write_table(pa.Table.from_pandas(b2, preserve_index=False),
                   f"{in_dir}/b2.parquet")
    now = 1_700_000_000
    os.utime(f"{in_dir}/b1.parquet", (now - 100, now - 100))
    os.utime(f"{in_dir}/b2.parquet", (now, now))

    res = run_first_seen_over_files(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ck"),
        n_buckets=4,
    )
    got = {r["doc_id"]: r["fp"] for r in res.collect()}
    assert set(got) == {"d1", "d2", "d9", "d5"}
    # the three alpha-variant docs share one fingerprint; only d2 emitted
    fps = list(got.values())
    assert len(fps) == len(set(fps))


def test_streaming_latest_snapshot_filter(spark, tmp_path):
    """Strictly-newer-per-canonical-URL across micro-batches: spelling
    variants collapse to one state key, older and equal-ts re-crawls are
    suppressed, newer ones pass."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from splade_spark.streaming.stream_snapshot import (
        run_latest_snapshots_over_files,
    )

    t0 = pd.Timestamp("2024-01-01")

    def write(name, rows, mtime):
        pdf = pd.DataFrame(rows, columns=["url", "doc_id", "warc_ts"])
        pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
        p = f"{tmp_path}/in/{name}"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        os.utime(p, (mtime, mtime))

    os.makedirs(f"{tmp_path}/in")
    s = pd.Timedelta(seconds=1)
    write("b1.parquet", [
        # two spellings of a.org/p in ONE batch -> newest (d2) wins
        ("https://www.a.org/p?utm_source=x", "d1", t0 + 10 * s),
        ("HTTPS://A.ORG/p", "d2", t0 + 20 * s),
        ("https://b.org/q", "d3", t0 + 50 * s),
    ], 1_700_000_000 - 100)
    write("b2.parquet", [
        ("https://a.org/p/", "d4", t0 + 30 * s),   # newer -> passes
        ("https://b.org/q", "d5", t0 + 50 * s),    # equal ts -> suppressed
        ("https://b.org/q", "d6", t0 + 40 * s),    # older -> suppressed
        ("https://c.org/new", "d7", t0 + 1 * s),   # unseen URL -> passes
    ], 1_700_000_000)

    res = run_latest_snapshots_over_files(
        spark, f"{tmp_path}/in", f"{tmp_path}/out", f"{tmp_path}/ck",
        n_buckets=4,
    )
    got = {r["doc_id"]: r["canonical_url"] for r in res.collect()}
    assert got == {
        "d2": "https://a.org/p",
        "d3": "https://b.org/q",
        "d4": "https://a.org/p",
        "d7": "https://c.org/new",
    }


def test_streamed_snapshots_keep_index_fresh(spark, tmp_path):
    """The freshness loop: stream batch 1 -> build the index on what it
    emits; stream batch 2 through the SAME checkpoint -> upsert what it
    emits. The live index must equal a rebuild over the latest snapshot
    of every URL, compared on id-keyed decoded postings (doc_idx
    assignment may legally differ — merge module tie-break caveat)."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from splade_spark.config import EngineConfig
    from splade_spark.functions.codec import decode_block
    from splade_spark.operators.indexing import build_index
    from splade_spark.operators.merge import upsert_docs
    from splade_spark.streaming.stream_snapshot import (
        run_latest_snapshots_over_files,
    )

    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    b1 = [
        ("https://a.org/one", "d1", t0 + 10 * s, "alpha beta gamma words"),
        ("https://a.org/two", "d2", t0 + 10 * s, "delta epsilon words"),
        ("https://a.org/three", "d3", t0 + 10 * s, "zeta eta theta"),
    ]
    b2 = [
        ("https://WWW.a.org/one", "d4", t0 + 20 * s, "alpha REVISED beta new"),
        ("https://a.org/two", "d5", t0 + 5 * s, "stale superseded text"),
        ("https://a.org/four", "d6", t0 + 1 * s, "brand new page text"),
    ]
    texts = {r[1]: r[3] for r in b1 + b2}

    def write(name, rows, mtime):
        pdf = pd.DataFrame(rows, columns=["url", "doc_id", "warc_ts", "text"])
        pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
        p = f"{tmp_path}/in/{name}"
        pq.write_table(
            pa.Table.from_pandas(pdf[["url", "doc_id", "warc_ts"]],
                                 preserve_index=False), p)
        os.utime(p, (mtime, mtime))

    def run():
        return run_latest_snapshots_over_files(
            spark, f"{tmp_path}/in", f"{tmp_path}/out", f"{tmp_path}/ck",
            n_buckets=4,
        )

    def as_docs(rows):
        return spark.createDataFrame(
            [(u, texts[d]) for u, d in rows], "doc_id string, text string"
        )

    cfg = EngineConfig(block_size=8, index_partitions=2)
    os.makedirs(f"{tmp_path}/in")
    write("b1.parquet", b1, 1_700_000_000 - 100)
    got1 = {(r["canonical_url"], r["doc_id"]) for r in run().collect()}
    assert {d for _, d in got1} == {"d1", "d2", "d3"}
    live = build_index(as_docs(got1), cfg=cfg)

    write("b2.parquet", b2, 1_700_000_000)  # same checkpoint: only b2 is new
    got2 = {
        (r["canonical_url"], r["doc_id"]) for r in run().collect()
    } - got1
    assert {d for _, d in got2} == {"d4", "d6"}
    live = upsert_docs(live, as_docs(got2))

    latest = build_index(as_docs([
        ("https://a.org/one", "d4"), ("https://a.org/two", "d2"),
        ("https://a.org/three", "d3"), ("https://a.org/four", "d6"),
    ]), cfg=cfg)

    def id_keyed(idx):
        terms = {r["term_id"]: (r["term"], r["df"]) for r in idx.term_dict.collect()}
        ids = {r["doc_idx"]: r["doc_id"] for r in idx.doc_dim.collect()}
        dim = {(r["doc_id"], r["dl"]) for r in idx.doc_dim.collect()}
        post = set()
        for r in idx.postings.collect():
            d, w = decode_block(r["doc_gaps"], r["weights"])
            for di, wi in zip(d, w):
                post.add((terms[r["term_id"]][0], ids[int(di)],
                          np.float32(wi).tobytes()))
        return set(terms.values()), dim, post
    assert live.meta["n_docs"] == latest.meta["n_docs"] == 4
    assert id_keyed(live) == id_keyed(latest)
