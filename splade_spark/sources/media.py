"""Media-directory source: ingest raw image/audio/video files as binary
columns via Spark's built-in ``binaryFile`` datasource.

Engine addition for multimodal training-data pipelines (the reference is
text-only). ``spark.read.format("binaryFile")`` is the idiomatic Spark
path for blob ingestion: the JVM reads each file once into a ``content``
binary column with (path, modificationTime, length) metadata, supports
``pathGlobFilter`` partition-parallel listing, and never routes bytes
through Python. This source normalizes that frame to the engine's media
schema (media_id, kind, n_bytes, payload) so everything downstream
(``operators.multimodal``: metadata projection, Arrow-batched feature
extraction, the BMP decode path) runs unchanged whether blobs came from
a parquet binary column or a directory of files.

At 100 TB the directory listing itself is the scale hazard: pass
``recursive=True`` only with a bounded directory fan-out, and prefer
writing blobs into parquet/Iceberg binary columns early (one seek per
column chunk instead of one open per file). ``max_bytes`` guards the
executor heap against a single giant file (binaryFile materializes one
file per row).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension -> engine media kind; everything else ingests as "unknown"
# (metadata + byte features still work; decode_media raises for kinds
# without a decoder, matching the documented stub contract)
KIND_BY_EXT = {
    "bmp": "image/bmp",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
    "webm": "video/webm",
}


def read_media_dir(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = False,
    max_bytes: int | None = 64 * 1024 * 1024,
) -> DataFrame:
    """DataFrame(media_id, kind, n_bytes, payload) from a directory of
    media files. ``media_id`` is the file path relative to ``path`` (a
    stable id that survives re-crawls of the same tree); ``kind`` is
    derived from the extension via ``KIND_BY_EXT``.

    ``glob`` maps to binaryFile's pushed-down ``pathGlobFilter`` (the
    listing itself skips non-matching files); ``max_bytes`` drops files
    larger than the cap (guarding one-file-per-row heap usage) using the
    datasource's ``length`` column BEFORE content is needed — with
    column pruning this filter runs off file metadata.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    if max_bytes is not None:
        raw = raw.filter(F.col("length") <= max_bytes)
    # binaryFile yields file URIs (file:/abs or file:///abs depending on
    # Hadoop's normalization); canonicalize the slashes then strip the
    # base prefix with a driver-computed length — no regex-escaping of
    # user paths needed
    base = "file:///" + os.path.abspath(path).strip("/") + "/"
    norm = F.regexp_replace("path", "^file:/+", "file:///")
    rel = F.when(
        norm.startswith(base), F.substring(norm, len(base) + 1, 1 << 30)
    ).otherwise(norm)
    ext = F.lower(F.element_at(F.split(rel, r"\."), -1))
    kind_map = F.create_map(
        *[F.lit(x) for kv in KIND_BY_EXT.items() for x in kv]
    )
    return raw.select(
        rel.alias("media_id"),
        F.coalesce(kind_map[ext], F.lit("unknown")).alias("kind"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.col("content").alias("payload"),
    )
