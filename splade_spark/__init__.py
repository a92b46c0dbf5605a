"""splade_spark — a PySpark-native sparse-retrieval / fulltext-index engine.

A brand-new DataFrame-first rebuild of the retrieval data plane of the
reference repo (hyukkyukang/SPLADE, snapshot at /root/reference): corpus
tokenization / term expansion, inverted-index construction (impact-ordered,
delta+varint-compressed posting blocks, skew-split by doc range), BM25 top-k
query answering with block-max WAND pruning, and the retrieval-metrics
harness — plus the training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB corpus needs.

Design notes are in SURVEY.md; every module cites the reference file:line
whose *semantics* it reproduces. No reference code is copied — the physical
design is Spark-first (Catalyst plans, Arrow-vectorized UDFs only where
built-ins cannot express the op).
"""

__version__ = "0.1.0"
