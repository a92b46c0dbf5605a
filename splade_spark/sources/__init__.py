from .corpus import corpus_docs, read_web_corpus  # noqa: F401
