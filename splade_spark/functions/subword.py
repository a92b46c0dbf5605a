"""Deterministic corpus-driven subword tokenizer (F1 parity surface).

The reference tokenizes with a pretrained WordPiece vocabulary
(/root/reference/src/utils/transformers.py:4-12 — greedy longest-match
subword segmentation). This engine cannot ship pretrained weights
(public-knowledge rule), so it reproduces the reference's TOKEN SEMANTICS
— vocabulary-driven greedy longest-match — with a vocabulary BUILT FROM
THE CORPUS itself, fully deterministic:

vocab build
    words (classic tokenizer, multiplicity-weighted) → every substring of
    length 1..max_piece_len, frequency-summed → top ``vocab_size`` pieces
    by (freq desc, piece asc) ∪ ALL observed single characters (coverage:
    greedy matching over the same corpus can never dead-end).

segmentation (two styles)
    "plain" (the oracle-pinned default): at each position take the
    LONGEST vocab piece matching; if nothing matches (a character never
    seen at vocab-build time) the rest of the word is dropped —
    unreachable for in-corpus text, and mirrored exactly by the SQL
    oracle. Pieces are position-independent (no "##" continuation
    marker; BM25/SPLADE scoring over bags of pieces does not need it).

    "wordpiece": byte-identical HF WordPiece segmentation rules
    (/root/reference/src/utils/transformers.py:4-12 tokenizes with
    exactly these semantics): word-internal pieces carry the "##"
    continuation marker, greedy longest-match scans the FULL remaining
    suffix, any dead-end turns the WHOLE word into ``[UNK]``, and words
    longer than ``max_word_chars`` (HF's max_input_chars_per_word=100)
    are ``[UNK]`` outright. The vocabulary is still corpus-built (no
    external files): continuation pieces are generated "##"-prefixed so
    frequencies are position-class aware.

Scale shape: the expensive piece matching runs once per DISTINCT word
(an Arrow-batched UDF over the word dimension — typically 10^5-10^6 rows
at web scale), then a hash join fans pieces back onto the corpus token
stream. The vocabulary itself is collected to the driver and shipped in
the UDF closure — it is vocab_size+|chars| entries by construction, the
same order as the reference's 30k WordPiece vocab.

All three mutual forms exist and are oracle-pinned against each other:
this module's Spark pipeline, ``split_word`` (pure Python), and the
``subword_tokenize`` entry's DuckDB SQL (vocab CTEs + a recursive-CTE
greedy walk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from splade_spark.functions.tokenize import tokens_col

UNK = "[UNK]"
MAX_WORD_CHARS = 100  # HF WordpieceTokenizer max_input_chars_per_word


def build_subword_vocab(
    docs: DataFrame,
    *,
    text_col: str = "text",
    max_piece_len: int = 6,
    vocab_size: int = 500,
    max_tokens: int = 256,
    style: str = "plain",
) -> DataFrame:
    """(piece, freq): the deterministic corpus vocabulary.

    Substring generation is pure JVM (explode over start positions ×
    a broadcast length dimension); the frequency aggregation is one
    hash-partitioned groupBy on the piece. The top-``vocab_size`` cut is
    ``orderBy(...).limit(...)`` — Spark executes that as a distributed
    TakeOrdered (per-partition heaps + driver merge of vocab_size rows),
    NOT a global sort. (An earlier revision used a global row_number
    Window, which funnels every distinct substring — far more than
    vocab_size at corpus scale — through one task; round-3 ADVICE.)

    ``style="wordpiece"`` generates word-internal pieces with the "##"
    continuation prefix (position-class-aware frequencies); coverage
    single characters are kept in both forms so ``[UNK]`` stays rare on
    in-corpus text.
    """
    if style not in ("plain", "wordpiece"):
        raise ValueError(f"style must be plain or wordpiece, got {style!r}")
    wc = (
        docs.select(F.explode(tokens_col(text_col, max_tokens)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    starts = wc.select(
        "word", "wc",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("s"),
    )
    lengths = docs.sparkSession.range(1, max_piece_len + 1).select(
        F.col("id").cast("int").alias("l")
    )
    raw = F.expr("substring(word, s, l)")
    if style == "wordpiece":
        piece_col = F.when(F.col("s") == 1, raw).otherwise(
            F.concat(F.lit("##"), raw)
        )
    else:
        piece_col = raw
    pieces = (
        starts.crossJoin(F.broadcast(lengths))
        .filter(F.col("s") + F.col("l") - 1 <= F.length("word"))
        .select(piece_col.alias("piece"), "wc")
        .groupBy("piece")
        .agg(F.sum("wc").alias("freq"))
    )
    top = pieces.orderBy(F.desc("freq"), F.asc("piece")).limit(vocab_size)
    char_len = F.length(F.regexp_replace("piece", "^##", ""))
    chars = pieces.filter(char_len == 1)
    return top.unionByName(chars).distinct()


def split_word(word: str, vocab: frozenset[str], max_piece_len: int) -> list[str]:
    """Greedy longest-match segmentation — THE shared semantics (the
    pandas-UDF path calls exactly this per distinct word; the DuckDB
    oracle's recursive walk mirrors it). Unknown characters stop the
    walk (rest of the word dropped), matching the SQL join semantics."""
    out: list[str] = []
    p, n = 0, len(word)
    while p < n:
        piece = None
        for ln in range(min(max_piece_len, n - p), 0, -1):
            cand = word[p:p + ln]
            if cand in vocab:
                piece = cand
                break
        if piece is None:
            break
        out.append(piece)
        p += len(piece)
    return out


def split_word_wordpiece(
    word: str,
    vocab: frozenset[str],
    max_word_chars: int = MAX_WORD_CHARS,
) -> list[str]:
    """HF WordPiece segmentation, byte-identical to the published rules
    (the reference's tokenizer backend,
    /root/reference/src/utils/transformers.py:4-12): greedy longest-match
    over the FULL remaining suffix, continuation pieces looked up with a
    "##" prefix, ANY dead-end → the whole word is ``[UNK]``, and words
    longer than ``max_word_chars`` are ``[UNK]`` outright."""
    n = len(word)
    if n > max_word_chars:
        return [UNK]
    out: list[str] = []
    p = 0
    while p < n:
        piece = None
        for end in range(n, p, -1):
            cand = word[p:end]
            if p > 0:
                cand = "##" + cand
            if cand in vocab:
                piece = cand
                break
        if piece is None:
            return [UNK]
        out.append(piece)
        p = end
    return out


def subword_tf(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 6,
    max_tokens: int = 256,
    style: str = "plain",
) -> DataFrame:
    """(doc_id string, term=piece, tf int): per-doc subword term
    frequencies — drop-in for ``index_from_tf``'s tf input, so the whole
    index/query stack runs unchanged on subword terms (D3 surface).

    Plan: corpus → (doc, word) stream (JVM) → DISTINCT words segmented
    once in an Arrow-batched UDF with the broadcast vocab → pieces hash-
    joined back onto the stream → (doc, piece) count.

    ``style="wordpiece"`` segments with ``split_word_wordpiece`` (HF
    rules: ## continuations, [UNK] fallback); pass a vocab built with the
    same style.
    """
    if style not in ("plain", "wordpiece"):
        raise ValueError(f"style must be plain or wordpiece, got {style!r}")
    vset = frozenset(r["piece"] for r in vocab.select("piece").collect())

    words = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.explode(tokens_col(text_col, max_tokens)).alias("word"),
    )
    distinct_words = words.select("word").distinct()

    def seg_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows_w, rows_p, rows_k = [], [], []
            for word in pdf["word"]:
                if style == "wordpiece":
                    segd = split_word_wordpiece(word, vset)
                else:
                    segd = split_word(word, vset, max_piece_len)
                for k, piece in enumerate(segd):
                    rows_w.append(word)
                    rows_p.append(piece)
                    rows_k.append(k)
            yield pd.DataFrame({"word": rows_w, "piece": rows_p, "k": rows_k})

    word_pieces = distinct_words.mapInPandas(
        seg_batches, schema="word string, piece string, k int"
    )
    return (
        words.join(word_pieces.select("word", "piece"), "word")
        .groupBy("doc_id", "piece")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
        .select("doc_id", F.col("piece").alias("term"), "tf")
    )
