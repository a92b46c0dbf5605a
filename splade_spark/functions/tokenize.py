"""Classic tokenization + text extraction, three mutually-identical forms.

Semantics reproduced from the reference:
- doc text = ``f"{title} {text}".strip()`` when a title column exists
  (/root/reference/src/data/dataset/base.py:495-508) — here ``concat_text``.
- truncation at max_input_length=256 tokens
  (/root/reference/config/model/_base.yaml:11, tokenizer call at
  /root/reference/src/utils/transformers.py:4-12). The reference uses a
  WordPiece tokenizer; the engine's classic path replaces it with a
  deterministic lowercase [a-z0-9]+ tokenizer (same pattern in the Spark
  column expression, the Python oracle, and the DuckDB oracle SQL).
- null-to-empty text (/root/reference/src/data/dataset/base.py:492-506).

All Spark forms are pure Column expressions — JVM-side, whole-stage
codegen, NO Python in the hot path (BASELINE.json input_hint).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import TOKEN_SPLIT_RE, DEFAULT

_PY_TOKEN_RE = re.compile(TOKEN_SPLIT_RE)
_PY_TAG_RE = re.compile(r"<[^>]*>")


def tokens_col(text: Column | str, max_tokens: int = DEFAULT.max_tokens) -> Column:
    """array<string> of tokens: lower → split non-[a-z0-9] → drop empty →
    truncate to max_tokens. Pure Catalyst expression."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.filter(
        F.split(F.lower(F.coalesce(c, F.lit(""))), TOKEN_SPLIT_RE),
        lambda x: x != "",
    )
    return F.slice(toks, 1, max_tokens)


def tokens_sql(expr: str, max_tokens: int = DEFAULT.max_tokens) -> str:
    """The identical tokenizer as DuckDB SQL (list of tokens)."""
    return (
        f"list_slice(list_filter(regexp_split_to_array(lower(coalesce({expr}, '')), "
        f"'{TOKEN_SPLIT_RE}'), x -> x <> ''), 1, {max_tokens})"
    )


def tokens_sparksql(expr: str, max_tokens: int = DEFAULT.max_tokens) -> str:
    """The identical tokenizer as Spark SQL text."""
    return (
        f"slice(filter(split(lower(coalesce({expr}, '')), '{TOKEN_SPLIT_RE}'), "
        f"x -> x != ''), 1, {max_tokens})"
    )


def tokenize_py(text: str | None, max_tokens: int = DEFAULT.max_tokens) -> list[str]:
    """Python oracle — must match tokens_col / tokens_sql byte-for-byte."""
    if text is None:
        text = ""
    return [t for t in _PY_TOKEN_RE.split(text.lower()) if t][:max_tokens]


def concat_text(title: Column | str | None, text: Column | str) -> Column:
    """Reference doc-text rule: "{title} {text}".strip() when title exists,
    else text.strip() (/root/reference/src/data/dataset/base.py:495-508)."""
    t = F.col(text) if isinstance(text, str) else text
    t = F.coalesce(t.cast("string"), F.lit(""))
    if title is None:
        return F.trim(t)
    ti = F.col(title) if isinstance(title, str) else title
    ti = F.coalesce(ti.cast("string"), F.lit(""))
    # concat then strip — NOT concat_ws of trimmed parts: "{title} {text}"
    # keeps the single interior space even when one side is empty, then
    # strip() removes it; trim(concat(title,' ',text)) reproduces that.
    return F.trim(F.concat(ti, F.lit(" "), t))


def extract_text_html(html: Column | str) -> Column:
    """Byte-identical text extraction from the html binary column
    (input_hint). Deterministic rule: decode UTF-8, strip tags, collapse
    nothing else — the fixture oracle (FIXTURES.md §1) requires
    strip_tags(html) == text exactly."""
    c = F.col(html) if isinstance(html, str) else html
    return F.regexp_replace(F.decode(c, "UTF-8"), "<[^>]*>", "")


def extract_text_html_py(html: bytes) -> str:
    """Python oracle for extract_text_html."""
    return _PY_TAG_RE.sub("", html.decode("utf-8"))
