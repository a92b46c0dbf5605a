"""SPLADE-style sparse term expansion — deterministic surrogate encoder.

Mirrors the reference encoder's *semantics* without any neural weights
(no external data allowed in this sandbox):

- log-saturated activation ``log1p(relu(x))``
  (/root/reference/src/model/retriever/sparse/neural/splade.py:11-40)
- max pooling over token contributions
  (/root/reference/src/model/retriever/sparse/neural/splade.py:69-87)
- sparsification by strict ``weight > 0`` filter
  (/root/reference/src/indexing/sparse_index.py:65-68)
- mostly-inactive expansion dims (the reference measures ~97% negative
  logits, /root/reference/script/experiment/output/logit_stats.json:56-62)
  — reproduced here by a relu threshold that zeroes ~62% of candidates.

The surrogate "model": each token t contributes
  (t, log1p(tf))                                   -- identity term
  (x<md5(t:j)[:6]>, log1p(relu(h_j(t) - 160)/32))  -- j ∈ {0, 1} expansions
where h_j(t) = int value of md5(t||':'||j) hex chars [7,8] ∈ [0,255].
Final doc vector = max-pooled over tokens, zero weights dropped.

Three mutually identical implementations: Spark Column plan (JVM,
whole-stage codegen — the production path), a vectorized pandas-UDF batch
encoder (the D3 model-plumbing surface: Series[str] → expansion rows, the
shape a real transformer encoder would plug into), and DuckDB oracle SQL.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from .tokenize import tokenize_py, tokens_col, tokens_sql

N_EXPANSIONS = 2
RELU_SHIFT = 160
RELU_SCALE = 32.0
HEX = "0123456789abcdef"


# ---------------------------------------------------------------------------
# Spark JVM plan
# ---------------------------------------------------------------------------

def expand_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """(id, text) → (doc_id string, term string, weight float): the sparse
    expansion vector in long form, ready for indexing.build_index's
    ``weighted_terms``. Pure Column expressions — no Python in the path."""
    tf = (
        docs.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.explode(tokens_col(text_col, cfg.max_tokens)).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    identity = tf.select(
        "doc_id", F.col("tok").alias("term"),
        F.log1p(F.col("tf").cast("double")).alias("weight"),
    )
    exp = None
    for j in range(N_EXPANSIONS):
        h = F.md5(F.concat(F.col("tok"), F.lit(f":{j}")))
        hv = F.conv(F.substring(h, 7, 2), 16, 10).cast("int")
        e = tf.select(
            "doc_id",
            F.concat(F.lit("x"), F.substring(h, 1, 6)).alias("term"),
            F.log1p(
                F.greatest(hv - F.lit(RELU_SHIFT), F.lit(0)) / F.lit(RELU_SCALE)
            ).alias("weight"),
        )
        exp = e if exp is None else exp.unionByName(e)
    allc = identity.unionByName(exp)
    return (
        allc.groupBy("doc_id", "term")
        .agg(F.max("weight").cast("float").alias("weight"))
        .filter(F.col("weight") > 0)
    )


# ---------------------------------------------------------------------------
# pandas-UDF batch encoder (D3 plumbing: swap in a real model here)
# ---------------------------------------------------------------------------

def expand_terms_pandas(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Same expansion through the Arrow-batched encoder surface the
    reference's neural model would use (SURVEY §2.10 D3): one Python call
    per Arrow batch, emitting exploded (doc_id, term, weight) rows."""
    mt = cfg.max_tokens

    def encode_batches(batches):
        for pdf in batches:
            ids, terms, weights = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                vec = _expand_one_py(text, mt)
                ids.extend([str(doc_id)] * len(vec))
                terms.extend(vec.keys())
                weights.extend(vec.values())
            yield pd.DataFrame(
                {"doc_id": ids, "term": terms,
                 "weight": pd.array(weights, dtype="float32")}
            )

    return docs.select(id_col, text_col).mapInPandas(
        encode_batches, schema="doc_id string, term string, weight float"
    )


def _expand_one_py(text: str | None, max_tokens: int) -> dict[str, float]:
    """Python/NumPy oracle for one document (also used by pytest)."""
    toks = tokenize_py(text, max_tokens)
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    vec: dict[str, float] = {}
    for t, n in tf.items():
        w = math.log1p(float(n))
        vec[t] = max(vec.get(t, 0.0), w)
        for j in range(N_EXPANSIONS):
            h = hashlib.md5(f"{t}:{j}".encode()).hexdigest()
            hv = int(h[6:8], 16)
            w = math.log1p(max(hv - RELU_SHIFT, 0) / RELU_SCALE)
            term = "x" + h[:6]
            vec[term] = max(vec.get(term, 0.0), w)
    return {t: w for t, w in vec.items() if w > 0}


# ---------------------------------------------------------------------------
# Generalized pooled encoder: activation grid × pooling interpolation
# ---------------------------------------------------------------------------
#
# Reference parity (round-3 verdict item 3):
# - four activations applied to PER-TOKEN logits
#   (/root/reference/src/model/retriever/sparse/neural/splade.py:11-40):
#   log1p_relu, log1p_softplus, softplus, relu
# - pooling interpolation over token positions
#   (/root/reference/src/model/retriever/sparse/neural/splade.py:69-87):
#   pooled = pooled_sum + (pooled_max - pooled_sum) * pooling_mode
#   with pooled_sum = Σ_positions act(logit) and
#   pooled_max = clamp(max_positions act(logit), min=0) — mode=1 is max
#   pooling, mode=0 sum pooling, fractional interpolates.
#
# The surrogate logit model (deterministic, weight-free): token type t
# contributes, at EVERY one of its tf positions, the same logits
#   identity dim t      : logit = hv_id(t) / 64          ∈ [0, ~3.98]
#   expansion dim x<h6> : logit = (hv_j(t) - 160) / 32   ∈ [-5, ~2.97]
# (hv_* are md5-derived bytes as in the default expander; expansions go
# negative so relu/softplus genuinely differ). Positions of one type have
# identical scores, so pooled_sum per (doc, dim) = Σ_types tf·act(logit)
# and pooled_max = max_types act(logit) — one groupBy computes both.
# Strict > 0 sparsification as everywhere (sparse_index.py:65-68).

ACTIVATIONS = ("log1p_relu", "log1p_softplus", "softplus", "relu")


def _check_pooling(pooling_mode: float, activation: str) -> None:
    if activation not in ACTIVATIONS:
        raise ValueError(
            f"activation must be one of {ACTIVATIONS}, got {activation!r}"
        )
    if not (0.0 <= float(pooling_mode) <= 1.0):
        raise ValueError(f"pooling_mode must be in [0, 1], got {pooling_mode}")


def _act_col(x, activation: str):
    if activation == "relu":
        return F.greatest(x, F.lit(0.0))
    if activation == "softplus":
        return F.log1p(F.exp(x))
    if activation == "log1p_relu":
        return F.log1p(F.greatest(x, F.lit(0.0)))
    return F.log1p(F.log1p(F.exp(x)))  # log1p_softplus


def _act_py(x: float, activation: str) -> float:
    if activation == "relu":
        return max(x, 0.0)
    if activation == "softplus":
        return math.log1p(math.exp(x))
    if activation == "log1p_relu":
        return math.log1p(max(x, 0.0))
    return math.log1p(math.log1p(math.exp(x)))


def _act_sql(expr: str, activation: str) -> str:
    if activation == "relu":
        return f"greatest({expr}, 0.0)"
    if activation == "softplus":
        return f"ln(1.0 + exp({expr}))"
    if activation == "log1p_relu":
        return f"ln(1.0 + greatest({expr}, 0.0))"
    return f"ln(1.0 + ln(1.0 + exp({expr})))"


def expand_terms_pooled(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: EngineConfig = DEFAULT,
    *,
    pooling_mode: float = 1.0,
    activation: str = "log1p_relu",
    value_dtype: str = "float",
) -> DataFrame:
    """(id, text) → (doc_id, term, weight) under the reference's full
    (pooling_mode, activation) grid. Pure Column expressions; the single
    groupBy carries both pooled aggregates. ``value_dtype`` mirrors the
    reference's encoder dtype knob ("float" = f32 engine pinning,
    "double" for quantization-free oracle comparison)."""
    _check_pooling(pooling_mode, activation)
    if value_dtype not in ("float", "double"):
        raise ValueError(f"value_dtype must be float or double, got {value_dtype!r}")
    tf = (
        docs.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.explode(tokens_col(text_col, cfg.max_tokens)).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    h_id = F.md5(F.concat(F.col("tok"), F.lit(":id")))
    cands = [
        tf.select(
            "doc_id", "tf", F.col("tok").alias("term"),
            (F.conv(F.substring(h_id, 1, 2), 16, 10).cast("int")
             / F.lit(64.0)).alias("logit"),
        )
    ]
    for j in range(N_EXPANSIONS):
        h = F.md5(F.concat(F.col("tok"), F.lit(f":{j}")))
        cands.append(
            tf.select(
                "doc_id", "tf",
                F.concat(F.lit("x"), F.substring(h, 1, 6)).alias("term"),
                ((F.conv(F.substring(h, 7, 2), 16, 10).cast("int")
                  - F.lit(RELU_SHIFT)) / F.lit(RELU_SCALE)).alias("logit"),
            )
        )
    allc = cands[0]
    for c in cands[1:]:
        allc = allc.unionByName(c)
    act = _act_col(F.col("logit"), activation)
    mode = float(pooling_mode)
    pooled = (
        allc.select("doc_id", "term", "tf", act.alias("a"))
        .groupBy("doc_id", "term")
        .agg(
            F.sum(F.col("tf") * F.col("a")).alias("s"),
            F.greatest(F.max("a"), F.lit(0.0)).alias("m"),
        )
        .select(
            "doc_id", "term",
            (F.col("s") + (F.col("m") - F.col("s")) * F.lit(mode))
            .cast(value_dtype).alias("weight"),
        )
    )
    return pooled.filter(F.col("weight") > 0)


def _expand_pooled_one_py(
    text: str | None,
    max_tokens: int,
    pooling_mode: float,
    activation: str,
) -> dict[str, float]:
    """Python oracle for one document under the (mode, activation) grid."""
    _check_pooling(pooling_mode, activation)
    toks = tokenize_py(text, max_tokens)
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    contribs: dict[str, list[tuple[int, float]]] = {}
    for t, n in tf.items():
        h_id = hashlib.md5(f"{t}:id".encode()).hexdigest()
        contribs.setdefault(t, []).append((n, int(h_id[:2], 16) / 64.0))
        for j in range(N_EXPANSIONS):
            h = hashlib.md5(f"{t}:{j}".encode()).hexdigest()
            logit = (int(h[6:8], 16) - RELU_SHIFT) / RELU_SCALE
            contribs.setdefault("x" + h[:6], []).append((n, logit))
    out: dict[str, float] = {}
    for term, rows in contribs.items():
        acts = [(n, _act_py(x, activation)) for n, x in rows]
        s = sum(n * a for n, a in acts)
        m = max(0.0, max(a for _, a in acts))
        w = s + (m - s) * float(pooling_mode)
        if w > 0:
            out[term] = w
    return out


def expand_pooled_sql(
    src: str,
    id_expr: str,
    text_expr: str,
    max_tokens: int = DEFAULT.max_tokens,
    *,
    pooling_mode: float = 1.0,
    activation: str = "log1p_relu",
) -> str:
    """DuckDB CTE body yielding pooled (doc_id, term, weight) for ``src``."""
    _check_pooling(pooling_mode, activation)
    hv_id = _hex2int_sql("substr(md5(tok || ':id'), 1, 2)")
    hv_j = _hex2int_sql("substr(md5(tok || ':' || j), 7, 2)")
    mode = float(pooling_mode)
    return f"""
ptf_{src} AS (
  SELECT CAST({id_expr} AS VARCHAR) AS doc_id, tok, count(*) AS tf
  FROM (SELECT {id_expr}, unnest({tokens_sql(text_expr, max_tokens)}) AS tok
        FROM {src}) GROUP BY 1, 2
),
pcand_{src} AS (
  SELECT doc_id, tf, tok AS term, {hv_id} / 64.0 AS logit FROM ptf_{src}
  UNION ALL
  SELECT doc_id, tf,
         'x' || substr(md5(tok || ':' || j), 1, 6) AS term,
         ({hv_j} - {RELU_SHIFT}) / {RELU_SCALE} AS logit
  FROM ptf_{src} CROSS JOIN (SELECT unnest(range({N_EXPANSIONS})) AS j)
),
pooled_{src} AS (
  SELECT doc_id, term,
         sum(tf * {_act_sql('logit', activation)})
         + (greatest(max({_act_sql('logit', activation)}), 0.0)
            - sum(tf * {_act_sql('logit', activation)})) * {mode} AS weight
  FROM pcand_{src} GROUP BY doc_id, term
  HAVING sum(tf * {_act_sql('logit', activation)})
         + (greatest(max({_act_sql('logit', activation)}), 0.0)
            - sum(tf * {_act_sql('logit', activation)})) * {mode} > 0
)"""


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

def _hex2int_sql(expr: str) -> str:
    """Portable 2-hex-char → int (no from_hex dependency)."""
    return (
        f"((strpos('{HEX}', substr({expr}, 1, 1)) - 1) * 16 + "
        f"(strpos('{HEX}', substr({expr}, 2, 1)) - 1))"
    )


def expand_sql(src: str, id_expr: str, text_expr: str,
               max_tokens: int = DEFAULT.max_tokens) -> str:
    """DuckDB CTE body yielding (doc_id, term, weight) for ``src`` rows."""
    hv = _hex2int_sql("substr(md5(tok || ':' || j), 7, 2)")
    return f"""
tf_{src} AS (
  SELECT CAST({id_expr} AS VARCHAR) AS doc_id, tok, count(*) AS tf
  FROM (SELECT {id_expr}, unnest({tokens_sql(text_expr, max_tokens)}) AS tok
        FROM {src}) GROUP BY 1, 2
),
cand_{src} AS (
  SELECT doc_id, tok AS term, ln(1.0 + tf) AS weight FROM tf_{src}
  UNION ALL
  SELECT doc_id,
         'x' || substr(md5(tok || ':' || j), 1, 6) AS term,
         ln(1.0 + greatest({hv} - {RELU_SHIFT}, 0) / {RELU_SCALE}) AS weight
  FROM tf_{src} CROSS JOIN (SELECT unnest(range({N_EXPANSIONS})) AS j)
),
exp_{src} AS (
  SELECT doc_id, term, max(weight) AS weight
  FROM cand_{src} GROUP BY doc_id, term HAVING max(weight) > 0
)"""
