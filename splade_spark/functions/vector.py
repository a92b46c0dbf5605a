"""Dense-vector column helpers — pure Catalyst expressions (JVM,
whole-stage codegen, no Python).

- ``dot``: array dot product via zip_with + aggregate (SURVEY §2.8 F5,
  /root/reference/src/utils/sparse_encoder.py:66-73).
- ``l2_norm`` / ``l2_normalize``: the reference's optional
  ``F.normalize(emb, p=2, dim=-1)`` (SURVEY §2.8 F4,
  /root/reference/src/model/retriever/sparse/neural/splade.py:280-293,
  default off per config/model/_base.yaml:15). Zero vectors pass through
  unchanged (torch.nn.functional.normalize's eps clamp analogue).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a[i]·b[i] as double."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def l2_normalize(a: Column | str) -> Column:
    """array<double> scaled to unit L2 norm; zero vectors unchanged."""
    arr = _c(a)
    nrm = l2_norm(arr)
    return F.when(
        nrm > 0, F.transform(arr, lambda v: v.cast("double") / nrm)
    ).otherwise(F.transform(arr, lambda v: v.cast("double")))
