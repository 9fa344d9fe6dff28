"""Vector math over ``array<float|double>`` columns — JVM-side.

Built from ``aggregate``/``zip_with`` higher-order functions so the hot
path stays inside Tungsten codegen; no Python UDFs. Used by the
similarity-search operators (extensions/similarity.py).

Determinism note: folds run in array-element order, so the same doubles
come out on every engine that folds sequentially — important for
oracle hash-matching of similarity scores.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two equal-length arrays."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null/zero-norm guarded to null."""
    d = dot(a, b)
    n = l2_norm(a) * l2_norm(b)
    return F.when(n > 0, d / n)
