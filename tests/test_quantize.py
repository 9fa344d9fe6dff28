"""int8 quantization primitives (functions/vectors.py): grid error
bound, clamp, zero-vector guard — the invariants behind the
embedding_quantize_error registered query."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from emission_project_spark.functions.vectors import (
    int8_dequantize,
    int8_quantize,
    int8_scale,
)


@pytest.fixture(scope="module")
def quantized(spark):
    rng = np.random.default_rng(7)
    vecs = [[float(v) for v in rng.normal(size=16)] for _ in range(50)]
    vecs.append([0.0] * 16)  # zero vector: scale 0 path
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["id", "e"]
    )
    out = df.select(
        "id",
        "e",
        int8_scale("e").alias("scale"),
        int8_quantize("e", int8_scale("e")).alias("codes"),
    ).withColumn("dq", int8_dequantize("codes", F.col("scale")))
    return vecs, out.collect()


def test_codes_bounded(quantized):
    _, rows = quantized
    for r in rows:
        assert all(-127 <= c <= 127 for c in r["codes"])


def test_elementwise_error_within_half_step(quantized):
    vecs, rows = quantized
    for r in rows:
        scale = r["scale"]
        for x, y in zip(vecs[r["id"]], r["dq"]):
            assert abs(x - y) <= scale / 2 + 1e-12


def test_max_magnitude_hits_127(quantized):
    vecs, rows = quantized
    for r in rows:
        if r["scale"] == 0:
            continue
        assert max(abs(c) for c in r["codes"]) == 127


def test_zero_vector_roundtrips_to_zero(quantized):
    _, rows = quantized
    zero = [r for r in rows if r["scale"] == 0]
    assert len(zero) == 1
    assert all(c == 0 for c in zero[0]["codes"])
    assert all(v == 0.0 for v in zero[0]["dq"])
