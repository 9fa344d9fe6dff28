"""Semantic ground-truth for text_quality_linear_classifier and
stats_winsorized_doc_lengths — a pure-Python reference computes the
expected values on a hand-built corpus, independently of BOTH engines
(the boundary-docs suite already checks Spark==DuckDB on adversarial
inputs; this file checks they agree with the formula's meaning)."""

from __future__ import annotations

import hashlib
import math
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from emission_project_spark.plans.quality_gates import (
    _CLF_D,
    _CLF_SCALE,
    stats_winsorized_doc_lengths,
    text_quality_linear_classifier,
)

_DOCS = [
    (1, "alpha beta gamma delta", "en"),
    (2, "alpha alpha alpha", "en"),
    (3, "", "en"),                      # zero tokens → 0.5 prior
    (4, "... !!! ???", "en"),           # tokenizes to nothing
    (5, "one two three four five six seven eight nine ten", "en"),
    (6, "x", "fr"),
    (7, "x y", "fr"),
    (8, "x y z", "fr"),
    (9, "x y z w", "fr"),
    (10, "x y z w v u t s", "fr"),      # fr length outlier
]


def _h7(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _weight(bucket: int) -> int:
    return _h7(str(bucket)) % 2001 - 1000


def _expected_clf(text: str):
    toks = re.findall(r"\w+", text.lower())
    if not toks:
        return 0, 0.0, 0.5, True
    swi = sum(_weight(_h7(t) % _CLF_D) for t in toks)
    logit = swi / (_CLF_SCALE * len(toks))
    # same floor(x·1e6+0.5)/1e6 grid as the plan (round(x, 6) ties
    # differently at exact .5 boundaries — the reason the plan uses it)
    return (
        len(toks),
        math.floor(logit * 1e6 + 0.5) / 1e6,
        round(1 / (1 + math.exp(-logit)), 6),
        swi >= 0,
    )


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clf_docs"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([t[0] for t in _DOCS], type=pa.int64()),
                "text": pa.array([t[1] for t in _DOCS], type=pa.string()),
                "lang": pa.array([t[2] for t in _DOCS], type=pa.string()),
                "source": pa.array(["web"] * len(_DOCS), type=pa.string()),
                "n_chars": pa.array(
                    [len(t[1]) for t in _DOCS], type=pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_classifier_matches_python_reference(spark, docs_dir):
    got = {
        r["doc_id"]: (r["n_tokens"], r["logit"], r["p_keep"], r["keep"])
        for r in text_quality_linear_classifier(spark, docs_dir).collect()
    }
    assert set(got) == {t[0] for t in _DOCS}
    for doc_id, text, _ in _DOCS:
        assert got[doc_id] == _expected_clf(text), (doc_id, text)


def test_winsorized_fr_slice_against_reference(spark, docs_dir):
    """fr lengths = [1,2,3,4,8]: p05=1.2, p95=7.2 ((n-1)p linear
    interpolation), winsorized=[1.2,2,3,4,7.2] → 3.48, trimmed=[2,3,4]
    → 3.0, plain mean 3.6 — the three means must separate exactly."""
    rows = {r["lang"]: r for r in stats_winsorized_doc_lengths(spark, docs_dir).collect()}
    fr = rows["fr"]
    assert fr["n_docs"] == 5
    assert fr["mean_len"] == 3.6
    assert fr["p05"] == 1.2 and fr["p95"] == 7.2
    assert fr["winsorized_mean"] == 3.48
    assert fr["trimmed_mean"] == 3.0
