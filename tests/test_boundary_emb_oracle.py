"""Adversarial embeddings-corpus oracle parity — the vector twin of
test_boundary_oracle.py.

Degenerate vectors are where float semantics can silently diverge
between Spark and DuckDB: an all-zero vector makes cosine 0/0, a
signed-permutation-symmetric pair ties distances exactly, opposite
vectors hit cosine -1, and 1e±15 magnitudes stress the rounding grid.
Every embeddings-only registered query must still match its oracle
row-for-row on this corpus.
"""

from __future__ import annotations

import importlib.util
import os
import re
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "compare_mod3", os.path.join(_REPO, "tools", "compare.py")
)
_compare = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_compare)

_DIM = 64


def _vec(fill=0.0, **at):
    v = [fill] * _DIM
    for idx, val in at.items():
        v[int(idx[1:])] = val
    return v


_VECS = [
    (0, _vec(i0=1.0), 0),                       # unit axis 0
    (1, _vec(i0=1.0), 0),                       # identical to 0 → cosine 1, dist 0
    (2, _vec(i0=-1.0), 1),                      # opposite → cosine -1
    (3, _vec(), 1),                             # ALL-ZERO: norm 0, cosine 0/0
    (4, _vec(i1=1e-15), 2),                     # tiny norm
    (5, _vec(i2=1e15), 2),                      # huge norm
    (6, _vec(i0=1.0, i1=1.0), 3),               # 45° from 0
    (7, _vec(i3=1.0), 3),                       # orthogonal to all above
    (8, _vec(fill=0.125), 4),                   # uniform
    (9, _vec(fill=-0.125), 4),                  # uniform negative
    (10, _vec(i0=0.6, i1=0.8), 5),              # unit, same plane as 6
    (11, _vec(i0=0.8, i1=0.6), 5),              # mirror of 10 → distance ties
    (12, _vec(i4=2.5, i5=-2.5), 6),
    (13, _vec(i6=3.0), 6),
    (14, _vec(i0=1.0, i63=1.0), 7),             # last-dimension boundary
    (15, _vec(i63=-4.0), 7),
]


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("emb_boundary"))
    table = pa.table(
        {
            "vec_id": pa.array([v[0] for v in _VECS], type=pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v[1]] for v in _VECS],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([v[2] for v in _VECS], type=pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(d, "embeddings.parquet"))
    return d


def _embeddings_only_queries():
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    others = (
        "region nation customer supplier part orders lineitem events documents"
    ).split()
    out = []
    for name, sql in oracles.items():
        if re.search(r"\bembeddings\b", sql) and not any(
            re.search(rf"\b{t}\b", sql) for t in others
        ):
            out.append((name, queries[name], sql))
    return out


def test_emb_boundary_covers_queries():
    assert len(_embeddings_only_queries()) >= 8


@pytest.mark.parametrize(
    "name,fn,sql",
    _embeddings_only_queries(),
    ids=[n for n, _, _ in _embeddings_only_queries()],
)
def test_emb_boundary_oracle_parity(spark, emb_dir, name, fn, sql):
    con = duckdb.connect()
    con.sql(
        f"CREATE OR REPLACE VIEW embeddings AS"
        f" SELECT * FROM '{emb_dir}/embeddings.parquet'"
    )
    r = _compare.compare_query(spark, con, name, fn, sql, emb_dir)
    assert "error" not in r, r
    assert r.get("cols_match") and r.get("values_match"), r
    assert r["spark_rows"] == r["oracle_rows"], r
