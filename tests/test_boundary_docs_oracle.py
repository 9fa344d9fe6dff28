"""Adversarial documents-corpus oracle parity — the text twin of
test_boundary_oracle.py.

String splitting, tokenizing, and hashing are the places where Spark
and DuckDB semantics can silently diverge (empty-split behavior,
regex dialects, unicode), and the generated word-soup testdata never
stresses them. This corpus does: empty and whitespace-only texts, a
single word, one word repeated, exact duplicates, a near-duplicate
pair, unicode (accents + CJK), punctuation-only, digits, and a very
long token. Every documents-only registered query must still match
its oracle row-for-row.
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
    "compare_mod2", os.path.join(_REPO, "tools", "compare.py")
)
_compare = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_compare)

_TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (2, "the quick brown fox jumps over the lazy dog", "en", "web"),   # exact dup
    (3, "the quick brown fox leaps over the lazy dog", "en", "web"),   # near dup
    (4, "", "en", "web"),                                              # empty
    (5, "   ", "en", "web"),                                           # whitespace only
    (6, "word", "en", "web"),                                          # single word
    (7, "spam spam spam spam spam spam spam spam", "en", "web"),       # one token repeated
    (8, "résumé naïve café über straße", "fr", "web"),                 # accents
    (9, "数据 处理 管道 质量 评分", "zh", "web"),                        # CJK
    (10, "!!! ??? ... ,,, ;;; :::", "en", "web"),                      # punctuation only
    (11, "12345 67890 3.14159 -42 1e9", "en", "web"),                  # digits
    (12, "a " + "x" * 5000 + " b", "en", "web"),                       # very long token
    (13, "Mixed CASE Words mixed case WORDS", "en", "web"),            # case handling
    (14, "tab\tseparated\twords and\nnewline\nwords", "en", "web"),    # exotic whitespace
]


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("docs_boundary"))
    table = pa.table(
        {
            "doc_id": pa.array([t[0] for t in _TEXTS], type=pa.int64()),
            "text": pa.array([t[1] for t in _TEXTS], type=pa.string()),
            "lang": pa.array([t[2] for t in _TEXTS], type=pa.string()),
            "source": pa.array([t[3] for t in _TEXTS], type=pa.string()),
            "n_chars": pa.array([len(t[1]) for t in _TEXTS], type=pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(d, "documents.parquet"))
    return d


def _documents_only_queries():
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    others = (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split()
    out = []
    for name, sql in oracles.items():
        if re.search(r"\bdocuments\b", sql) and not any(
            re.search(rf"\b{t}\b", sql) for t in others
        ):
            out.append((name, queries[name], sql))
    return out


def test_docs_boundary_covers_queries():
    assert len(_documents_only_queries()) >= 15


@pytest.mark.parametrize(
    "name,fn,sql",
    _documents_only_queries(),
    ids=[n for n, _, _ in _documents_only_queries()],
)
def test_docs_boundary_oracle_parity(spark, docs_dir, name, fn, sql):
    con = duckdb.connect()
    con.sql(
        f"CREATE OR REPLACE VIEW documents AS"
        f" SELECT * FROM '{docs_dir}/documents.parquet'"
    )
    r = _compare.compare_query(spark, con, name, fn, sql, docs_dir)
    assert "error" not in r, r
    assert r.get("cols_match") and r.get("values_match"), r
    assert r["spark_rows"] == r["oracle_rows"], r
