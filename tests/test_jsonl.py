"""JSONL corpus source/sink contracts (sources/jsonl_corpus.py):
declared-schema reads with corrupt-line quarantine, and shard-controlled
writes. Complements the roundtrip test in test_operators.py."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from emission_project_spark.sources.jsonl_corpus import (
    read_jsonl_corpus,
    write_jsonl_corpus,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


def test_jsonl_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en") for i in range(100)], DOC_SCHEMA
    )
    out = str(tmp_path / "corpus")
    write_jsonl_corpus(docs, out)
    back, bad = read_jsonl_corpus(spark, out, DOC_SCHEMA)
    assert back.count() == 100 and bad.count() == 0
    assert {r.doc_id for r in back.collect()} == set(range(100))
    assert back.schema == DOC_SCHEMA


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    """A malformed line neither fails the scan nor leaks a half-parsed
    row; it lands in the quarantine stream verbatim. Neither path needs
    a cache of the parsed corpus."""
    p = tmp_path / "dump.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "good", "lang": "en"}),
        "{not json at all",
        json.dumps({"doc_id": 2, "text": "also good", "lang": "fi"}),
    ]
    p.write_text("\n".join(lines) + "\n")
    clean, quarantined = read_jsonl_corpus(spark, str(p), DOC_SCHEMA)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    rows = quarantined.collect()
    assert len(rows) == 1
    assert rows[0].raw_line == "{not json at all"


def test_jsonl_sharded_write_balanced(spark, tmp_path):
    """partitions + shard_by produces exactly N part files with no empty
    shard and no skew bake-in, even when the input arrives keyed by a
    skewed column."""
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 10 else "fi") for i in range(1000)],
        DOC_SCHEMA,
    ).repartition(F.col("lang"))  # skewed upstream partitioning
    out = str(tmp_path / "shards")
    write_jsonl_corpus(
        docs, out, partitions=8, shard_by="doc_id", compression="gzip"
    )
    parts = sorted(glob.glob(os.path.join(out, "part-*.json.gz")))
    assert len(parts) == 8
    back, _ = read_jsonl_corpus(spark, out, DOC_SCHEMA)
    assert back.count() == 1000
    sizes = [os.path.getsize(p) for p in parts]
    assert min(sizes) > 0
    assert max(sizes) < 3 * (sum(sizes) / len(sizes))  # no shard hogs the corpus


def test_jsonl_deterministic_sharding(spark, tmp_path):
    """Same data + same shard_by -> identical row-to-shard placement
    across runs (hash-based, not round-robin)."""
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en") for i in range(200)], DOC_SCHEMA
    )

    def shard_map(out):
        write_jsonl_corpus(docs, out, partitions=4, shard_by="doc_id")
        mapping = {}
        for p in glob.glob(os.path.join(out, "part-*.json")):
            shard = os.path.basename(p).split("-")[1]
            for line in open(p):
                mapping[json.loads(line)["doc_id"]] = shard
        return mapping

    a = shard_map(str(tmp_path / "runA"))
    b = shard_map(str(tmp_path / "runB"))
    assert a == b
