"""Scalable deduplication operators over the ``documents`` table.

Techniques (public literature: Broder '97 minhash/shingling; Charikar
'02 simhash; standard LSH banding as in Mining of Massive Datasets):

- exact dedup: hash group-by on a canonical fingerprint
- n-gram (shingle) Jaccard near-dup: explode shingles → self-join on
  shingle → per-pair intersection counts
- MinHash + LSH banding: per-band signature = min hash over shingles
  with a per-band salt; docs sharing any band signature are candidates
- SimHash: sign-aggregated bit fingerprint, hamming-близкие buckets

Design for 100 TB: all of these are shuffle-on-key group-bys/joins
with no driver materialization. The LSH band join keys on
(band, signature) — cardinality ~n_docs×bands — and AQE handles hot
buckets; shingle explosion is bounded per-doc and map-side.

Hash discipline: md5 (hex string) is the shared deterministic hash —
identical in Spark and DuckDB — so every signature is oracle-checkable.
Min over hex strings = min over the underlying 128-bit integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from emission_project_spark.functions.text import fingerprint, tokens

DEFAULT_SHINGLE = 3
DEFAULT_BANDS = 8


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of exact (whitespace/punct-insensitive) duplicates:
    one row per fingerprint with the canonical (min) doc id and count."""
    return (
        docs.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = DEFAULT_SHINGLE) -> DataFrame:
    """Distinct word k-shingles per document: (id, shingle)."""
    toks = tokens(F.lower(F.col(text_col)))
    # sliding window over the token array, JVM-side; sequence() counts
    # DOWN when start > stop, so short docs need the explicit guard
    sh = F.when(F.size(toks) >= k, F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs by exact shingle-set Jaccard ≥ threshold.

    explode → self-join on shingle → count intersections → Jaccard.
    The self-join is the scale hazard: a stop-shingle shared by every
    doc produces a quadratic bucket. At 100 TB you cap shingle document
    frequency first (drop shingles appearing in > f docs — they carry
    no discriminative signal); the cap keeps buckets bounded.
    """
    sh = shingles(docs, text_col, id_col, k).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_band_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Per-(doc, band) minhash signature.

    One md5 family per band (salted by band id); the signature is the
    minimum hash over the doc's shingle set — a standard 1-hash-per-band
    MinHash/LSH scheme (equivalent to r=1 rows/band: P[band match] =
    exact Jaccard). Entirely group-by aggregation; no UDFs.
    """
    sh = shingles(docs, text_col, id_col, k)
    banded = sh.withColumn(
        "band", F.explode(F.array(*[F.lit(i) for i in range(bands)]))
    )
    return (
        banded.select(
            "doc_id",
            "band",
            F.md5(F.concat_ws("|", F.col("band").cast("string"), F.col("shingle"))).alias("h"),
        )
        .groupBy("doc_id", "band")
        .agg(F.min("h").alias("signature"))
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 band signature, with
    the number of agreeing bands (bands_agree / bands estimates
    Jaccard). Bucket join on (band, signature) — the LSH trick that
    replaces the quadratic all-pairs comparison at scale."""
    sig = minhash_band_signatures(docs, text_col, id_col, k, bands)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.signature") == F.col("b.signature"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("bands_agree"))
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """SimHash fingerprint from token hashes (Charikar '02).

    Per token: take ``bits`` bits of md5; per bit position, sum (+1/-1);
    fingerprint bit = sign. Expressed as explode + group-by over
    (doc, bit) then a bit-weighted sum — all built-ins. 32 bits keeps
    the per-doc row blow-up (n_tokens × 1) and the aggregate compact.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    # token hash as a bigint from 15 hex chars (60 bits, no overflow)
    hashed = toks.select(
        "doc_id", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint").alias("h")
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    per_bit = (
        hashed.select("doc_id", "h", bit)
        # SQL-level shiftright accepts a column shift amount; the
        # DataFrame fn F.shiftright only takes a literal int
        .withColumn("vote", F.when(F.expr("(shiftright(h, bit) & 1) = 1"), 1).otherwise(-1))
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
    )
    return (
        per_bit.withColumn(
            "bitval",
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("bigint")
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").cast("bigint").alias("simhash"))
    )
