"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2.12): exact, token-set, MinHash+LSH near-dup, SimHash.

Scale design (100 TB):
- exact/token-set dedup is one hash-groupBy — a single shuffle on the
  16-byte fingerprint, with map-side partial aggregation;
- MinHash LSH: signatures are computed scan-side (no shuffle), then
  explode(bands) -> shuffle keyed by (band, bucket) -> per-bucket
  self-join. Candidate volume is bounded by the banding s-curve, never
  O(n^2); exact Jaccard verification happens only on candidates;
- SimHash: 64-bit signature per doc from token hashes, again scan-side;
  near-dup candidates via matching any 16-bit chunk.
All hashing is md5-based so the DuckDB oracle reproduces results
bit-for-bit (no engine-private hash functions on any result path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.functions.text import (
    distinct_tokens,
    lsh_band_buckets,
    minhash_signature,
    text_fingerprint,
    token_set_fingerprint,
)

# Portable hex-nibble -> integer value: position() is 1-based in both
# Spark and DuckDB, so value = position(ch IN alphabet) - 1.
_HEX = "0123456789abcdef"


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical (normalized) texts: keep lowest id as canonical,
    report group size. ``dup_count > 1`` rows are removable duplicates."""
    return (
        df.withColumn("fp", text_fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def token_set_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup groups by order-insensitive token-set fingerprint."""
    return (
        df.withColumn("fp", token_set_fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 8,
    rows: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs with exact-Jaccard verification.

    1. signature: k md5-minhashes over the distinct-token set (scan-side);
    2. banding: md5 bucket per band; explode -> candidates share a bucket;
    3. verify: exact Jaccard on token sets, keep >= threshold.
    Returns (id_a, id_b, jaccard) with id_a < id_b, deduped across bands.
    """
    docs = df.select(
        F.col(id_col).alias("id"),
        distinct_tokens(F.col(text_col)).alias("toks"),
        lsh_band_buckets(minhash_signature(F.col(text_col), k), bands, rows).alias(
            "buckets"
        ),
    )
    banded = docs.select(
        "id", "toks", F.explode("buckets").alias("bucket")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.toks").alias("toks_a"),
            F.col("b.toks").alias("toks_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    return (
        cand.withColumn(
            "jaccard", F.round(inter.cast("double") / union.cast("double"), 6)
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document as a 64-char bit string.

    bit_b = sign of sum over distinct tokens of (2*h_b(token) - 1) where
    h_b is bit b of md5(token): bit (3 - b%4) of hex nibble b//4.
    Integer-only math + md5 => identical in the DuckDB oracle (which
    extracts the nibble value via position() instead of conv — same
    values, engine-native syntax).
    """
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(distinct_tokens(F.col(text_col)), lambda t: F.md5(t)).alias("hs"),
    )
    # two-arg closure factory: HOF lambdas must take exactly the callback
    # arity (extra default args become bound lambda-variable Columns)
    def bit_acc(pos: int, shift: int):
        return (
            lambda acc, h: acc
            + F.shiftright(F.conv(F.substring(h, pos, 1), 16, 10).cast("int"), shift)
            .bitwiseAND(F.lit(1))
            * F.lit(2)
            - F.lit(1)
        )

    bit_chars = []
    for b in range(64):
        contrib = F.aggregate(F.col("hs"), F.lit(0), bit_acc(b // 4 + 1, 3 - b % 4))
        bit_chars.append(F.when(contrib > 0, F.lit("1")).otherwise(F.lit("0")))
    return hashed.select("doc_id", F.concat(*bit_chars).alias("simhash"))
