"""Training-data pipeline queries beyond dedup/similarity: deterministic
sampling, data mixing, and skew-safe aggregation.

The reference has no sampling or keyed-skew surface (its only predicate is
the opaque ``filter`` callback, reference src/stream.ts:57-77); these are
north-star additions for 100 TB corpus preparation. Oracles mirror the
Spark expressions symbol-for-symbol via the *_sql builders in
operators/sampling.py — one source of truth for the hash constants.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import sampling, skew
from ..tables import load
from . import query

# Data-mixing recipe for q53: downsample the dominant language hard, keep
# half of everything else (a typical rebalance before tokenization).
_MIX = {"en": 0.05, "zh": 0.5, "fr": 0.5, "de": 0.5, "es": 0.5}


# ------------------------------------------------ Q52 deterministic sample
@query(
    "q52_hash_sample",
    oracle=f"""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE {sampling.sample_hash_sql('doc_id', 0.1, seed=7)}
        ORDER BY doc_id
    """,
    tags=("sampling", "llm"),
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 10% corpus sample by key-hash threshold — reproducible
    across runs AND engines (the oracle runs the identical arithmetic),
    nested under larger fractions, and a pure scan-side codegen predicate
    (no rand(), no shuffle, pushes to the parquet scan).
    See operators/sampling.py for the 100 TB argument."""
    (documents,) = load(spark, sf, "documents")
    return (
        sampling.sample_hash(documents, "doc_id", 0.1, seed=7)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# ------------------------------------------------ Q53 stratified data mix
@query(
    "q53_stratified_mix",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS kept_docs,
               SUM(n_chars) AS kept_chars
        FROM documents
        WHERE {sampling.stratified_sample_sql('lang', _MIX, 'doc_id', seed=11)}
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("sampling", "llm"),
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language mixture rebalance: keep 5% of the dominant language and
    50% of the rest, deterministically, in one scan-side CASE predicate —
    the data-mixing step of a training-data pipeline. Reports kept docs and
    chars per language (the numbers a mixing recipe is tuned against)."""
    (documents,) = load(spark, sf, "documents")
    kept = sampling.stratified_sample(
        documents, "lang", _MIX, "doc_id", seed=11
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------ Q54 salted aggregation
@query(
    "q54_salted_agg",
    oracle="""
        SELECT user_id,
               SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) / 10000.0
                   AS sum_value,
               COUNT(event_id) AS cnt
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("skew", "agg"),
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user event totals via the salted two-phase aggregate
    (operators/skew.py): the reduce of a hot key splits across 16 salt
    buckets before the exact merge. The oracle is the PLAIN group-by —
    proving the salted rewrite is semantically invisible. Quantized-sum
    trick for cross-engine double determinism (README rules)."""
    (events,) = load(spark, sf, "events")
    q = events.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 10000 + 0.5).cast("long").alias("qval"),
    )
    agg = skew.salted_agg(
        q,
        ["user_id"],
        [("sum", "qval", "sum_q"), ("count", "event_id", "cnt")],
        parts=16,
    )
    return (
        agg.select(
            "user_id",
            (F.col("sum_q") / F.lit(10000.0)).alias("sum_value"),
            "cnt",
        ).orderBy("user_id")
    )
