"""Deterministic sampling & data-mixing operators for training-data
pipelines.

The reference (song9446/kstreamjs) has no sampling surface — users would
write an ad-hoc ``filter`` callback (reference src/stream.ts:57-77). At
100 TB, sampling must be (a) deterministic and reproducible across runs and
engines, (b) a pure scan-side predicate so it pushes into the read and
costs zero shuffle, and (c) *nested*: sample(5%) must be a subset of
sample(10%) under the same seed, so sample sizes can be tuned without
resampling the corpus. ``rand()``-based sampling has none of these
properties; threshold-hash sampling has all three.

Design: hash the stable row key with a 32-bit LCG step
``h = (key mod 2^32) * A + C mod 2^32`` and keep the row iff
``h < fraction * 2^32``.  The arithmetic is plain BIGINT multiply/add/mod —
identical in Spark and DuckDB (so the oracle can hash-match it exactly),
never overflows int64 (A < 2^31, so (2^32-1)*A + C < 2^63), and is a pure
whole-stage-codegen expression: the filter pushes to the parquet scan and
the sample never materializes the unsampled rows.

At 100 TB: this is a tight filter over a full scan — embarrassingly
parallel, no shuffle, no state. For repeated sampling of the same corpus,
persist ``h`` once as a column and the filter becomes min/max-prunable.
"""

from __future__ import annotations

from collections.abc import Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Classic LCG multiplier/increment (glibc). A < 2^31 keeps the 64-bit
# intermediate product < 2^63 so DuckDB's checked BIGINT math never traps.
_A = 1103515245
_C = 12345
_M = 4294967296  # 2^32


def hash_bucket(key: Column | str, seed: int = 0) -> Column:
    """Deterministic uniform bucket in [0, 2^32) from ANY int64 key.

    The final reduction is pmod (non-negative), not %: both Spark's and
    DuckDB's % follow the dividend's sign, so a plain % on a negative key
    would return a negative bucket that passes every `< threshold` filter
    — in BOTH engines, which is exactly the kind of bug an oracle
    hash-match cannot catch.

    Full-int64 domain by construction: the key is reduced to its mod-2^32
    residue (pmod — in [0, M)) BEFORE the seed add and LCG step, and the
    seed is reduced in Python, so every intermediate is bounded:
    residue + seed < 2^33 and (M-1)*A + C < 2^63. A raw xxhash64 key at
    the int64 edge therefore hashes identically in Spark and DuckDB
    instead of silently wrapping in one and trapping in the other. The
    hash VALUE is unchanged versus the pre-guard form for every key that
    form accepted: the output depends only on (key + seed) mod M, and
    pmod picks a different representative of the same residue class."""
    k = F.col(key) if isinstance(key, str) else key
    inner = (F.pmod(k, F.lit(_M)) + F.lit(seed % _M)) % _M
    return F.pmod(inner * _A + _C, F.lit(_M))


def hash_bucket_sql(key: str, seed: int = 0) -> str:
    """The identical expression in ANSI SQL (DuckDB oracle side); the
    `(x % M + M) % M` form is DuckDB's spelling of pmod. Same full-int64
    domain guarantee as :func:`hash_bucket` — the two strings compute the
    same bounded arithmetic."""
    residue = f"((({key} % {_M}) + {_M}) % {_M})"
    inner = f"(({residue} + {seed % _M}) % {_M})"
    return f"(({inner} * {_A} + {_C}) % {_M})"


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return int(fraction * _M)


def sample_hash(df: DataFrame, key: Column | str, fraction: float,
                seed: int = 0) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, selected by key hash.

    Nested-sample property: for f1 <= f2 (same key/seed), the f1 sample is
    a subset of the f2 sample — thresholds on the same hash.
    """
    return df.filter(hash_bucket(key, seed) < F.lit(_threshold(fraction)))


def sample_hash_sql(key: str, fraction: float, seed: int = 0) -> str:
    """WHERE-clause predicate matching :func:`sample_hash` exactly."""
    return f"{hash_bucket_sql(key, seed)} < {_threshold(fraction)}"


def stratified_sample(df: DataFrame, stratum: Column | str,
                      fractions: Mapping[str, float], key: Column | str,
                      seed: int = 0, default: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive.

    Training-data pipelines rebalance sources/languages by keeping a
    different fraction per stratum (e.g. downsample the dominant language).
    The per-stratum threshold is a CASE expression on the stratum column;
    the whole thing stays one scan-side codegen predicate, no shuffle, and
    each stratum's sample is itself nested under its fraction.
    """
    s = F.col(stratum) if isinstance(stratum, str) else stratum
    thr: Column = F.lit(_threshold(default))
    for value, frac in sorted(fractions.items()):
        thr = F.when(s == value, F.lit(_threshold(frac))).otherwise(thr)
    return df.filter(hash_bucket(key, seed) < thr)


def stratified_sample_sql(stratum: str, fractions: Mapping[str, float],
                          key: str, seed: int = 0,
                          default: float = 0.0) -> str:
    # string strata only (matching the Column-side == on string values);
    # embedded quotes are SQL-escaped by doubling
    for v in fractions:
        if not isinstance(v, str):
            raise TypeError(f"stratum values must be strings, got {v!r}")
    whens = " ".join(
        f"WHEN '{v.replace(chr(39), chr(39) * 2)}' THEN {_threshold(f)}"
        for v, f in sorted(fractions.items())
    )
    case = f"CASE {stratum} {whens} ELSE {_threshold(default)} END"
    return f"{hash_bucket_sql(key, seed)} < {case}"


def weighted_sample(df: DataFrame, key: Column | str, weight: Column | str,
                    scale: float, seed: int = 0) -> DataFrame:
    """Deterministic importance sampling: keep a row with probability
    min(1, scale * weight) — e.g. length-weighted corpus sampling where
    longer documents are proportionally likelier to survive.

    Same LCG bucket as `sample_hash`, but the threshold is per-row:
    `h < scale * weight * 2^32`. Still one scan-side predicate (no
    shuffle, no rand()), still reproducible across engines; the
    comparison is done in DOUBLE on both sides (exact for thresholds
    below 2^53, far above any real scale*weight)."""
    w = F.col(weight) if isinstance(weight, str) else weight
    thr = F.least(F.lit(1.0), F.lit(scale) * w) * F.lit(float(_M))
    return df.filter(hash_bucket(key, seed).cast("double") < thr)


def weighted_sample_sql(key: str, weight: str, scale: float,
                        seed: int = 0) -> str:
    """WHERE-clause predicate matching :func:`weighted_sample` exactly.

    The scale literal is CAST to DOUBLE explicitly: DuckDB types a bare
    decimal literal like 0.0005 as DECIMAL (while 5e-05 parses as
    DOUBLE), and DECIMAL*BIGINT exact arithmetic differs from Spark's
    double product by 1 ulp on ~0.1% of weights — enough to flip the
    keep decision for a hash landing inside the gap."""
    thr = (f"LEAST(CAST(1.0 AS DOUBLE),"
           f" CAST({scale!r} AS DOUBLE) * {weight})"
           f" * CAST({float(_M)!r} AS DOUBLE)")
    return f"CAST({hash_bucket_sql(key, seed)} AS DOUBLE) < {thr}"


def sample_predicate(key: Column | str, fraction: float,
                     seed: int = 0) -> Column:
    """The :func:`sample_hash` keep-predicate as a standalone Column, for
    callers that need BOTH sides of the split (e.g. eval-set carve-outs:
    `pred` selects the held-out set, `~pred` the remainder — exhaustive and
    disjoint by construction)."""
    return hash_bucket(key, seed) < F.lit(_threshold(fraction))
