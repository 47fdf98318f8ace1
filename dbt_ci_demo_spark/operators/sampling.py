"""Deterministic sampling / splitting operators for training-data
pipelines (north-star; the reference has no sampling surface, SURVEY §2.B.8).

Training-data work needs *reproducible* samples: re-running the pipeline
(or re-reading the same row on another executor) must make the same
keep/drop decision, and adding documents must not reshuffle previous
assignments. Spark's ``df.sample`` is seeded per-partition — repartition
the input and the sample changes — so these operators derive every
decision from a content hash of a stable key instead:

- :func:`hash_bucket` — uniform bucket in [0, buckets) from md5(seed|key).
- :func:`hash_sample` — keep rows whose bucket < fraction·buckets.
  Scan-only: no shuffle, predicate runs inside the parquet scan's codegen
  stage, so sampling 1% of 100 TB reads 100 TB once and writes 1 TB with
  zero wide stages.
- :func:`train_val_test_split` — disjoint, exhaustive split column from
  the same bucket (test | val | train). Scan-only, stable under appends.
- :func:`stratified_sample` — exact per-stratum cap: rank rows inside
  each stratum by (hash, key) and keep the first n. One shuffle on the
  strata columns; the hash order makes the kept set a uniform random
  (but reproducible) subset of each stratum. This is the bounded
  "reservoir" for balancing a corpus across languages/sources.

All decisions are md5-based — engine-portable (DuckDB:
``('0x' || substr(md5(expr), 1, 8))::BIGINT``), so the oracle gate checks
bit-identical keep/drop decisions, not just counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 1_000_000


def _key_hash(key: Column, seed: str) -> Column:
    """64-bit-safe integer hash of (seed, key): first 8 md5 hex chars."""
    payload = F.concat_ws("|", F.lit(seed), key.cast("string"))
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def hash_bucket(key: Column, seed: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets) for a stable key."""
    return _key_hash(key, seed) % buckets


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Reproducible ``fraction`` sample keyed on ``key_col``.

    Deterministic across runs, partitionings, and engines; stable under
    appends (new rows don't change old decisions). The filter is a pure
    column predicate — no shuffle, no RNG state."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(round(fraction * BUCKETS))
    return df.filter(hash_bucket(F.col(key_col), seed) < cut)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    val_fraction: float = 0.0,
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to 'test' / 'val' / 'train', disjoint and exhaustive,
    from the same hash bucket — the canonical leakage-safe split (a given
    document lands in the same split in every run and at every scale)."""
    if test_fraction < 0 or val_fraction < 0 or test_fraction + val_fraction > 1:
        raise ValueError("fractions must be >= 0 and sum to <= 1")
    b = hash_bucket(F.col(key_col), seed)
    test_cut = int(round(test_fraction * BUCKETS))
    val_cut = test_cut + int(round(val_fraction * BUCKETS))
    split = (
        F.when(b < test_cut, F.lit("test"))
        .when(b < val_cut, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(split_col, split)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    n_per_stratum: int,
    seed: str = "strat",
) -> DataFrame:
    """Exact cap of ``n_per_stratum`` rows per stratum, chosen uniformly
    (hash order) and reproducibly.

    One shuffle, on the strata columns. With few large strata (languages)
    a rank-window is the right plan: the window's sort is per-partition
    and AQE splits skewed strata readers. The (hash, key) order key is a
    total order, so the kept set is unique — no ties, no run-to-run drift.
    """
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    order = [_key_hash(F.col(key_col), seed).asc(), F.col(key_col).asc()]
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )
