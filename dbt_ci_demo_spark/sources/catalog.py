"""Source registration — the engine's equivalent of dbt's ``source()``.

The reference declares external tables in YAML (models/sources.yml:3-8,
source ``src_github.languages``) and resolves ``{{ source(...) }}`` to a
fully-qualified relation name at compile time. Here a :class:`SourceCatalog`
maps logical names to DataFrames backed by parquet under a scale-factor
directory, and can register them as temp views so model SQL can reference
them by name (the Spark analog of the compiled relation name).

Type normalization: the driver testdata stores ``events.ts`` as parquet
TIMESTAMP(NANOS). Spark reads it as nanos-since-epoch BIGINT (via
``spark.sql.legacy.parquet.nanosAsLong``); we truncate to microseconds with
integer division (``ts div 1000`` — NOT float division, which rounds) and
produce TIMESTAMP_NTZ. This matches DuckDB's TIMESTAMP_NS → TIMESTAMP cast
bit-for-bit, which is what the correctness oracle sees.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def _normalize_nanos_timestamps(df: DataFrame) -> DataFrame:
    """Convert any BIGINT column that is actually nanos-since-epoch back to
    TIMESTAMP_NTZ (µs precision, truncating — the DuckDB-compatible read).

    Column is recognized by name convention: only ``ts`` in the driver
    fixtures; kept generic via an explicit allowlist.
    """
    out = df
    for name in ("ts",):
        if name in df.columns and isinstance(df.schema[name].dataType, T.LongType):
            # FLOOR division, exact in int64 (r10 review finding,
            # confirmed live): bare `div` truncates toward zero, but
            # DuckDB's TIMESTAMP_NS -> TIMESTAMP cast floors, so a
            # pre-epoch nanos value diverged by 1µs. pmod's non-negative
            # remainder makes the subtraction an exact multiple, so the
            # truncation IS the floor — no double math (ns magnitudes
            # exceed 2^53).
            out = out.withColumn(
                name,
                F.timestamp_micros(
                    F.expr(f"(`{name}` - pmod(`{name}`, 1000)) div 1000")
                ).cast("timestamp_ntz"),
            )
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table from ``{sf_dir}/{name}.parquet``."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return _normalize_nanos_timestamps(spark.read.parquet(path))


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each fixture table as a session temp view under its name.
    An explicitly EMPTY list registers nothing (r10 review finding: the
    falsy ``or`` idiom silently registered all ten fixture views for a
    caller whose computed subset came out empty)."""
    for name in (TABLES if tables is None else tables):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


class SourceCatalog:
    """Logical-name → DataFrame resolution with environment awareness.

    Mirrors the reference's source + namespace model (SURVEY.md §1.3):
    the same DAG reads sources from a stable location while writing into an
    environment-specific database (prod ``dbt_ci`` vs per-PR
    ``dbt_ci_pr_<N>``; test_profiles/profiles.yml:9,20).
    """

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
        self._overrides: dict[str, DataFrame] = {}

    def add(self, name: str, df: DataFrame) -> None:
        """Register/override a source by name (used by tests and deferral)."""
        self._overrides[name] = df

    def table(self, name: str) -> DataFrame:
        if name in self._overrides:
            return self._overrides[name]
        if name in TABLES:
            return load_table(self.spark, self.sf_dir, name)
        # Fall back to anything visible in the Spark catalog (managed tables,
        # temp views) so models can ref() materialized upstream models.
        return self.spark.table(name)

    def register_all(self) -> None:
        register_views(self.spark, self.sf_dir)
