"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's
models/aggr_repo_languages.sql re-expressed Spark-first) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB-checkable ANSI-SQL oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's session conventions to the driver's session."""
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dbt_ci_demo_spark.queries import flagship_repo_languages

    return flagship_repo_languages(_configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dbt_ci_demo_spark.queries import registry_queries

    regs = registry_queries()
    return {
        name: (lambda spark, sf_dir, _fn=fn: _fn(_configure(spark), sf_dir))
        for name, fn in regs.items()
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle per query (same column aliases)."""
    from dbt_ci_demo_spark.queries import registry_oracles

    return registry_oracles()
