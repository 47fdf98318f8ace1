"""The local mirror of the driver's correctness gate: every registered
query must hash-match its DuckDB oracle at sf0.001 (fast; the driver runs
sf0.01)."""

from __future__ import annotations

import pytest

from dbt_ci_demo_spark import queries as q
from dbt_ci_demo_spark.oracle_check import check_query


def _names():
    return sorted(q.registry_queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    r = check_query(spark, duck, name, sf_dir)
    assert r.ok, f"{name}: {r.detail} {r.mismatches[:3]}"


def test_all_queries_have_entries():
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert qs, "queries() must not be empty"
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracles without queries: {unknown}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"name", "repositories_number"}
