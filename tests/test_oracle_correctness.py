"""The local mirror of the driver's correctness gate: every registered
query must hash-match its DuckDB oracle at sf0.001 (fast; the driver runs
sf0.01)."""

from __future__ import annotations

import pytest

from dbt_ci_demo_spark import queries as q
from dbt_ci_demo_spark.oracle_check import check_query


def _names():
    return sorted(q.registry_queries())


@pytest.mark.slow  # oracle-gate mirror tier: run with --runslow (round close)
@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    r = check_query(spark, duck, name, sf_dir)
    assert r.ok, f"{name}: {r.detail} {r.mismatches[:3]}"


def test_priority_list_pins_registry():
    """The driver checks a bounded registry prefix, so the explicit priority
    order must cover the registry exactly — a new query that isn't slotted
    into _PRIORITY would silently land in the unchecked tail."""
    assert set(q._PRIORITY) == set(q._REGISTRY), (
        set(q._PRIORITY) ^ set(q._REGISTRY)
    )
    assert len(q._PRIORITY) == len(set(q._PRIORITY)), "duplicate priority entries"
    assert list(q._REGISTRY) == q._PRIORITY


def test_all_queries_have_entries():
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert qs, "queries() must not be empty"
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracles without queries: {unknown}"


def test_registry_count_documented():
    """README.md and SCALE.md state the registered-query count; assert it
    against the live registry so the docs can't drift (VERDICT r02 task 5)."""
    import re
    from pathlib import Path

    n = len(q._REGISTRY)
    root = Path(__file__).resolve().parent.parent
    readme = (root / "README.md").read_text()
    m = re.search(r"(\d+) registered queries", readme)
    assert m, "README.md lost its 'N registered queries' line"
    assert int(m.group(1)) == n, f"README says {m.group(1)}, registry has {n}"
    scale = (root / "SCALE.md").read_text()
    m = re.search(r"(\d+)/(\d+) registered queries", scale)
    assert m, "SCALE.md lost its 'N/N registered queries' gate line"
    assert int(m.group(1)) == int(m.group(2)) == n, (
        f"SCALE.md says {m.group(0)}, registry has {n}"
    )


def test_kind_check_catches_hugeint_regression():
    """The strict dtype-kind check must go red when the oracle side
    surfaces a DuckDB HUGEINT (float64) against a Spark LONG (int64) —
    value-equality alone would hide it, the driver's hash would not.
    Seeded regression per VERDICT r02 task 6."""
    import pandas as pd

    from dbt_ci_demo_spark.oracle_check import compare_frames

    spark_pdf = pd.DataFrame({"k": ["a", "b"], "n": pd.array([1, 2], dtype="int64")})
    # DuckDB returns HUGEINT sums as float64: values equal, kind differs.
    oracle_pdf = pd.DataFrame({"k": ["a", "b"], "n": pd.array([1.0, 2.0], dtype="float64")})
    r = compare_frames("seeded_hugeint", spark_pdf, oracle_pdf)
    assert not r.ok, "kind check failed to flag int64-vs-float64 mismatch"
    assert "kind mismatch" in r.detail, r.detail
    # Same-kind frames still pass.
    assert compare_frames("ok_case", spark_pdf, spark_pdf.copy()).ok


def test_approx_distinct_tracks_exact(spark, sf_dir):
    """The unregistered HLL variant must estimate within the default rsd
    (~5%) of the exact pre-aggregated distinct counts."""
    from dbt_ci_demo_spark.queries_meta import (
        flagship_approx_distinct,
        flagship_distinct_preagg,
    )

    exact = {r["name"]: r["repositories_number"] for r in flagship_distinct_preagg(spark, sf_dir).collect()}
    approx = {
        r["name"]: r["repositories_number_approx"]
        for r in flagship_approx_distinct(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for name, n in exact.items():
        assert abs(approx[name] - n) <= max(2, 0.1 * n), (name, approx[name], n)


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"name", "repositories_number"}
