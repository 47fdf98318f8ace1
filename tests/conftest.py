from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Two-tier suite (r08, VERDICT r07 task 4): the full suite crossed the
# 14-minute mark in r07, so the documented split landed — modules marked
# ``slow`` (the oracle-gate mirror and the writer/DDL round-trip tier,
# `pytestmark = pytest.mark.slow` at module top) are SKIPPED by default
# and run with ``--runslow`` at round close / CI. Default tier stays the
# fast signal (< 5 min); both tiers' wall times are recorded in SCALE.md.
# ---------------------------------------------------------------------------


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="include tests marked slow (oracle-gate / writer round-trip tier)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: round-close tier (oracle-gate mirror, writer round-trips)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (round-close/CI)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from dbt_ci_demo_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from dbt_ci_demo_spark.oracle_check import duckdb_connection

    con = duckdb_connection(sf_dir)
    yield con
    con.close()
