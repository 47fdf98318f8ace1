"""SCD2 check-strategy NULL semantics (SURVEY §7.5 risk item): the
reference's explicit NULL triple-check must equal Spark's null-safe <=>
on every NULL combination. Exhaustive over the (None, a, b) x (None, a, b)
grid for two tracked columns, cross-checked against DuckDB's
IS DISTINCT FROM on the same rows."""

from __future__ import annotations

import itertools

import duckdb

from dbt_ci_demo_spark.operators import snapshot as snap

VALS = [None, "a", "b"]


def _grid():
    # one row per combination: (key, src_c1, snap_c1, src_c2, snap_c2)
    rows = []
    for i, (s1, t1, s2, t2) in enumerate(
        itertools.product(VALS, VALS, VALS, VALS)
    ):
        rows.append((i, s1, t1, s2, t2))
    return rows


def test_check_strategy_null_grid_matches_duckdb(spark):
    rows = _grid()
    src = spark.createDataFrame(
        [(k, v1, v2) for k, v1, _, v2, _ in rows], "k int, c1 string, c2 string"
    ).alias("src")
    tgt = spark.createDataFrame(
        [(k, v1, v2) for k, _, v1, _, v2 in rows], "k int, c1 string, c2 string"
    ).alias("snap")
    changed = snap.check_strategy(["c1", "c2"])(src, tgt)
    joined = src.join(tgt, src["k"] == tgt["k"]).select(
        src["k"].alias("k"), changed.alias("changed")
    )
    got = {r["k"]: r["changed"] for r in joined.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g(k INT, s1 VARCHAR, t1 VARCHAR, s2 VARCHAR, t2 VARCHAR)"
    )
    con.executemany("INSERT INTO g VALUES (?,?,?,?,?)", rows)
    want = dict(
        con.execute(
            """SELECT k, (s1 IS DISTINCT FROM t1) OR (s2 IS DISTINCT FROM t2)
               FROM g"""
        ).fetchall()
    )
    assert got == want
