"""SCD2 check-strategy NULL semantics (SURVEY §7.5 risk item): the
reference's explicit NULL triple-check must equal Spark's null-safe <=>
on every NULL combination. Exhaustive over the (None, a, b) x (None, a, b)
grid for two tracked columns, cross-checked against DuckDB's
IS DISTINCT FROM on the same rows."""

from __future__ import annotations

import itertools

import duckdb
import pytest
from pyspark.sql import functions as F

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


@pytest.mark.slow  # ~5s full SCD2 cycle: round-close tier (snap_check_all is
# oracle-checked every gate run)
def test_check_cols_all_introspection_and_cycle(spark):
    """check_cols='all' (r09, VERDICT r08 #3): tracked columns come from
    the source∩snapshot intersection with dbt_* excluded; a change in a
    column nobody hand-listed is caught; a mid-cycle added column flips
    column_added and versions every matched key forward with the history
    gaining the column as a typed NULL."""
    import datetime

    from pyspark.sql import functions as F

    t1 = datetime.datetime(2024, 1, 1)
    t2 = datetime.datetime(2024, 2, 1)
    v1 = spark.createDataFrame(
        [(1, "x", 10.0, t1), (2, "y", 20.0, t1)],
        "k int, name string, bal double, updated_at timestamp",
    )
    hist = snap.add_scd_metadata(v1, "k", "updated_at")

    # same-shape source: 'bal' changed for k=1 only — caught without
    # anyone listing 'bal' by hand, and dbt_* columns are never tracked
    added, tracked = snap.check_cols_all(
        spark.createDataFrame(
            [(1, "x", 11.0, t2)], "k int, name string, bal double, updated_at timestamp"
        ),
        hist,
    )
    assert not added and tracked == ["k", "name", "bal", "updated_at"]
    v2 = spark.createDataFrame(
        [(1, "x", 11.0, t2), (2, "y", 20.0, t1)],
        "k int, name string, bal double, updated_at timestamp",
    )
    out = snap.snapshot_cycle(v2, hist, "k", "updated_at", strategy="check", check_cols="all")
    rows = {(r.k, r.dbt_valid_to is None): r for r in out.collect()}
    assert (1, False) in rows and (1, True) in rows  # k=1 closed + re-opened
    assert (2, True) in rows and len(rows) == 3  # k=2 untouched, still open

    # widened source: 'tier' is new — column_added, EVERY matched key
    # versions forward even though no tracked value changed, and the
    # closed v1 rows carry tier = NULL (B13 append_new_columns)
    v3 = spark.createDataFrame(
        [(1, "x", 10.0, "gold", t2), (2, "y", 20.0, "tin", t2)],
        "k int, name string, bal double, tier string, updated_at timestamp",
    )
    added, tracked = snap.check_cols_all(v3, hist)
    assert added and tracked == ["k", "name", "bal", "updated_at"]
    out = snap.snapshot_cycle(v3, hist, "k", "updated_at", strategy="check", check_cols="all")
    assert "tier" in out.columns
    closed = out.filter(F.col("dbt_valid_to").isNotNull())
    assert closed.count() == 2  # both v1 rows closed
    assert closed.filter(F.col("tier").isNull()).count() == 2
    opened = out.filter(F.col("dbt_valid_to").isNull())
    assert {r.tier for r in opened.collect()} == {"gold", "tin"}


def test_check_cols_all_dropped_column_cycle(spark):
    """The other half of the mid-cycle schema story (reference MERGE
    semantics: insert by the staging column list, unlisted target columns
    NULL): a source that DROPPED a column still snapshots — the dropped
    column falls out of the tracked intersection, changed rows version
    forward, and the new version rows carry NULL in the dropped column
    while history keeps the old values."""
    import datetime

    from pyspark.sql import functions as F

    t1 = datetime.datetime(2024, 1, 1)
    t2 = datetime.datetime(2024, 2, 1)
    v1 = spark.createDataFrame(
        [(1, "x", 10.0, t1), (2, "y", 20.0, t1)],
        "k int, name string, bal double, updated_at timestamp",
    )
    hist = snap.add_scd_metadata(v1, "k", "updated_at")
    # source dropped 'bal'; 'name' changed for k=1 only
    v2 = spark.createDataFrame(
        [(1, "x2", t2), (2, "y", t1)], "k int, name string, updated_at timestamp"
    )
    added, tracked = snap.check_cols_all(v2, hist)
    assert not added and tracked == ["k", "name", "updated_at"]
    out = snap.snapshot_cycle(v2, hist, "k", "updated_at", strategy="check", check_cols="all")
    assert set(out.columns) == set(hist.columns)
    rows = out.collect()
    assert len(rows) == 3  # k=1 closed + new version; k=2 untouched
    new_version = [r for r in rows if r.k == 1 and r.dbt_valid_to is None]
    assert len(new_version) == 1 and new_version[0].name == "x2"
    assert new_version[0].bal is None  # dropped column NULL on the new row
    closed = [r for r in rows if r.k == 1 and r.dbt_valid_to is not None]
    assert len(closed) == 1 and closed[0].bal == 10.0  # history keeps it


def test_snapshot_cycle_invalid_check_cols_str(spark):
    """A str check_cols other than 'all' is a config error and must raise
    the reference's explicit compiler error (snapshot_check_strategy
    manifest.json:1@122973) instead of iterating the string char-by-char
    into an opaque unresolved-column AnalysisException (ADVICE r09)."""
    import datetime

    import pytest

    t1 = datetime.datetime(2024, 1, 1)
    v1 = spark.createDataFrame(
        [(1, "x", t1)], "k int, name string, updated_at timestamp"
    )
    hist = snap.add_scd_metadata(v1, "k", "updated_at")
    with pytest.raises(ValueError, match="Invalid value for 'check_cols'"):
        snap.snapshot_cycle(
            v1, hist, "k", "updated_at", strategy="check", check_cols="name"
        )
    # the error is a config gate: it fires even on the FIRST build, where
    # the row_changed predicate is never evaluated
    with pytest.raises(ValueError, match="Invalid value for 'check_cols'"):
        snap.snapshot_cycle(
            v1, None, "k", "updated_at", strategy="check", check_cols="name"
        )
    # ...but like the reference, only inside the CHECK dispatch: the
    # timestamp strategy never reads check_cols, so a stray value stays
    # ignored there instead of failing a previously-working call
    out = snap.snapshot_cycle(
        v1, hist, "k", "updated_at", strategy="timestamp", check_cols="name"
    )
    assert out.count() == 1


def test_snapshot_cycle_invalid_strategy(spark):
    """r10 review finding: the strategy NAME itself is validated — the
    reference's strategy_dispatch raises on an unknown strategy, and
    without the gate a typo ('Check', 'check_cols') silently fell into
    check semantics: bypassing the check_cols str gate above
    (char-iterating the string) or running check-all-columns when
    timestamp semantics were intended."""
    import datetime

    import pytest

    t1 = datetime.datetime(2024, 1, 1)
    v1 = spark.createDataFrame(
        [(1, "x", t1)], "k int, name string, updated_at timestamp"
    )
    hist = snap.add_scd_metadata(v1, "k", "updated_at")
    for bad in ("Check", "check_cols", "timestamps", ""):
        with pytest.raises(ValueError, match="Invalid value for 'strategy'"):
            snap.snapshot_cycle(
                v1, hist, "k", "updated_at", strategy=bad, check_cols="name"
            )
    # the gate fires on the first build too (config error, not data)
    with pytest.raises(ValueError, match="Invalid value for 'strategy'"):
        snap.snapshot_cycle(v1, None, "k", "updated_at", strategy="chekc")


def test_empty_source_hard_delete_closes_with_real_stamp(spark):
    """r12 review: a FULL invalidation (empty source, invalidate_hard_deletes)
    has no max(updated_at) to stamp deletes with; a NULL stamp would leave
    every "deleted" row open. The fallback is the reference's own
    snapshot_get_time() semantics — every open row must come out CLOSED
    with a non-null dbt_valid_to."""
    src0 = spark.createDataFrame(
        [(1, "x", "2024-01-01 00:00:00"), (2, "y", "2024-01-02 00:00:00")],
        "k int, v string, updated_at string",
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    hist = snap.snapshot_cycle(src0, None, "k", "updated_at")
    empty = src0.limit(0)
    out = snap.snapshot_cycle(
        empty, hist, "k", "updated_at", invalidate_hard_deletes=True
    )
    rows = out.collect()
    assert len(rows) == 2
    assert all(r.dbt_valid_to is not None for r in rows)


def test_duplicate_key_source_does_not_multiply_history(spark):
    """r12 review: a source with a DUPLICATE unique key stages two update
    rows carrying the same old dbt_scd_id; joined raw they would multiply
    the matching history rows. The reference's MERGE fails loudly on
    multi-match; the engine's deterministic guard (one max-stamp close per
    scd_id) must keep the history row count at closed + inserts."""
    src0 = spark.createDataFrame(
        [(1, "x", "2024-01-01 00:00:00")], "k int, v string, updated_at string"
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    hist = snap.snapshot_cycle(src0, None, "k", "updated_at")
    dup = spark.createDataFrame(
        [(1, "x2", "2024-01-02 00:00:00"), (1, "x3", "2024-01-03 00:00:00")],
        "k int, v string, updated_at string",
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    out = snap.snapshot_cycle(dup, hist, "k", "updated_at")
    # 1 original (now closed once, with the max duplicate stamp) + 2 inserts
    assert out.count() == 3
    closed = [r for r in out.collect() if r.dbt_valid_to is not None]
    assert len(closed) == 1
    assert str(closed[0].dbt_valid_to) == "2024-01-03 00:00:00"


def test_check_strategy_empty_cols_raises(spark):
    with pytest.raises(ValueError, match="non-empty"):
        snap.check_strategy([])


def test_check_strategy_stationary_updated_at_raises(spark):
    """VERDICT r12 #5: a check-strategy source that changes a tracked
    column WITHOUT advancing updated_at mints the same scd_id
    (md5(key|updated_at)) for the new version row as the open row it
    closes — previously silent history corruption (two rows share an id;
    every later close of that id hits both). The in-plan guard must fail
    loudly on exactly this state, and a well-formed cycle (updated_at
    advances with the change) must be untouched."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    src0 = spark.createDataFrame(
        [(1, "x", "2024-01-01 00:00:00")], "k int, v string, updated_at string"
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    hist = snap.snapshot_cycle(src0, None, "k", "updated_at", strategy="check",
                               check_cols=["v"])

    # stationary updated_at + changed tracked column → loud failure
    bad = spark.createDataFrame(
        [(1, "CHANGED", "2024-01-01 00:00:00")], "k int, v string, updated_at string"
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    # NB: .collect(), not .count() — count() prunes every column, so the
    # guarded scd_id expression would never evaluate; any real consumer
    # (a write, a merge) materializes the column and trips the guard.
    with pytest.raises(SparkRuntimeException, match="SAME dbt_scd_id"):
        snap.snapshot_cycle(
            bad, hist, "k", "updated_at", strategy="check", check_cols=["v"]
        ).collect()

    # an UNCHANGED row with a stationary stamp stages nothing — no raise.
    # (The well-formed path — advancing stamps versioning cleanly — is
    # exercised by every snap_* oracle row each gate run; not repeated
    # here to hold the fast-tier budget.)
    same = spark.createDataFrame(
        [(1, "x", "2024-01-01 00:00:00")], "k int, v string, updated_at string"
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    assert len(snap.snapshot_cycle(
        same, hist, "k", "updated_at", strategy="check", check_cols=["v"]
    ).collect()) == 1
