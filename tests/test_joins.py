"""Edge-case unit tests for the as-of join and bucketized range join
(operators/asof.py): tie inclusivity, no-match nulls, tolerance expiry,
bucket-boundary correctness."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dbt_ci_demo_spark.operators import asof as aj


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_inclusive_tie_and_backward(spark):
    left = _mk(
        spark,
        [(1, _ts("2024-01-01 10:00:00"), "a"), (1, _ts("2024-01-01 12:00:00"), "b")],
        "k int, ts timestamp, payload string",
    )
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01 10:00:00"), 100),
            (1, _ts("2024-01-01 11:00:00"), 200),
            (1, _ts("2024-01-01 12:30:00"), 300),
        ],
        "k int, ts timestamp, v int",
    )
    out = {
        (r["payload"]): (r["v"], r["asof_ts"])
        for r in aj.asof_join(left, right, on=["k"], ts_col="ts", right_cols=["v"]).collect()
    }
    # tie at 10:00 matches (inclusive); 12:00 takes the latest at-or-before (11:00)
    assert out["a"] == (100, _ts("2024-01-01 10:00:00"))
    assert out["b"] == (200, _ts("2024-01-01 11:00:00"))


def test_asof_no_match_is_null(spark):
    left = _mk(spark, [(1, _ts("2024-01-01 09:00:00"), "x")], "k int, ts timestamp, p string")
    right = _mk(spark, [(1, _ts("2024-01-01 10:00:00"), 1)], "k int, ts timestamp, v int")
    rows = aj.asof_join(left, right, on=["k"], ts_col="ts", right_cols=["v"]).collect()
    assert len(rows) == 1 and rows[0]["v"] is None and rows[0]["asof_ts"] is None


def test_asof_key_isolation(spark):
    left = _mk(spark, [(1, _ts("2024-01-01 10:00:00"), "x")], "k int, ts timestamp, p string")
    right = _mk(spark, [(2, _ts("2024-01-01 09:00:00"), 7)], "k int, ts timestamp, v int")
    rows = aj.asof_join(left, right, on=["k"], ts_col="ts", right_cols=["v"]).collect()
    assert rows[0]["v"] is None  # other key's rows never leak


def test_asof_tolerance_expiry(spark):
    left = _mk(
        spark,
        [(1, _ts("2024-01-01 10:00:00"), "in"), (1, _ts("2024-01-01 13:00:00"), "out")],
        "k int, ts timestamp, p string",
    )
    right = _mk(spark, [(1, _ts("2024-01-01 09:30:00"), 5)], "k int, ts timestamp, v int")
    out = {
        r["p"]: r["v"]
        for r in aj.asof_join(
            left, right, on=["k"], ts_col="ts", right_cols=["v"], tolerance_seconds=3600
        ).collect()
    }
    assert out["in"] == 5  # 30 min old: within tolerance
    assert out["out"] is None  # 3.5 h old: expired


def test_range_join_boundaries(spark):
    points = _mk(
        spark,
        [
            (1, _ts("2024-01-01 00:00:00")),  # == start: in (inclusive)
            (2, _ts("2024-01-01 23:59:59")),  # inside
            (3, _ts("2024-01-02 00:00:00")),  # == end: out (exclusive)
        ],
        "pid int, ts timestamp",
    )
    intervals = _mk(
        spark,
        [(10, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "iid int, c_start timestamp, c_end timestamp",
    )
    got = sorted(
        r["pid"]
        for r in aj.bucketized_range_join(
            points, intervals, "ts", "c_start", "c_end", bucket_seconds=3600
        ).collect()
    )
    assert got == [1, 2]


def test_range_join_matches_naive_theta(spark, sf_dir):
    """Bucketized result == naive theta join on a real slice of events."""
    ev = (
        __import__("dbt_ci_demo_spark.queries", fromlist=["_t"])
        ._t(spark, sf_dir, "events")
        .select("event_id", "ts")
        .limit(500)
    )
    t0 = ev.agg(F.min("ts").alias("s")).first()["s"]
    iv = spark.createDataFrame(
        [(i, t0 + dt.timedelta(hours=6 * i), t0 + dt.timedelta(hours=6 * (i + 1))) for i in range(4)],
        "iid int, c_start timestamp, c_end timestamp",
    )
    fast = aj.bucketized_range_join(ev, iv, "ts", "c_start", "c_end", bucket_seconds=3600)
    naive = ev.join(iv, (ev["ts"] >= iv["c_start"]) & (ev["ts"] < iv["c_end"]))
    assert sorted((r["event_id"], r["iid"]) for r in fast.collect()) == sorted(
        (r["event_id"], r["iid"]) for r in naive.collect()
    )


def test_salted_join_spreads_hot_key(spark):
    """A hot key must actually occupy n_salts distinct salt groups, and the
    salted join must equal the plain join."""
    import pytest as _pytest

    from dbt_ci_demo_spark.operators import skew

    n_salts = 8
    probe = spark.range(0, 800).select(
        F.lit(1).alias("k"), F.col("id").alias("row_id")
    )
    build = spark.createDataFrame([(1, "hot")], "k int, label string")
    out = skew.salted_join(probe, build, key="k", n_salts=n_salts, salt_from="row_id")
    assert out.count() == 800

    salt_col = F.pmod(F.xxhash64(F.col("row_id")), F.lit(n_salts)).cast("int")
    n_groups = probe.select(salt_col.alias("s")).distinct().count()
    assert n_groups == n_salts

    with _pytest.raises(ValueError, match="salt_from"):
        skew.salted_join(probe, build, key="k", n_salts=n_salts)
    with _pytest.raises(ValueError, match="salt_from"):
        skew.salted_join(probe, build, key="k", n_salts=n_salts, salt_from="k")
    # r11 review: the replicated build side would emit every unmatched
    # build row n_salts times under a right/full outer join — rejected
    # loudly instead of silently diverging from the plain join.
    for bad_how in ("right", "full", "full_outer", "right_outer"):
        with _pytest.raises(ValueError, match="probe-preserving"):
            skew.salted_join(
                probe, build, key="k", salt_from="row_id", how=bad_how
            )
    with _pytest.raises(ValueError, match="n_salts"):
        skew.salted_join(probe, build, key="k", n_salts=0, salt_from="row_id")
    # probe-preserving non-inner types still equal the plain join
    left_out = skew.salted_join(
        probe, build.filter("k = 2"), key="k", salt_from="row_id", how="left"
    )
    assert left_out.count() == 800 and left_out.filter("label is null").count() == 800
    anti = skew.salted_join(
        probe, build, key="k", salt_from="row_id", how="left_anti"
    )
    assert anti.count() == 0


def test_asof_null_value_carried_atomically(spark):
    """r10 review finding: carrying right columns independently let
    last(ignorenulls) skip a GENUINE NULL in right data, emitting a
    (asof_ts, value) pair that existed in no right row. The struct carry
    is atomic: the matched row's NULL survives."""
    right = _mk(
        spark,
        [(1, _ts("2024-01-01T00:00:00"), 5.0), (1, _ts("2024-01-01T01:00:00"), None)],
        "k bigint, ts timestamp, v double",
    )
    left = _mk(spark, [(1, _ts("2024-01-01T02:00:00"))], "k bigint, ts timestamp")
    row = aj.asof_join(left, right, ["k"], "ts", ["v"]).first()
    assert row.asof_ts == _ts("2024-01-01T01:00:00")
    assert row.v is None  # the matched row's genuine NULL, not the stale 5.0


def test_asof_null_keys_never_match_and_collision_raises(spark):
    """r10 review findings: NULL join keys follow SQL equality (no
    NULL-to-NULL attribution), and a right_cols name already on the left
    raises instead of emitting ambiguous duplicate columns."""
    import pytest

    right = _mk(
        spark, [(None, _ts("2024-01-01T00:00:00"), 5.0)], "k bigint, ts timestamp, v double"
    )
    left = _mk(spark, [(None, _ts("2024-01-01T02:00:00"))], "k bigint, ts timestamp")
    row = aj.asof_join(left, right, ["k"], "ts", ["v"]).first()
    assert row.v is None and row.asof_ts is None
    left2 = _mk(spark, [(1, _ts("2024-01-01T02:00:00"), 1.0)], "k bigint, ts timestamp, v double")
    with pytest.raises(ValueError, match="name collision"):
        aj.asof_join(left2, right, ["k"], "ts", ["v"])
    # ADVICE r10: a right_cols entry equal to a join key in `on` or to
    # ts_col also lands verbatim in the output — must raise, not emit
    # ambiguous duplicate columns.
    left3 = _mk(spark, [(1, _ts("2024-01-01T02:00:00"))], "k bigint, ts timestamp")
    with pytest.raises(ValueError, match="name collision"):
        aj.asof_join(left3, right, ["k"], "ts", ["k"])
    with pytest.raises(ValueError, match="name collision"):
        aj.asof_join(left3, right, ["k"], "ts", ["ts"])


def test_range_join_reversed_interval_matches_nothing(spark):
    """r10 review finding: a reversed interval (end < start) fed Spark's
    step-less sequence a descending range — one malformed row exploded
    into a huge backward bucket list instead of the theta join's empty
    result. Now filtered up front."""
    points = _mk(spark, [(_ts("2024-01-01T00:30:00"),)], "ts timestamp")
    intervals = _mk(
        spark,
        [
            (_ts("2024-01-01T00:00:00"), _ts("2024-01-01T01:00:00"), "ok"),
            (_ts("2025-01-01T00:00:00"), _ts("2024-01-01T00:00:00"), "reversed"),
            (_ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:00:00"), "empty"),
        ],
        "start timestamp, end timestamp, tag string",
    )
    out = aj.bucketized_range_join(points, intervals, "ts", "start", "end", 3600)
    assert [r.tag for r in out.collect()] == ["ok"]
