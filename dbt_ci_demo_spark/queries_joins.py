"""As-of join and range join query registrations (north-star time-series
join operators; oracles use DuckDB's native ASOF JOIN and a plain theta
join, verifying the Spark compositions against first-class reference
implementations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_ci_demo_spark.operators import asof as aj
from dbt_ci_demo_spark.queries import _t, query


@query(
    "events_asof_attribution",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT user_id, ts, event_id AS view_event_id FROM events
      WHERE event_type = 'view'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    )
    SELECT p.event_id, p.user_id, p.value,
           v.view_event_id,
           round(CAST(epoch_us(p.ts) - epoch_us(v.ts) AS DOUBLE) / 1e6, 6) AS seconds_since_view
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase matched to the most recent
    at-or-before view by the same user — a backward as-of join, verified
    against DuckDB's native ASOF JOIN. Spark side is the union-window
    formulation: NO join operator and exactly TWO exchanges — the as-of
    itself is one user-keyed shuffle (union + shared carry-forward
    window), preceded by the same-instant view dedup's (user, ts)-keyed
    rank window (rn = 1 literal, so it gets a map-side WindowGroupLimit).
    Both window partitions are per-key bounded. Plan-pinned in
    tests/test_plans.py::test_asof_is_join_free_two_exchanges."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("view_event_id").desc())
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", "ts", F.col("event_id").alias("view_event_id"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    out = aj.asof_join(purchases, views, on=["user_id"], ts_col="ts", right_cols=["view_event_id"])
    return out.select(
        "event_id",
        "user_id",
        "value",
        "view_event_id",
        F.round(
            (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(F.col("asof_ts").cast("timestamp"))).cast("double")
            / 1e6,
            6,
        ).alias("seconds_since_view"),
    )


_CAMPAIGN_DAYS = 3
_N_CAMPAIGNS = 10


@query(
    "events_range_join_campaigns",
    oracle=f"""
    WITH t0 AS (SELECT min(ts) AS start0 FROM events),
    campaigns AS (
      SELECT i AS campaign_id,
             start0 + to_microseconds((i * {_CAMPAIGN_DAYS}) * 86400000000) AS c_start,
             start0 + to_microseconds(((i + 1) * {_CAMPAIGN_DAYS}) * 86400000000) AS c_end
      FROM t0, range(0, {_N_CAMPAIGNS}) r(i)
    )
    SELECT c.campaign_id,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users,
           round(sum(CAST(e.value AS DECIMAL(30,6))), 6)::DOUBLE AS sum_value
    FROM events e
    JOIN campaigns c ON e.ts >= c.c_start AND e.ts < c.c_end
    GROUP BY c.campaign_id
    """,
)
def events_range_join_campaigns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events assigned to {_N}-day campaign windows derived
    from the global min timestamp, aggregated per campaign. Spark side is
    the bucketized equi-join (intervals exploded into day buckets), the
    scale path for interval joins; oracle is the naive theta join."""
    ev = _t(spark, sf_dir, "events")
    t0 = ev.agg(F.min("ts").alias("start0"))
    day_us = 86400 * 1_000_000
    campaigns = (
        t0.crossJoin(spark.range(_N_CAMPAIGNS).withColumnRenamed("id", "campaign_id"))
        .select(
            "campaign_id",
            F.timestamp_micros(
                F.unix_micros(F.col("start0").cast("timestamp")) + F.col("campaign_id") * _CAMPAIGN_DAYS * day_us
            ).alias("c_start"),
            F.timestamp_micros(
                F.unix_micros(F.col("start0").cast("timestamp")) + (F.col("campaign_id") + 1) * _CAMPAIGN_DAYS * day_us
            ).alias("c_end"),
        )
    )
    joined = aj.bucketized_range_join(
        ev.select("user_id", "ts", "value"),
        campaigns,
        point_ts="ts",
        start_col="c_start",
        end_col="c_end",
        bucket_seconds=86400,
    )
    return joined.groupBy("campaign_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum(F.col("value").cast("decimal(30,6)")), 6).cast("double").alias("sum_value"),
    )


@query(
    "events_asof_tolerance",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts, event_id AS click_event_id FROM events
      WHERE event_type = 'click'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    )
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000::BIGINT
                THEN c.click_event_id END AS click_event_id
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 1-hour tolerance (merge_asof semantics): clicks
    older than the horizon do not attribute."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("click_event_id").desc())
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("event_id").alias("click_event_id"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    out = aj.asof_join(
        purchases, clicks, on=["user_id"], ts_col="ts",
        right_cols=["click_event_id"], tolerance_seconds=3600,
    )
    return out.select("event_id", "user_id", "click_event_id")


@query(
    "join_full_outer_reconcile",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
    ),
    b AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 150000
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           a.o_orderkey IS NOT NULL AS in_open,
           b.o_orderkey IS NOT NULL AS in_large,
           round(COALESCE(a.o_totalprice, b.o_totalprice), 2) AS totalprice
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    """,
)
def join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation — the snapshot-diff shape (rows only in
    A, only in B, or both, with COALESCE'd keys and presence flags) used
    to audit two versions of a table. One co-partitioned shuffle on the
    join key; presence flags come free from the null sides."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("a_key"), F.col("o_totalprice").alias("a_price")
    )
    b = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_orderkey").alias("b_key"), F.col("o_totalprice").alias("b_price")
    )
    return a.join(b, a["a_key"] == b["b_key"], "full_outer").select(
        F.coalesce(F.col("a_key"), F.col("b_key")).alias("o_orderkey"),
        F.col("a_key").isNotNull().alias("in_open"),
        F.col("b_key").isNotNull().alias("in_large"),
        F.round(F.coalesce(F.col("a_price"), F.col("b_price")), 2).alias("totalprice"),
    )


@query(
    "win_first_last_value",
    oracle="""
    SELECT DISTINCT o_orderpriority,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           CAST(count(*) OVER w AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over the full partition frame (earliest and
    latest order value per priority), stated as the window idiom in the
    oracle — but COMPUTED as a ``min_by``/``max_by`` aggregate: an
    unbounded-frame window whose per-row output is then collapsed with
    DISTINCT is a per-group aggregate in disguise, and the window plan
    sorts each whole priority stratum in ONE reduce task (an unbounded
    frame can never get a ``WindowGroupLimit``; found by the r07
    second-pass window-skew audit, SCALE.md). ``min_by``/``max_by`` over
    the (date, key) ordering struct is decision-identical — the orderkey
    tie-break makes the ordering total, so 'first'/'last' are unique —
    and partial-aggregates on the map side: the exchange carries one row
    per (input partition, priority), never a stratum. The plan test pins
    the absence of any Window operator."""
    o = _t(spark, sf_dir, "orders")
    ordering = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    return o.groupBy("o_orderpriority").agg(
        F.min_by(F.col("o_totalprice"), ordering).alias("first_price"),
        F.max_by(F.col("o_totalprice"), ordering).alias("last_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )
