"""User-behavior analytics over the events table: cohort retention,
funnel conversion, and sliding event-time windows — the standard
product-analytics shapes a warehouse engine must answer (the reference
delegates all such SQL to BigQuery; SURVEY.md §4 — our surface must cover
what its runtime could execute).

Scale design: every query reduces events to a per-user or per-window
aggregate with one key-partitioned shuffle; no query materializes a
per-event×per-window cross product larger than the slide factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_ci_demo_spark.functions.bq_compat import exact_sum
from dbt_ci_demo_spark.queries import _t, query


@query(
    "events_retention_cohorts",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    first AS (
      SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id
    )
    SELECT f.cohort_day,
           count(DISTINCT f.user_id) AS n_users,
           count(DISTINCT CASE WHEN u.day = f.cohort_day + INTERVAL 1 DAY
                               THEN f.user_id END) AS retained_d1,
           count(DISTINCT CASE WHEN u.day = f.cohort_day + INTERVAL 7 DAY
                               THEN f.user_id END) AS retained_d7
    FROM first f JOIN ud u ON u.user_id = f.user_id
    GROUP BY f.cohort_day
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-1 / day-7 cohort retention: users grouped by their first active
    day, counted again if active exactly 1 (resp. 7) days later. events
    collapse to distinct (user, day) first — the only shuffle over raw
    events — then all cohort math runs on that per-user-day table
    (≤ users × active-days rows). The self-join is user-keyed, so both
    sides co-partition on the same exchange."""
    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    day1 = F.col("cohort_day") + F.expr("INTERVAL 1 DAY")
    day7 = F.col("cohort_day") + F.expr("INTERVAL 7 DAY")
    return (
        first.join(ev, "user_id")
        .groupBy("cohort_day")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(F.when(F.col("day") == day1, F.col("user_id"))).alias(
                "retained_d1"
            ),
            F.countDistinct(F.when(F.col("day") == day7, F.col("user_id"))).alias(
                "retained_d7"
            ),
        )
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT s.user_id,
             max(CASE WHEN p.ts > s.signup_ts
                       AND p.ts <= s.signup_ts + INTERVAL 24 HOUR
                      THEN 1 ELSE 0 END) AS converted
      FROM s LEFT JOIN events p
        ON p.user_id = s.user_id AND p.event_type = 'purchase'
      GROUP BY s.user_id
    )
    SELECT count(*) AS n_signup_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           round(CAST(SUM(converted) AS DOUBLE) / count(*), 6) AS conv_rate
    FROM conv
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel with a 24-hour conversion window: first
    signup per user, converted iff any purchase lands in (signup,
    signup+24h]. The signup side collapses to one row per user before the
    join; the purchase side is pre-filtered by event type at the scan
    (pushed filter), so the user-keyed join moves only the two relevant
    event slices. Output is the one-row funnel summary."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    in_window = (F.col("p_ts") > F.col("signup_ts")) & (
        F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 24 HOUR")
    )
    conv = (
        s.join(p, s["user_id"] == F.col("p_user"), "left_outer")
        .groupBy(s["user_id"])
        .agg(F.max(F.when(in_window, 1).otherwise(0)).alias("converted"))
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.sum("converted").alias("n_converted"),
        F.round(F.sum("converted").cast("double") / F.count(F.lit(1)), 6).alias("conv_rate"),
    )


@query(
    "events_sliding_windows",
    oracle="""
    WITH cand AS (
      SELECT event_type, value,
             date_trunc('hour', ts) - INTERVAL 1 HOUR AS w0,
             date_trunc('hour', ts) AS w1,
             ts
      FROM events
    ),
    assigned AS (
      SELECT event_type, value, w AS window_start
      FROM cand, unnest([w0, w1]) AS t(w)
      WHERE ts >= w AND ts < w + INTERVAL 2 HOUR
    )
    SELECT window_start, window_start + INTERVAL 2 HOUR AS window_end,
           event_type, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM assigned
    GROUP BY window_start, event_type
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (2-hour window, 1-hour slide) per event
    type — the batch twin of the streaming hopping window. Spark's
    F.window assigns each event to its window/slide = 2 candidate windows
    via an Expand (fan-out bounded by the slide factor, not data size),
    then one hash aggregate; the oracle enumerates the same 2 candidate
    window starts per event."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_continuous_aggregate",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous aggregate (hypertable-rollup pattern): an hourly rollup
    table maintained incrementally. The previously-materialized rollup
    covers events up to a cutoff; a new batch arrives after it; only the
    hours *touched by the batch* are recomputed (from all events in those
    hours — the cutoff may split an hour) and swapped in via the
    insert-overwrite partition-replacement operator, leaving untouched
    hours as-is. Equivalent by construction to a full recompute — which
    is exactly what the oracle runs. At 100 TB the rollup refresh reads
    only the affected hour partitions (partition pruning on the hour
    key), not the events history."""
    from dbt_ci_demo_spark.operators import incremental as incr

    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    hour = F.date_trunc("hour", F.col("ts"))

    def rollup(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(hour.alias("hour"), F.col("event_type"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                exact_sum("value").alias("sum_value"),
            )
        )

    materialized = rollup(ev.filter(F.col("ts") <= cutoff))
    new_batch = ev.filter(F.col("ts") > cutoff)
    affected_hours = new_batch.select(hour.alias("hour")).distinct()
    recomputed = rollup(
        ev.join(F.broadcast(affected_hours), hour == F.col("hour"), "left_semi")
    )
    return incr.insert_overwrite_partitions(materialized, recomputed, F.col("hour"))


@query(
    "events_json_struct",
    oracle="""
    SELECT event_type,
           count(*) FILTER (k IS NOT NULL) AS n_with_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(SUM(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even_k
    FROM (
      SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    GROUP BY event_type
    """,
)
def events_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON parsing with from_json into a typed struct
    (the production path for semi-structured columns — one parse per row
    into Tungsten format, versus get_json_object re-parsing per field).
    Aggregates over the extracted field prove the typed access."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0)).alias("n_even_k"),
    )


@query(
    "events_top_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY n DESC, event_type, next_type
    LIMIT 10
    """,
)
def events_top_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type transitions (the first-order Markov / user-journey
    primitive): each user's time-ordered stream yields (current, next)
    pairs via one lead() window — user-partitioned, so the sort is
    per-user and parallel — then a tiny (5×5-domain) aggregate and a
    TakeOrderedAndProject top-k. event_id breaks timestamp ties so the
    sequence, and therefore the counts, are total-order deterministic."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        ordered.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"), F.asc("next_type"))
        .limit(10)
    )
