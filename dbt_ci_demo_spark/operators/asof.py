"""As-of join and bucketized range join — time-series join operators the
reference's engine (BigQuery) and plain Spark both lack as primitives
(north-star extension; SURVEY.md §7.4 pattern (a): composition of existing
DataFrame ops).

Both are built shuffle-consciously:

- :func:`asof_join` is the union-window formulation: tag both sides, union,
  one window pass per key ordered by time carrying the last right-side
  value forward. ONE shuffle (the window partitioning), no join at all —
  versus the naive per-left-row subquery which is O(n²) or a
  merge-as-of that needs co-partitioned sorted inputs. At 100 TB the
  shuffle is by join key, the same partitioning the downstream usually
  wants anyway.
- :func:`bucketized_range_join` turns a theta join (point BETWEEN start
  AND end) into an equi-join on time buckets + exact post-filter:
  intervals explode into the buckets they cover, points map to one
  bucket. Candidate count = points × avg-buckets-overlapped, not
  |points| × |intervals|. This is the standard interval-bucketing trick
  (cf. range-join optimizations in Spark-ecosystem engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of LEFT join: for each left row, attach the right-side
    columns of the latest right row with ``right.ts <= left.ts`` and equal
    keys (inclusive tie, matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).

    ``right`` must be unique per (keys, ts) — pre-dedup with a window if
    not. Right columns are emitted under their own names; left keeps all
    its columns. ``tolerance_seconds`` drops matches older than the
    tolerance (pandas ``merge_asof`` semantics).
    """
    lcols = left.columns
    # side 0 sorts before side 1 at equal ts → right row at ts == left ts
    # is visible to the left row (inclusive as-of).
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in right_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in lcols if c not in on and c != ts_col],
    )
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c not in on and c != ts_col],
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in right_cols]
    carried_ts = F.last(
        F.when(F.col("__side") == 0, F.col(ts_col)), ignorenulls=True
    ).over(w).alias("__asof_ts")
    out = (
        u.select(*on, F.col(ts_col), F.col("__side"), carried_ts, *carried,
                 *[F.col(f"__l_{c}") for c in lcols if c not in on and c != ts_col])
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
    if tolerance_seconds is not None:
        horizon = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.lit(tolerance_seconds * 1_000_000)
        keep = F.unix_micros(F.col("__asof_ts").cast("timestamp")) >= horizon
        out = out.select(
            *on,
            ts_col,
            F.when(keep, F.col("__asof_ts")).alias("__asof_ts"),
            *[F.when(keep, F.col(c)).alias(c) for c in right_cols],
            *[F.col(f"__l_{c}") for c in lcols if c not in on and c != ts_col],
        )
    renames = {f"__l_{c}": c for c in lcols if c not in on and c != ts_col}
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out.withColumnRenamed("__asof_ts", "asof_ts")


def bucketized_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Range join (point in [start, end), end-exclusive) via time-bucket
    equi-join. ``bucket_seconds`` should be on the order of the typical
    interval length: too small explodes interval replication, too large
    degrades candidate selectivity. Output: all points columns + all
    intervals columns for each matching pair."""
    keys = keys or []
    us = bucket_seconds * 1_000_000
    p = points.withColumn("__bucket", F.floor(F.unix_micros(F.col(point_ts).cast("timestamp")) / us))
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col).cast("timestamp")) / us),
                F.floor((F.unix_micros(F.col(end_col).cast("timestamp")) - 1) / us),
            )
        ),
    )
    cond = (
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
    )
    return (
        p.join(i, on=[*keys, "__bucket"])
        .filter(cond)
        .drop("__bucket")
    )
