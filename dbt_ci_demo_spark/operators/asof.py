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
    its columns (a ``right_cols``/``asof_ts`` name already present on the
    left raises — the output would be ambiguous). ``tolerance_seconds``
    drops matches older than the tolerance (pandas ``merge_asof``
    semantics).

    Atomic carry (r10 review finding): the matched right ROW travels as
    ONE struct through a single ``last(ignorenulls)`` — carrying each
    right column independently let a genuine NULL in right-side data be
    skipped (indistinguishable from the union's filler nulls), emitting a
    (asof_ts, value) pair that existed in NO right row (a stale value
    with a newer match's timestamp; under tolerance, a value from
    OUTSIDE the window could pass the asof_ts keep-check). NULL join
    keys never match (SQL/DuckDB ``l.k = r.k`` semantics): NULL-keyed
    right rows are filtered out of the carry, so a NULL-keyed left row
    gets NULL right columns instead of a phantom NULL-to-NULL
    attribution.
    """
    lcols = left.columns
    passthrough = [c for c in lcols if c not in on and c != ts_col]
    # The output carries on-keys, ts_col, left passthrough, asof_ts and
    # right_cols side by side — a right_cols entry colliding with ANY of
    # those (not just passthrough: a join key in `on` or ts_col itself
    # also lands verbatim in the output) would produce duplicate column
    # names and ambiguous downstream selects (ADVICE r10).
    clash = (set(right_cols) | {"asof_ts"}) & (
        set(passthrough) | set(on) | {ts_col}
    )
    if clash:
        raise ValueError(
            f"asof_join output name collision: {sorted(clash)} exist on the "
            "left (passthrough, join key, or ts_col) — rename or drop them "
            "before joining"
        )
    match_struct = F.struct(
        F.col(ts_col).alias("asof_ts"), *[F.col(c) for c in right_cols]
    )
    # side 0 sorts before side 1 at equal ts → right row at ts == left ts
    # is visible to the left row (inclusive as-of).
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        match_struct.alias("__match"),
        *[F.lit(None).alias(f"__l_{c}") for c in passthrough],
    )
    null_keys = None
    for k in on:
        cond = F.col(k).isNull()
        null_keys = cond if null_keys is None else (null_keys | cond)
    if null_keys is not None:
        r = r.filter(~null_keys)
    null_match = F.lit(None).cast(
        r.schema["__match"].dataType
    )
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        null_match.alias("__match"),
        *[F.col(c).alias(f"__l_{c}") for c in passthrough],
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col("__match"), ignorenulls=True).over(w).alias("__match")
    out = (
        u.select(*on, F.col(ts_col), F.col("__side"), carried,
                 *[F.col(f"__l_{c}") for c in passthrough])
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
    if tolerance_seconds is not None:
        horizon = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.lit(
            tolerance_seconds * 1_000_000
        )
        keep = (
            F.unix_micros(F.col("__match")["asof_ts"].cast("timestamp")) >= horizon
        )
        out = out.withColumn("__match", F.when(keep, F.col("__match")))
    out = out.select(
        *on,
        ts_col,
        F.col("__match")["asof_ts"].alias("asof_ts"),
        *[F.col("__match")[c].alias(c) for c in right_cols],
        *[F.col(f"__l_{c}").alias(c) for c in passthrough],
    )
    return out


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
    # Empty/reversed intervals (end <= start) match nothing under the
    # theta condition, but Spark's step-less sequence(start, stop) runs
    # DESCENDING when start > stop — one malformed interval row would
    # explode into an enormous backward bucket list instead of nothing
    # (r10 review finding). Filter them out up front, exactly mirroring
    # the theta join's empty result for such rows.
    i = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
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
