"""BigQuery-SQL idiom compatibility helpers as Spark column expressions.

The reference's macro SQL uses a handful of BigQuery idioms without a
one-call Spark twin (SURVEY.md §2.B.6 / §7.5). Each helper here is a pure
Column expression (JVM-side, whole-stage-codegen friendly — no UDFs), so at
100 TB they cost the same as hand-written built-ins.

Reference evidence for each idiom is cited inline (manifest.json byte
offsets per SURVEY.md citation convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Decimal wide enough for any fixture money/quantity value; scale 6 keeps
# cents-level data exact. Used to make floating-point aggregates
# deterministic (order-independent) and therefore oracle-comparable.
_EXACT_DECIMAL = "decimal(30,6)"


def scd_hash(*cols: Column | str) -> Column:
    """Row-version hash: ``to_hex(md5(concat(coalesce(cast(c as string),''),
    '|', ...)))`` — bigquery__snapshot_hash_arguments
    (manifest.json:1@31511) / default__snapshot_hash_arguments (@115609).

    Spark's ``md5`` already returns lowercase hex, collapsing BigQuery's
    ``to_hex(md5(...))``. ``concat_ws`` handles the '|' separators but skips
    NULLs, so we coalesce each argument to '' first, exactly like the
    reference.
    """
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"), F.lit(""))
        for c in cols
    ]
    return F.md5(F.concat_ws("|", *parts))


def select_except(df: DataFrame, *cols: str) -> DataFrame:
    """``SELECT * EXCEPT(col, ...)`` (bigquery__get_catalog,
    manifest.json:1@3102) ≡ ``df.drop(*cols)``."""
    return df.drop(*cols)


def array_agg_ordered(value: Column | str, distinct: bool = False) -> Column:
    """``array_agg([distinct] x ignore nulls order by x)`` (@3102, @34992).

    Spark's ``collect_list``/``collect_set`` ignore nulls but give no
    ordering guarantee; sorting the collected array afterwards restores the
    deterministic order the BigQuery idiom promises (for the common
    order-by-the-same-expression case).
    """
    col = F.col(value) if isinstance(value, str) else value
    agg = F.collect_set(col) if distinct else F.collect_list(col)
    return F.array_sort(agg)


def range_bucket(value: Column | str, start: int, end: int, interval: int) -> Column:
    """BigQuery ``range_bucket(x, generate_array(start, end, interval))``
    used for integer range partitioning (partition_by, manifest.json:1@13262).

    Returns the bucket ordinal: 0 for x < start, n for x >= end, else
    1 + (x-start) div interval — matching RANGE_BUCKET's insertion-point
    semantics on the generated array. Returns BIGINT like BigQuery's
    INT64 (r10 review findings, both confirmed live: the old int32 cast
    was an ANSI CAST_OVERFLOW crash for ordinals past 2^31, and the old
    double-division floor silently returned bucket+1 once |x-start|
    exceeded 2^53 — integer ``div`` is exact at any int64 magnitude; the
    otherwise-branch operand is non-negative, so div == floor-division).
    Inverted bounds (end < start ⇒ an empty GENERATE_ARRAY) return 0 for
    every non-NULL x, as BigQuery does, instead of a nonsense negative
    ordinal — but a NULL point stays NULL regardless of the boundaries
    array (RANGE_BUCKET(NULL, ...) IS NULL; the non-inverted path already
    propagates NULL through the ``otherwise`` arithmetic, so the literal-0
    shortcut here needs the same guard — ADVICE r10).
    """
    if interval <= 0:
        # BigQuery's GENERATE_ARRAY raises on a non-positive step; fail
        # with the config error instead of a bare ZeroDivisionError
        # (interval=0) or silently-nonsense ordinals (negative) — r13
        # review. Validated BEFORE any Column construction so the config
        # error surfaces even without an active SparkContext.
        raise ValueError(f"range_bucket interval must be positive, got {interval}")
    col = F.col(value) if isinstance(value, str) else value
    if end < start:
        return F.when(col.isNotNull(), F.lit(0)).cast("bigint")
    n_edges = (end - start) // interval + 1
    bucket = F.call_function(
        "div", col.cast("bigint") - F.lit(start), F.lit(interval)
    )
    return (
        F.when(col < F.lit(start), F.lit(0))
        .when(col >= F.lit(start + (n_edges - 1) * interval), F.lit(n_edges))
        .otherwise(bucket + F.lit(1))
        .cast("bigint")
    )


def typed_null(data_type: str) -> Column:
    """``nullif(u, u)`` — the reference's trick for a NULL of a specific type
    (build_snapshot_table, manifest.json:1@105612)."""
    return F.lit(None).cast(data_type)


def exact_sum(col: Column | str) -> Column:
    """Order-independent SUM for double columns: accumulate in decimal
    (exact), surface as double.

    Plain double SUM is non-associative, so its low-order bits depend on
    partition order — unacceptable both for reproducibility at 1000
    executors and for oracle hash-comparison. Decimal accumulation costs one
    cast per row and keeps the aggregate inside whole-stage codegen.

    Portability bound: the final decimal(30,6)→double cast is singly
    rounded in Spark (BigDecimal) but doubly rounded in DuckDB
    (int/10^scale in double arithmetic), so cross-engine bit-parity is
    guaranteed only while |sum|·10^6 < 2^53, i.e. |sum| ≲ 9e9 — ample at
    the sf0.01 oracle gate. For aggregates that exceed it (e.g. sums of
    squared prices), quantize to integer fixed-point BEFORE summing the
    way queries_olap2.stats_exact_moments / queries_embed do.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_EXACT_DECIMAL)).cast("double")


def exact_avg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_EXACT_DECIMAL)).cast("double") / F.count(c)
