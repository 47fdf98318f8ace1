"""Generic data-quality tests + harness (SURVEY.md §2.B.4, B21-B25, B29).

Each test is a pure ``DataFrame → DataFrame`` returning *violating rows* —
the reference's contract (a test query's result set is its failures;
default__get_test_sql, manifest.json:1@56739). The harness wraps a
violations DataFrame with fail_calc / warn_if / error_if threshold logic
(materialization_test_default, @57793).

Scale notes: every test below is a single shuffle (groupBy on the tested
column) or a broadcast-able anti-join; none materializes the full input.
``relationships`` lets Spark pick broadcast-hash when the parent side is a
dimension table, which is the common case.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def test_unique(df: DataFrame, column: str) -> DataFrame:
    """Violations of uniqueness: values (non-null) appearing more than once.

    Reference: default__test_unique (manifest.json:1@201298) —
    ``select col as unique_field, count(*) as n_records from model
    where col is not null group by col having count(*) > 1``.
    """
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(F.col(column).alias("unique_field"))
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(F.col("n_records") > 1)
    )


def test_not_null(df: DataFrame, column: str) -> DataFrame:
    """Violations: rows where the column is NULL.

    Reference: default__test_not_null (manifest.json:1@198167).
    """
    return df.filter(F.col(column).isNull())


def test_accepted_values(
    df: DataFrame, column: str, values: list, quote: bool = True
) -> DataFrame:
    """Violations: distinct values outside the accepted list.

    Reference: default__test_accepted_values (manifest.json:1@202767) —
    groups by the column, keeps groups not in the value list. The reference
    compares unquoted (numeric) values via the raw literal; Spark's typed
    ``isin`` covers both paths, so ``quote`` only documents intent.
    """
    return (
        df.groupBy(F.col(column).alias("value_field"))
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(~F.col("value_field").isin(values))
    )


def test_relationships(
    child: DataFrame, child_column: str, parent: DataFrame, parent_column: str
) -> DataFrame:
    """Referential-integrity violations: child keys with no matching parent.

    Reference: default__test_relationships (manifest.json:1@199544) —
    ``select from_col from child where from_col is not null and from_col not
    in (select to_col from parent)`` expressed as a LEFT JOIN keeping
    parent-null rows. Spark idiom: LEFT ANTI join (broadcasts the parent
    when small — the dominant case for FK checks against dimensions).
    """
    return (
        child.filter(F.col(child_column).isNotNull())
        .select(F.col(child_column).alias("from_field"))
        .join(
            parent.select(F.col(parent_column).alias("from_field")).distinct(),
            on="from_field",
            how="left_anti",
        )
    )


@dataclass
class TestResult:
    """Outcome of one test run through the harness."""

    failures: int
    should_warn: bool
    should_error: bool


def test_harness_frame(
    violations: DataFrame,
    fail_calc: str = "count(*)",
    warn_if: str = "!= 0",
    error_if: str = "!= 0",
    limit: int | None = None,
    where: str | None = None,
) -> DataFrame:
    """The reference's one-row test-harness frame, built lazily.

    Reference: default__get_test_sql (manifest.json:1@56739) —
    ``select {fail_calc} as failures, {fail_calc} {warn_if} as should_warn,
    {fail_calc} {error_if} as should_error from (main_sql limit {limit})``.
    Lazy so callers can union many harness rows (one per test) into a
    single job — the suite pattern.

    ``where`` caveat (r10 review finding): the reference's ``where``
    config pre-filters the MODEL through a subquery BEFORE the test SQL
    runs (default__get_where_subquery, @146116). This harness receives
    the already-computed violations frame, so ``where`` here can only
    post-filter THAT frame — its columns are the test's output (e.g.
    ``unique_field``/``n_records``), not the model's, and for tests
    whose violation set depends on the row population the two orders
    differ. To reproduce the reference config exactly, filter the model
    BEFORE calling the test function (``test_unique(df.filter(...),
    ...)``) and leave this parameter unset."""
    v = violations
    if where:
        v = v.filter(where)
    if limit is not None:
        v = v.limit(limit)
    return v.agg(F.expr(f"{fail_calc}").cast("long").alias("failures")).select(
        "failures",
        F.expr(f"failures {warn_if}").alias("should_warn"),
        F.expr(f"failures {error_if}").alias("should_error"),
    )


def run_test_harness(
    violations: DataFrame,
    fail_calc: str = "count(*)",
    warn_if: str = "!= 0",
    error_if: str = "!= 0",
    limit: int | None = None,
    where: str | None = None,
) -> tuple[DataFrame, TestResult]:
    """:func:`test_harness_frame` plus the eagerly-evaluated
    :class:`TestResult` (the reference fetches the row to compare against
    thresholds; we do the same with a single collect of one row)."""
    harness = test_harness_frame(violations, fail_calc, warn_if, error_if, limit, where)
    row = harness.first()
    return harness, TestResult(
        failures=row["failures"] or 0,
        should_warn=bool(row["should_warn"]),
        should_error=bool(row["should_error"]),
    )


def collect_freshness(df: DataFrame, loaded_at_field: str, filter_expr: str | None = None) -> DataFrame:
    """Source freshness probe (default__collect_freshness,
    manifest.json:1@192559): ``select max(loaded_at) as max_loaded_at,
    current_timestamp() as snapshotted_at from source [where filter]``.
    """
    probe = df.filter(filter_expr) if filter_expr else df
    return probe.agg(
        F.max(F.col(loaded_at_field)).alias("max_loaded_at"),
        F.current_timestamp().alias("snapshotted_at"),
    )


def freshness_age_seconds(df: DataFrame, loaded_at_field: str, as_of: Column) -> DataFrame:
    """Deterministic freshness variant: age of the newest row relative to a
    caller-supplied ``as_of`` timestamp (instead of wall-clock
    current_timestamp), so results are reproducible and oracle-checkable.
    Threshold evaluation (warn_after/error_after) happens in the caller,
    exactly like the reference's Python-side compare.
    """
    return df.agg(F.max(F.col(loaded_at_field)).alias("max_loaded_at")).select(
        "max_loaded_at",
        (
            F.unix_micros(as_of.cast("timestamp"))
            - F.unix_micros(F.col("max_loaded_at").cast("timestamp"))
        ).cast("double").alias("age_us"),
    ).select(
        "max_loaded_at",
        (F.col("age_us") / F.lit(1000000.0)).alias("age_seconds"),
    )


def volume_anomalies(
    df: DataFrame,
    date_col: str,
    window: int = 7,
    threshold_pct: int = 200,
) -> DataFrame:
    """Source volume monitoring (the dbt-adjacent 'did today's load look
    like the last week's?' check, cf. elementary/re_data volume tests):
    per day, the row count, the trailing-``window`` mean, an exact
    variance, and an anomaly flag when |count - mean| exceeds
    ``threshold_pct``% of the trailing standard deviation.

    Exactness discipline: counts are integers, so trailing mean and
    variance are computed from EXACT integer window sums
    (n·Σx² − (Σx)² over n·(n−1)) and only the final comparison touches
    doubles — deterministic in any engine, unlike streaming
    stddev_samp whose accumulation order is engine-specific. The flag
    compares squared quantities, avoiding sqrt entirely:
    ((x−mean)·n)² · 10⁴ · (n−1) > pct² · var_num · n  (both sides exact
    integers), so the anomaly decision itself is integer-exact too.

    One window shuffle over the (tiny) per-day count table; the per-day
    aggregate before it is the only corpus-sized stage. Days with fewer
    than 2 trailing days have undefined variance → flagged false."""
    daily = df.groupBy(F.col(date_col).alias("d")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return volume_anomalies_from_daily(daily, window, threshold_pct)


def volume_anomalies_from_daily(
    daily: DataFrame, window: int = 7, threshold_pct: int = 200
) -> DataFrame:
    """The decision half of :func:`volume_anomalies`, over an existing
    per-day (d, cnt) count table — the entry point for monitoring
    pipelines that already maintain daily counts (and for unit-testing
    the arithmetic at magnitudes impractical to materialize as rows)."""
    from pyspark.sql.window import Window

    w = Window.orderBy("d").rowsBetween(-window, -1)
    n = F.count(F.lit(1)).over(w)
    s = F.sum("cnt").over(w)
    # Decimal discipline STARTS AT THE PRODUCTS (r06, completing the
    # ADVICE fix): cnt² in long wraps once a day passes ~3·10^9 rows, and
    # (Σx)² wraps once the trailing-window total does — casting the
    # already-wrapped long to decimal downstream would launder the wrap.
    # Every square below is decimal(38,0) end-to-end.
    cnt_dec = F.col("cnt").cast("decimal(38,0)")
    # Overflow discipline (ADVICE r06, reworked r07 for ANSI, refined r08
    # per ADVICE r07): under ANSI mode plain decimal overflow RAISES
    # (killing the whole monitoring job for one extreme day) and under
    # legacy mode it NULLs (a silent non-flag once downstream filters on
    # is_anomaly). Every step that can exceed decimal(38,0) therefore
    # uses try_* arithmetic — NULL on overflow in BOTH modes. The r07
    # decision coalesced any overflow straight to TRUE, which
    # blanket-flagged every day of an extreme-scale window (the rhs
    # product pct²·var_num·n overflows from window-WIDE variance, not the
    # flagged day's own deviation). r08: when the exact comparison
    # overflows, the decision falls back to the SAME inequality in
    # doubles, computed from the decimal window sums — dev (≤ n·long) and
    # Σx (≤ n·long) never overflow decimal(38,0), and Σx² only does past
    # ~3.9·10^18 rows/day, so the fallback inputs are exact to 1 ulp and
    # the double decision is correct unless the day sits within ~10⁻¹⁵
    # relative of the threshold. Only if even the fallback is NULL
    # (Σx² itself overflowed — beyond long-count realism) does the flag
    # coalesce to a conservative TRUE. is_anomaly is NEVER NULL and never
    # a crashed job. cnt² itself always fits (long² < 10^38).
    s_dec = F.try_sum(cnt_dec).over(w)
    sq = F.try_sum(cnt_dec * cnt_dec).over(w)
    # var_num = n·Σx² − (Σx)²  (variance numerator; var = var_num/(n(n-1)))
    var_num = F.try_subtract(F.try_multiply(n, sq), F.try_multiply(s_dec, s_dec))
    # (x − mean)·n in decimal: cnt·n − Σx, exact and raise-free
    dev_dec = F.try_subtract(F.try_multiply(cnt_dec, n), s_dec)
    # |x−mean| > pct/100·sqrt(var_num/(n(n−1)))
    # ⇔ dev_num²·10⁴·(n−1) > pct²·var_num·n   (multiply by 10⁴·n²(n−1))
    # decimal keeps the decision exact up to ~10^15 rows/day at the
    # default window; past that the try products go NULL and the flag
    # coalesces to an explicit TRUE below.
    lhs = F.try_multiply(
        F.try_multiply(F.try_multiply(dev_dec, dev_dec), F.lit(10000)), n - 1
    )
    rhs = F.try_multiply(
        F.try_multiply(F.lit(threshold_pct * threshold_pct), var_num), n
    )
    # double fallback (ADVICE r07): same inequality from the exact decimal
    # window sums cast to double — engaged only when the exact decimal
    # products overflowed (~10^15+ rows/day at the default window)
    dev_d = dev_dec.cast("double")
    sq_d = sq.cast("double")
    s_d = s_dec.cast("double")
    var_num_d = n * sq_d - s_d * s_d
    lhs_d = dev_d * dev_d * F.lit(10000.0) * (n - 1)
    rhs_d = F.lit(float(threshold_pct * threshold_pct)) * var_num_d * n
    flag = F.when(
        n >= 2,
        F.coalesce(lhs > rhs, lhs_d > rhs_d, F.lit(True)),
    ).otherwise(F.lit(False))
    return daily.select(
        "d",
        "cnt",
        n.alias("n_trailing"),
        F.round(s.cast("double") / n, 6).alias("trailing_mean"),
        F.round(
            F.when(n >= 2, var_num.cast("double") / (n * (n - 1))).otherwise(
                F.lit(None).cast("double")
            ),
            6,
        ).alias("trailing_var"),
        flag.alias("is_anomaly"),
    )
