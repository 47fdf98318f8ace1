"""Volume-anomaly decision arithmetic — fast-tier (unmarked) coverage.

These pin the exact-decimal / double-fallback decision logic of
``operators.quality.volume_anomalies*`` at scale counts where naive long
arithmetic wraps (ADVICE r05/r07, moved out of the slow writer tier per
ADVICE r08 so the decision logic keeps default-tier signal)."""

from __future__ import annotations

import pyspark.sql.functions as F

def test_volume_anomaly_decision_exact_at_scale_counts(spark):
    """ADVICE r05: with daily counts in the millions, dev²·10⁴·(n−1)
    exceeds 2^63 and non-ANSI long multiplication would wrap silently,
    flipping the anomaly decision. The decimal(38,0) comparison must
    flag a 5M-row spike over a flat ~2.2M-row week (the wrapped
    arithmetic mis-decided exactly this shape) and stay quiet on a flat
    day. 20M synthetic rows via spark.range — cheap on local[32]."""
    import datetime

    from dbt_ci_demo_spark.operators import quality as dq

    base = datetime.datetime(2024, 1, 1)
    counts = [2_200_000, 2_200_431, 2_199_612, 2_200_207, 2_199_890,
              2_200_118, 2_199_705, 2_200_344, 5_000_000]
    bounds, acc = [], 0
    for c in counts:
        acc += c
        bounds.append(acc)
    day = F.lit(None).cast("timestamp")
    expr = None
    for i in range(len(counts) - 1, -1, -1):
        d = F.lit(base + datetime.timedelta(days=i))
        lo = bounds[i - 1] if i > 0 else 0
        cond = F.col("id") >= lo
        expr = F.when(cond, d) if expr is None else expr.when(cond, d)
    # build when-chain from the top day downward so first match wins
    rows = spark.range(bounds[-1]).select(expr.alias("day"))
    out = dq.volume_anomalies(rows, "day", window=7, threshold_pct=200)
    days = [base + datetime.timedelta(days=i) for i in range(len(counts))]
    got = {r.d: r for r in out.collect()}
    assert got[days[7]].n_trailing == 7
    assert not got[days[7]].is_anomaly  # flat day: quiet
    spike = got[days[8]]
    assert spike.cnt == 5_000_000 and spike.n_trailing == 7
    assert spike.is_anomaly, (
        "5M spike over a flat 2.2M week must flag; a silent 64-bit wrap "
        f"suppresses it (got {spike})"
    )


def test_volume_anomaly_decision_exact_at_billions_per_day(spark):
    """r06 (completing the ADVICE decimal fix): the long-arithmetic wraps
    compose homomorphically mod 2^64, so the decision only corrupts once
    the TRUE variance numerator n·Σx² − (Σx)² exceeds 2^63 — reached at
    day-to-day jitter ≥ ~5·10^8 over the default 7-day window. This
    fixture alternates 3.5e9/6.5e9 daily counts (var_num ≈ 1.08e20,
    wrapped sign-negative), where the pre-fix plan — decimal cast AFTER
    the wrapped window sums — flagged EVERY day (lhs > negative rhs);
    exact arithmetic must stay quiet on the dead-center 5e9 day and
    still flag a genuine 9e9 spike. Exact expectations from Python
    bigints."""
    import datetime

    from dbt_ci_demo_spark.operators import quality as dq

    base = datetime.date(2024, 1, 1)
    counts = [3_499_999_487, 6_500_000_213, 3_500_000_114, 6_499_999_267,
              3_499_999_757, 6_500_000_875, 3_500_000_236, 6_499_999_970,
              5_000_000_000, 9_000_000_000]
    daily = spark.createDataFrame(
        [(base + datetime.timedelta(days=i), c) for i, c in enumerate(counts)],
        "d date, cnt long",
    )
    out = {r.d: r for r in dq.volume_anomalies_from_daily(daily, window=7).collect()}

    def exact_flag(i):
        trail = counts[max(0, i - 7):i]
        n = len(trail)
        if n < 2:
            return False
        s, sq = sum(trail), sum(c * c for c in trail)
        var_num = n * sq - s * s
        dev = counts[i] * n - s
        return dev * dev * 10_000 * (n - 1) > 200 * 200 * var_num * n

    for i, day in enumerate(base + datetime.timedelta(days=i) for i in range(len(counts))):
        assert bool(out[day].is_anomaly) == exact_flag(i), (i, out[day])
    # the dead-center day is quiet (the wrapped plan false-flagged it) …
    assert not out[base + datetime.timedelta(days=8)].is_anomaly
    # … and a genuine 9e9 spike over the same high-variance window flags
    assert out[base + datetime.timedelta(days=9)].is_anomaly


def test_volume_anomaly_overflow_decides_not_blankets(spark):
    """r08 (ADVICE r07): past the decimal(38,0) envelope the exact
    comparison products overflow to NULL. r07 coalesced that straight to
    TRUE — which blanket-flagged every day of an extreme-scale window,
    because the rhs product overflows from window-WIDE variance, not the
    flagged day's own deviation. The refined decision falls back to the
    same inequality in doubles (from the exact decimal window sums):
    is_anomaly is still NEVER NULL, but an overflow-scale day now gets
    the CORRECT decision, matching exact Python-int arithmetic."""
    import datetime

    from dbt_ci_demo_spark.operators import quality as dq

    base = datetime.date(2024, 1, 1)
    # window A: ~10^16 with huge jitter — the r07 false positive: day 4
    # deviates 4.5e16 against a 4.6e16 trailing std (NOT anomalous), but
    # its lhs product overflows decimal(38,0)
    counts = [10_000_000_000_000_000, 90_000_000_000_000_000,
              10_000_000_000_000_000, 90_000_000_000_000_000,
              95_000_000_000_000_000,
              # window B: tight ~5e16 run then a genuine 8x spike — the
              # overflow-scale true positive
              50_000_000_000_000_000, 50_000_001_000_000_000,
              49_999_999_000_000_000, 400_000_000_000_000_000]
    daily = spark.createDataFrame(
        [(base + datetime.timedelta(days=i), c) for i, c in enumerate(counts)],
        "d date, cnt long",
    )
    rows = dq.volume_anomalies_from_daily(daily, window=4).collect()
    flags = {r.d: r.is_anomaly for r in rows}
    assert all(v is not None for v in flags.values()), flags

    def exact_flag(i, window=4, pct=200):
        trail = counts[max(0, i - window):i]
        n = len(trail)
        if n < 2:
            return False
        s, sq = sum(trail), sum(c * c for c in trail)
        var_num = n * sq - s * s
        dev = counts[i] * n - s
        return dev * dev * 10_000 * (n - 1) > pct * pct * var_num * n

    for i in range(len(counts)):
        day = base + datetime.timedelta(days=i)
        assert bool(flags[day]) == exact_flag(i), (i, flags[day])
    # and the two headline decisions, stated explicitly: the r07
    # blanket-TRUE day is now correctly quiet, the genuine spike flags
    assert not flags[base + datetime.timedelta(days=4)]
    assert flags[base + datetime.timedelta(days=8)]
