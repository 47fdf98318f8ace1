"""Adversarial-distribution checks for the sketch accuracy contracts.

`stats_sketch_quantiles` / `stats_sketch_distinct_merge` verify their
sketches' published guarantees IN-PLAN (SCALE.md "Sketch aggregates") and
the contract booleans are the driver-compared oracle surface — so a wrong
bound FORMULA would pass on the fixed testdata yet false-red on other
distributions. These tests re-run both queries over synthetic tables at
the distribution extremes (constant, two-point, zipf-skew, wide magnitude
spread; disjoint / fully-shared / high-cardinality distinct sets) and
assert every contract boolean holds, i.e. the bound check is faithful to
the GK rank-error and HLL 3-sigma guarantees rather than tuned to one
dataset.
"""
from __future__ import annotations

import math

import pytest


def _write_lineitem(spark, tmp_path, prices):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(float(p),) for p in prices], "l_extendedprice double"
    ).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    return sf


def _write_events(spark, tmp_path, rows):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(t, int(u)) for t, u in rows], "event_type string, user_id bigint"
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    return sf


_PRICE_SETS = {
    # GK must still return a valid element when every rank is the same value
    "constant": [42.0] * 500,
    # 99/1 two-point mass: the q=0.95 cut sits inside the heavy atom
    "two_point": [1.0] * 990 + [1e9] * 10,
    # zipf-ish skew: rank r appears ~N/r times
    "zipf": [float(r) for r in range(1, 60) for _ in range(600 // r)],
    # 18 orders of magnitude — catches bounds written against value (not
    # rank) space, which would blow up here
    "magnitude_spread": [10.0**e for e in range(-9, 10) for _ in range(30)],
    "single_row": [7.5],
}


@pytest.mark.parametrize("dist", sorted(_PRICE_SETS))
def test_gk_rank_bound_holds_on_adversarial_distributions(spark, tmp_path, dist):
    from dbt_ci_demo_spark.queries import registry_queries

    sf = _write_lineitem(spark, tmp_path, _PRICE_SETS[dist])
    rows = registry_queries()["stats_sketch_quantiles"](spark, sf).collect()
    assert len(rows) == 4 and all(r.within_bound for r in rows), rows
    assert all(r.n_rows == len(_PRICE_SETS[dist]) for r in rows)


_EVENT_SETS = {
    # every type shares ONE user: per-group exact=1, merged exact=1 —
    # the +2 absolute slack must carry the tiny-group case
    "all_shared": [(t, 1) for t in "abcde" for _ in range(50)],
    # disjoint users per type: merged exact = sum of per-group exacts
    "disjoint": [(t, i * 1000 + u) for i, t in enumerate("abcde") for u in range(80)],
    # one giant group at HLL-stressing cardinality plus empty-ish tails
    "high_card": [("big", u) for u in range(20000)] + [("tiny", 1), ("tiny", 2)],
    # heavy duplication: 30k rows, 300 distinct users across 3 types
    "heavy_dup": [("xyz"[u % 3], u % 300) for u in range(30000)],
}


@pytest.mark.parametrize("shape", sorted(_EVENT_SETS))
def test_hll_bound_and_merge_hold_on_adversarial_sets(spark, tmp_path, shape):
    from dbt_ci_demo_spark.queries import registry_queries

    rows = _EVENT_SETS[shape]
    sf = _write_events(spark, tmp_path, rows)
    out = registry_queries()["stats_sketch_distinct_merge"](spark, sf).collect()
    by_type = {r.event_type: r for r in out}
    assert all(r.est_within_bound for r in out), out
    # exact columns are exact, including the merged ALL row
    assert by_type["ALL"].exact_distinct == len({u for _, u in rows})
    for t in {t for t, _ in rows}:
        assert by_type[t].exact_distinct == len({u for tt, u in rows if tt == t})


def test_gk_bound_is_a_real_check(spark, tmp_path):
    """The bound must be falsifiable: a value whose occupied rank interval
    sits outside [(q±eps)n ± 1] fails the same predicate the query builds.
    Re-derive the predicate on a known-bad (value, rank) pairing to pin
    that the inequality directions are the rejecting ones (a formula that
    degenerated to TRUE would pass every distribution test above)."""
    n = 1000
    eps = 1.0 / 1000
    q = 0.25
    # candidate far above the true q=0.25 cut: ranks n_lt = 900, n_le = 950
    n_lt, n_le = 900, 950
    within = (n_lt <= (q + eps) * n + 1) and (n_le >= (q - eps) * n - 1)
    assert not within
    # and the true cut passes
    n_lt, n_le = int(math.floor(q * n)) - 1, int(math.ceil(q * n)) + 1
    within = (n_lt <= (q + eps) * n + 1) and (n_le >= (q - eps) * n - 1)
    assert within
