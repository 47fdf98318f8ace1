"""Property-based tests for the BigQuery-idiom expression helpers
(functions/bq_compat): the SQL-level queries pin engine parity; these pin
the *semantics* against an independent Python model over randomized
inputs (hypothesis), per the SURVEY §5 plan to add the property layer the
reference lacks.
"""

from __future__ import annotations

import pytest

import bisect

from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_ci_demo_spark.functions.bq_compat import range_bucket, scd_hash


def _bq_range_bucket_model(x: int, start: int, end: int, interval: int) -> int:
    """Reference model of BigQuery RANGE_BUCKET(x, GENERATE_ARRAY(start,
    end, interval)): the number of array elements <= x (insertion point)."""
    edges = list(range(start, end + 1, interval))
    return bisect.bisect_right(edges, x)


@settings(max_examples=20, deadline=None)
@pytest.mark.slow  # ~14s hypothesis sweep: round-close tier (range_bucket
# stays oracle-checked each round via the fx_scalar_idioms gate row)
@given(
    st.lists(st.integers(min_value=-100, max_value=200), min_size=1, max_size=50),
    st.integers(min_value=0, max_value=10),
    st.integers(min_value=1, max_value=5),
)
def test_range_bucket_matches_bigquery_model(spark, xs, start, interval):
    end = start + 10 * interval
    df = spark.createDataFrame([(x,) for x in xs], "x int")
    got = {
        r.x: r.b
        for r in df.select(
            "x", range_bucket("x", start, end, interval).alias("b")
        ).collect()
    }
    for x in xs:
        assert got[x] == _bq_range_bucket_model(x, start, end, interval), (
            x,
            start,
            end,
            interval,
        )


def test_range_bucket_rejects_non_positive_interval():
    """r13 review: BigQuery's GENERATE_ARRAY raises on a non-positive
    step; interval=0 used to surface as a bare ZeroDivisionError and a
    negative interval produced nonsense ordinals silently."""
    for bad in (0, -3):
        with pytest.raises(ValueError, match="interval must be positive"):
            range_bucket("x", 0, 10, bad)


@pytest.mark.slow  # ~27s hypothesis sweep incl. setup: round-close tier
# (r11 fast-tier budget; the scd_hash path is also covered every round by
# the snap_* oracle rows)
@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(max_size=8)),
            st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_scd_hash_null_coalescing_and_injectivity(spark, rows):
    """scd_hash must (a) treat NULL as '' per the reference's coalesce
    (bigquery__snapshot_hash_arguments @31511) and (b) be a pure function
    of the coalesced string tuple: equal tuples hash equal, and the hash
    matches Python's md5 of the same '|'-joined form."""
    import hashlib

    df = spark.createDataFrame(rows, "a string, b int")
    got = df.select("a", "b", scd_hash("a", "b").alias("h")).collect()
    for r in got:
        joined = "|".join(["" if r.a is None else r.a, "" if r.b is None else str(r.b)])
        assert r.h == hashlib.md5(joined.encode()).hexdigest(), (r.a, r.b)


def _cdc_model(rows):
    """Python reference model of the versioned CDC state: per key, the
    winner by (seq desc, delete-first, op asc, content) — content as the
    final tie so the result depends only on the row multiset."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for key, v, seq, op in set(rows):
        by_key[key].append((seq, op == "D", op, v))
    out = {}
    for key, cands in by_key.items():
        seq, is_del, op, v = max(
            cands, key=lambda c: (c[0], c[1], [-ord(ch) for ch in c[2]])
        )
        # note: among equal (seq, is_del, op) the engine picks by xxhash64
        # of the full row — the MODEL cannot reproduce that hash, so the
        # property asserts (key, seq, op) agreement and live-key sets,
        # plus full order-invariance across batch splits (exact).
        out[key] = (seq, op)
    return out


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),       # key
            st.sampled_from(["a", "b", "c"]),            # payload
            st.integers(min_value=0, max_value=6),       # seq
            st.sampled_from(["U", "U", "I", "D"]),       # op
        ),
        min_size=1,
        max_size=14,
    ),
    st.randoms(use_true_random=False),
)
@pytest.mark.slow  # 90s randomized sweep: round-close tier
def test_cdc_versioned_random_batches_order_invariant(spark, rows, rnd):
    """Property layer for cdc_apply_versioned: for RANDOM change rows
    split into random batches, (1) every application order yields the
    exact same state rows, (2) the per-key (seq, op) winners match an
    independent Python model, (3) replaying a random batch is a no-op."""
    from dbt_ci_demo_spark.operators.incremental import cdc_apply_versioned

    schema = "key bigint, v string, seq int, op string"
    uniq = sorted(set(rows))
    k = rnd.randint(1, min(3, len(uniq)))
    cuts = sorted(rnd.sample(range(1, len(uniq) + 1), k - 1)) if k > 1 else []
    batches = []
    prev = 0
    for c in cuts + [len(uniq)]:
        if uniq[prev:c]:
            batches.append(spark.createDataFrame(uniq[prev:c], schema))
        prev = c
    empty = spark.createDataFrame([], schema)

    def apply_all(order):
        state = empty
        for i in order:
            state = cdc_apply_versioned(state, batches[i], "key", "seq", "op")
        return frozenset(tuple(r) for r in state.collect())

    fwd = apply_all(range(len(batches)))
    rev = apply_all(range(len(batches) - 1, -1, -1))
    assert fwd == rev
    model = _cdc_model(rows)
    got = {r[0]: (r[2], r[3]) for r in fwd}
    assert set(got) == set(model)
    for key, (seq, op) in model.items():
        g_seq, g_op = got[key]
        assert g_seq == seq, (key, got[key], model[key])
        if op == "D":
            assert g_op == "D", (key, got[key], model[key])
    # replay any batch: no change
    i = rnd.randrange(len(batches))
    state = empty
    for j in range(len(batches)):
        state = cdc_apply_versioned(state, batches[j], "key", "seq", "op")
    replayed = cdc_apply_versioned(state, batches[i], "key", "seq", "op")
    assert frozenset(tuple(r) for r in replayed.collect()) == fwd


@pytest.mark.slow  # ~8s hypothesis sweep: round-close tier (precedent: the
# scd_hash property sweep; the inverted-bounds NULL contract also has oracle
# coverage via fx_scalar_idioms)
def test_range_bucket_int64_exactness_and_inverted_bounds(spark):
    """r10 review findings (confirmed live pre-fix): (a) the double-
    division floor returned bucket+1 once |x-start| exceeded 2^53 —
    integral div is exact at any int64 magnitude; (b) the int32 result
    cast was an ANSI CAST_OVERFLOW crash for huge ordinals — the return
    type is now BIGINT like BigQuery's INT64; (c) inverted bounds (an
    empty GENERATE_ARRAY) return 0 for every x, not a negative ordinal.
    ADVICE r10: RANGE_BUCKET(NULL, ...) IS NULL regardless of the
    boundaries array — the inverted-bounds literal-0 shortcut must
    propagate NULL like the non-inverted arithmetic path already does."""
    from dbt_ci_demo_spark.functions.bq_compat import range_bucket

    big_interval = 1 << 40
    x = (1 << 53) + big_interval - 1  # true bucket ordinal: 8192 + 1
    df = spark.createDataFrame([(x,), (5,), (None,)], "x bigint")
    out = df.select("x", range_bucket("x", 0, (1 << 54), big_interval).alias("b"))
    assert dict(out.dtypes)["b"] == "bigint"
    got = {r.x: r.b for r in out.collect()}
    assert got[x] == (1 << 13) + 1 and got[5] == 1 and got[None] is None, got
    inv = {
        r.x: r.b
        for r in df.select("x", range_bucket("x", 10, 0, 1).alias("b")).collect()
    }
    assert inv[x] == 0 and inv[5] == 0 and inv[None] is None, inv


def test_register_views_empty_list_registers_nothing(spark, sf_dir):
    from dbt_ci_demo_spark.sources.catalog import register_views

    spark.catalog.dropTempView("region") if spark.catalog.tableExists("region") else None
    register_views(spark, sf_dir, tables=[])
    assert not spark.catalog.tableExists("region")
    register_views(spark, sf_dir, tables=["region"])
    assert spark.catalog.tableExists("region")
    spark.catalog.dropTempView("region")
