"""Property-based tests for the BigQuery-idiom expression helpers
(functions/bq_compat): the SQL-level queries pin engine parity; these pin
the *semantics* against an independent Python model over randomized
inputs (hypothesis), per the SURVEY §5 plan to add the property layer the
reference lacks.
"""

from __future__ import annotations

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
