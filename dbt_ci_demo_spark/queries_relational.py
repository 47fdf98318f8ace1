"""Additional relational query shapes: semi-join (EXISTS), anti-join
(NOT EXISTS), aggregate-subquery (HAVING-driven selection), and
schema-evolution merge — widening the oracle-checked surface over the
join/subquery patterns the reference's runtime executes via BigQuery
(SURVEY.md §2.B.8 scalar/IN subqueries; §2.B.2 B13 on_schema_change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_ci_demo_spark.functions.bq_compat import exact_avg, exact_sum
from dbt_ci_demo_spark.operators import incremental as incr
from dbt_ci_demo_spark.operators import skew
from dbt_ci_demo_spark.queries import _t, query


@query(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left-semi join): orders with any lineitem
    shipped after the order date, counted per priority. The semi-join
    shuffles both sides on l_orderkey once and emits at most one match per
    order — no fan-out, no post-join dedup, the scale-correct EXISTS plan."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    sel = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"]) & (l["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "q16_unsold_parts",
    oracle="""
    SELECT p.p_brand, count(*) AS n_parts
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
    GROUP BY p.p_brand
    """,
)
def q16_unsold_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join: parts never sold in quantity > 45,
    counted per brand. The extra predicate is pushed below the anti-join
    into the lineitem scan (PushedFilters), shrinking the build side
    before the shuffle — the scale-correct NOT-EXISTS plan."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        p.join(l, p["p_partkey"] == l["l_partkey"], "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


_Q18_QTY = 150


@query(
    "q18_large_orders",
    oracle=f"""
    SELECT c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS total_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > {_Q18_QTY})
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (IN-subquery over an aggregate): orders whose total
    quantity exceeds a threshold, with customer detail. The qualifying-key
    set is computed once (groupBy + filter) and applied as a semi-join —
    at scale the aggregate's output is tiny relative to lineitem, so the
    semi-join broadcasts."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("__tq"))
        .filter(F.col("__tq") > _Q18_QTY)
        .select("l_orderkey")
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(l.select("l_orderkey", "l_quantity"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(exact_sum("l_quantity").alias("total_qty"))
    )


@query(
    "incr_schema_evolution",
    oracle="""
    WITH tgt AS (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0),
    src AS (SELECT c_custkey, c_name, c_acctbal + 5.0 AS c_acctbal, c_mktsegment
            FROM customer WHERE c_custkey % 3 = 0)
    SELECT t.c_custkey, t.c_name, t.c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
    FROM tgt t WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.c_custkey = t.c_custkey)
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM src
    """,
)
def incr_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """on_schema_change='append_new_columns' (B13) through a live merge:
    the incoming batch carries a new column (c_mktsegment); the target is
    widened with a typed NULL, then the batch merges on the unique key.
    Exercises apply_schema_change_policy + merge_upsert end-to-end."""
    cust = _t(spark, sf_dir, "customer")
    tgt = cust.filter(F.col("c_custkey") % 2 == 0).select("c_custkey", "c_name", "c_acctbal")
    src = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + 5.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    src2, tgt2 = incr.apply_schema_change_policy(src, tgt, "append_new_columns")
    return incr.merge_upsert(tgt2, src2, "c_custkey")


@query(
    "events_salted_user_join",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def events_salted_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient fact-dim join (operators/skew.salted_join): events
    salted on hash(event_id) into 8 sub-keys, customer replicated 8x, join
    on (user_id, salt) — identical results to the plain join (the oracle),
    with any hot user bounded to 1/8 of a reducer. The aggregate after the
    join is keyed by segment, so the salt never leaks downstream."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = skew.salted_join(ev, cust, key="user_id", n_salts=8, salt_from="event_id")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum("value").alias("sum_value"),
    )


@query(
    "events_salted_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def events_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event_type via disjoint-salt partial
    distincts (operators/skew.salted_count_distinct): with only ~5 hot
    event_type keys, the naive count(distinct) funnels all (type, user)
    pairs through 5 reducers; salting by hash(user) % 16 spreads each key
    over 16 while keeping the count exact (partial sets are disjoint)."""
    ev = _t(spark, sf_dir, "events")
    return skew.salted_count_distinct(ev, key="event_type", value="user_id", n_salts=16)


@query(
    "q7_nation_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           count(*) AS n_lineitems,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume. The nation table joins
    twice under different roles (customer's vs supplier's) — both
    broadcast; the fact-side joins shuffle once each on their natural
    keys. The inequality filter runs post-broadcast, costing nothing."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                     THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))
                     ELSE CAST(0 AS DECIMAL(30,6)) END) /
                SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)))
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio (promo revenue share).
    One broadcast join + one scalar aggregate; both sums accumulate as
    decimals and the division happens once at the end, so the double is
    engine- and order-identical."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = rev.cast("decimal(30,6)")
    promo = F.when(F.col("p_type").like("PROMO%"), dec).otherwise(F.lit(0).cast("decimal(30,6)"))
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .agg(
            (F.lit(100.0) * F.sum(promo) / F.sum(dec)).cast("double").alias("promo_revenue_pct")
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT count(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive filter + scalar aggregate.
    All three predicates reach the parquet scan as PushedFilters, so at
    100 TB the scan reads only row groups whose min/max stats overlap the
    ship-date year — the canonical predicate-pushdown query."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            exact_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        )
    )


@query(
    "q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue-from-returns top-20 per customer.
    The returnflag filter is pushed into the lineitem scan before the
    fact-fact shuffle join; nation broadcasts; LIMIT-after-ORDER BY
    executes as TakeOrderedAndProject (per-partition top-k + k-row driver
    merge), never a full sort. Decimal-exact revenue makes the ordering
    engine-independent; c_custkey breaks ties."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, o["o_orderkey"] == l["l_orderkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    WITH avgq AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / count(*)) AS qty_limit
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand, count(*) AS n_items,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avgq a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < a.qty_limit
    GROUP BY p.p_brand
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average subquery, decorrelated
    into an aggregate + self-join. Both the per-part aggregate and the
    join back to lineitem hash on l_partkey, so AQE coalesces them into
    one co-partitioned exchange; part is broadcast. The 0.2×avg threshold
    is computed as exact-decimal sum / count, so the double compare is
    identical in both engines."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    avgq = l.groupBy("l_partkey").agg(
        (F.lit(0.2) * (exact_avg("l_quantity"))).alias("qty_limit")
    ).withColumnRenamed("l_partkey", "a_partkey")
    return (
        l.join(avgq, l["l_partkey"] == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (exact_sum("l_extendedprice") / F.lit(7.0)).cast("double").alias("avg_yearly"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT count(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across both join sides.
    Catalyst derives the single-side residuals (brand ∈ {…}, size ≤ 25,
    quantity ≤ 30) and pushes them below the broadcast join into each
    scan, so the disjunction only evaluates on pre-filtered rows — the
    query Q19 exists to test in an optimizer."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .filter(b1 | b2 | b3)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    WITH cutoff AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / count(*) AS lim
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name AS nation, count(*) AS n_custs,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT lim FROM cutoff)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    GROUP BY n.n_name
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar-aggregate subquery + NOT EXISTS.
    The positive-balance average is one tiny scalar aggregate whose
    result enters the plan as a literal-like broadcast (no per-row
    recompute); the NOT EXISTS is a left-anti join against orders
    pre-filtered to high-value rows — the anti-join's build side shrinks
    in the scan, not after the shuffle. Threshold arithmetic is
    exact-decimal sum / count so the filter is engine-identical."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    n = _t(spark, sf_dir, "nation")
    lim_df = c.filter(F.col("c_acctbal") > 0).agg(exact_avg("c_acctbal").alias("lim"))
    rich = c.join(F.broadcast(lim_df)).filter(F.col("c_acctbal") > F.col("lim"))
    return (
        rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            exact_sum("c_acctbal").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# OLAP grouping shapes beyond flat GROUP BY: rollup, set operations, pivot.
# Absent in the reference (its models only flat-group — SURVEY §2.A), but
# table stakes for the warehouse workloads this engine replaces.
# ---------------------------------------------------------------------------


@query(
    "olap_rollup_pricing",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def olap_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): detail rows plus per-flag and
    grand-total subtotals in one pass. Spark plans rollup as a single
    Expand + hash aggregate — one scan, one shuffle for all grouping
    levels, which is the scale-correct alternative to unioning three
    aggregates. Neither column is ever NULL in the data, so the 'ALL'
    sentinel unambiguously marks subtotal rows in both engines."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            exact_sum("l_quantity").alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


@query(
    "olap_cube_volumes",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def olap_cube_volumes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping levels — detail,
    each one-dimension margin, and the grand total — in one Expand + hash
    aggregate: one scan, one shuffle for 2^2 groupings (vs four unioned
    aggregates). Neither column is NULL in the data, so the 'ALL'
    sentinel is unambiguous in both engines."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("revenue"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("orderstatus"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "revenue",
        )
    )


@query(
    "set_repeat_vs_churned",
    oracle="""
    WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
         y97 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT 'repeat' AS cohort, o_custkey FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
    UNION ALL
    SELECT 'churned' AS cohort, o_custkey FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
    """,
)
def set_repeat_vs_churned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: 1996 buyers INTERSECT / EXCEPT 1997 buyers, tagged
    by cohort. Spark plans INTERSECT as a left-semi and EXCEPT as a
    left-anti aggregate join on the full row — both single-shuffle on
    o_custkey, and the two branches reuse the same year-filtered scans
    (the date predicates are pushed to parquet)."""
    o = _t(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey").distinct()

    y96, y97 = year(1996), year(1997)
    repeat = y96.intersect(y97).select(F.lit("repeat").alias("cohort"), "o_custkey")
    churned = y96.exceptAll(y97).select(F.lit("churned").alias("cohort"), "o_custkey")
    return repeat.unionByName(churned)


@query(
    "olap_pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
)
def olap_pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority × status. The status values are
    enumerated explicitly, so Spark skips the extra distinct-values job
    and plans a single aggregate with one pivot expression per column —
    one scan, one shuffle, no per-value passes. Missing cells are 0 (not
    NULL) to match the oracle's FILTER counts."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate-of-aggregate (the reference's view +
    scalar MAX subquery pattern). The per-supplier revenue aggregate is
    computed once and feeds both the scalar max (a one-row broadcast)
    and the equality filter — equality on exact-decimal-derived doubles
    is engine-safe, unlike comparing order-dependent float sums."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )
