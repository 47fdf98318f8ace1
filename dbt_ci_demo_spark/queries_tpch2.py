"""Remaining TPC-H plan shapes (Q2, Q8, Q9, Q11, Q12, Q13, Q20, Q21),
adapted to the driver fixture schema (no partsupp table — supplier/part
cost facts are derived from lineitem; no commit/receipt dates — lateness is
ship-date vs order-date).

These complete the relational breadth beyond the reference's own two
models: the reference's runtime (BigQuery) executes arbitrary SQL of these
shapes on any model's behalf (SURVEY.md §2.B.8 notes the project itself
uses only scalar/IN subqueries — these exercise the rest: correlated
scalar-subquery min (Q2), share-of-total division (Q8/Q11), multi-way
star joins (Q9), conditional aggregation (Q12), outer-join histograms
(Q13), nested qualifying-set selection (Q20), and the
exists/not-exists-on-the-same-table pattern (Q21)).

Scale notes are per-query; the common rules: derive small qualifying sets
first and semi-join them (never join-then-filter the fact table), broadcast
dimension tables, and keep money aggregates decimal-accumulated
(functions/bq_compat.exact_sum) so results are partition-order-independent
at any executor count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_ci_demo_spark.functions.bq_compat import exact_sum
from dbt_ci_demo_spark.queries import _t, query


def _dims(spark: SparkSession, sf_dir: str):
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return s, n, r


# ---------------------------------------------------------------------------
# Q2: correlated scalar-subquery MIN (min-cost supplier per part).
# ---------------------------------------------------------------------------

_Q2_REGION = "EUROPE"
_Q2_SIZE = 15


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    regional AS (
      SELECT c.l_partkey, c.l_suppkey, c.unit_cost
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = '{_Q2_REGION}'
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name, rg.unit_cost
    FROM part p
    JOIN regional rg ON rg.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = rg.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = {_Q2_SIZE}
      AND rg.unit_cost = (SELECT min(r2.unit_cost) FROM regional r2
                          WHERE r2.l_partkey = p.p_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each size-{15} part, the EUROPE supplier(s)
    offering the minimum unit cost (cost fact derived from lineitem in
    place of partsupp). The correlated `= (SELECT min(...) WHERE same
    part)` is decorrelated the standard way: aggregate min per part once,
    join back on (part, cost) equality. Unit cost is the same double
    division on both engines and MIN is order-independent, so the equality
    join is engine-safe. At scale: the part filter prunes before the join,
    the per-part min is a second pass over the already-reduced regional
    cost table (|parts|×|suppliers| upper bound, far smaller than
    lineitem), and both joins shuffle on p_partkey only."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == _Q2_SIZE)
    s, n, r = _dims(spark, sf_dir)
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    regional = (
        cost.join(F.broadcast(s), cost["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r.filter(F.col("r_name") == _Q2_REGION)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "l_suppkey", "unit_cost")
    )
    min_cost = regional.groupBy(
        F.col("l_partkey").alias("__mc_partkey")
    ).agg(F.min("unit_cost").alias("__min_cost"))
    return (
        p.join(regional, p["p_partkey"] == regional["l_partkey"])
        .join(
            min_cost,
            (F.col("p_partkey") == F.col("__mc_partkey"))
            & (F.col("unit_cost") == F.col("__min_cost")),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
    )


# ---------------------------------------------------------------------------
# Q8: national market share within a region, by order year.
# ---------------------------------------------------------------------------

_Q8_REGION = "AMERICA"
_Q8_NATION = "NATION_5"


@query(
    "q8_market_share",
    oracle=f"""
    WITH base AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = '{_Q8_REGION}'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}' THEN volume
                         ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: {nation}'s share of revenue sold into {region}
    customers, per order year — conditional-sum / total-sum division.
    Both sums are decimal-accumulated and only the final division happens
    in double, so the share is bit-identical across engines and partition
    orders. At scale this is one pass over lineitem with all five
    dimension joins broadcast (largest dim = customer; at 100 TB customer
    would shuffle-join instead, chosen automatically by AQE's size
    estimate) and a tiny (year)-keyed aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s, n, r = _dims(spark, sf_dir)
    cn = n.alias("cn")
    sn = n.alias("sn")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn.n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == _Q8_REGION)),
              F.col("cn.n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn.n_nationkey"))
        .select(
            F.year(o["o_orderdate"]).alias("o_year"),
            vol.cast("decimal(30,6)").alias("volume"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(30,6)")
    return base.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == _Q8_NATION, F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9: product-line profit by supplier nation and year.
# ---------------------------------------------------------------------------

_Q9_TOKEN = "gear"


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT sn.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - 0.5 * p.p_retailprice * l.l_quantity
                         AS DECIMAL(30,6))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%{_Q9_TOKEN}%'
    GROUP BY sn.n_name, EXTRACT(year FROM o.o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on '{gear}' parts by supplier nation × order
    year (supply cost approximated as half retail price — the fixture has
    no partsupp). The part filter is applied before the join so the
    broadcast build side carries only matching parts; lineitem is the only
    large input and is scanned once. Profit terms are computed per-row in
    double (identically on both engines) then decimal-accumulated."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like(f"%{_Q9_TOKEN}%"))
    o = _t(spark, sf_dir, "orders")
    s, n, _ = _dims(spark, sf_dir)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(exact_sum(profit).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11: important parts by share-of-total value (HAVING vs scalar subquery).
# ---------------------------------------------------------------------------

_Q11_NATION = "NATION_3"
_Q11_FRACTION = 0.001


@query(
    "q11_important_parts",
    oracle=f"""
    WITH value_by_part AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS part_value_dec
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = '{_Q11_NATION}'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(part_value_dec AS DOUBLE) AS part_value
    FROM value_by_part
    WHERE CAST(part_value_dec AS DOUBLE) >
          CAST((SELECT SUM(part_value_dec) FROM value_by_part) AS DOUBLE)
          * {_Q11_FRACTION}
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose {nation}-sourced value exceeds a
    fraction of the total — a HAVING predicate against a scalar aggregate
    of the same derived table. The per-part aggregate is computed once;
    the grand total is a one-row broadcast cross-joined as the threshold
    (no second scan of lineitem). The threshold product and comparison are
    double on both engines over identical decimal-derived inputs.

    Both the per-part values and the grand total are accumulated in exact
    decimal and cast to double only at the end, so neither depends on
    partition/summation order — the threshold comparison is identical on
    any engine and at any parallelism (the repo's fixed-point aggregate
    discipline; bit-parity bound |total|·10^6 < 2^53 per exact_sum)."""
    l = _t(spark, sf_dir, "lineitem")
    s, n, _ = _dims(spark, sf_dir)
    value_by_part = (
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n.filter(F.col("n_name") == _Q11_NATION)),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).alias("part_value_dec"))
    )
    total = value_by_part.agg(
        F.sum("part_value_dec").cast("double").alias("__total")
    )
    return (
        value_by_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("part_value_dec").cast("double")
            > F.col("__total") * _Q11_FRACTION
        )
        .select(
            "l_partkey", F.col("part_value_dec").cast("double").alias("part_value")
        )
    )


# ---------------------------------------------------------------------------
# Q12: conditional aggregation by line status (ship-mode analogue).
# ---------------------------------------------------------------------------


@query(
    "q12_priority_by_status",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts (CASE-sum pivot) of urgent vs
    other orders per line status, over one ship-year (the fixture has no
    l_shipmode; l_linestatus plays its role). The year filter reaches the
    lineitem scan as PushedFilters; only (l_orderkey, l_linestatus)
    survive projection into the join, and the aggregate is two codegen'd
    conditional sums — no second pass. Counts are integral, so LONG on
    both engines."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.select("l_orderkey", "l_linestatus")
        .join(o.select("o_orderkey", "o_orderpriority"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (outer join + double aggregate).
# ---------------------------------------------------------------------------


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts, keeping
    zero-order customers via the left outer join (COUNT of a nullable
    column counts only matches — the outer-join-then-count idiom). The
    join predicate's priority filter belongs on the orders side *before*
    the join, not in a WHERE (which would turn the outer join inner).
    At scale: shuffle on custkey once; the second aggregate's domain is
    tiny (distinct counts), so it collapses into few groups."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q20: suppliers with excess shipped quantity of selected parts.
# ---------------------------------------------------------------------------

_Q20_TOKEN = "bolt"
_Q20_QTY = 50


@query(
    "q20_excess_suppliers",
    oracle=f"""
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%{_Q20_TOKEN}%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(l.l_quantity) > {_Q20_QTY}
    )
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than {qty} units of any
    '{bolt}' part in 1997 — a qualifying-set IN over a grouped HAVING
    subquery. The inner aggregate runs over the part-filtered,
    year-filtered lineitem slice (both predicates pushed to the scan; the
    part filter applied via broadcast join before the shuffle), emits a
    small distinct-supplier set, and semi-joins the supplier dim. No
    correlated per-supplier re-scan."""
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like(f"%{_Q20_TOKEN}%"))
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qualifying = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > _Q20_QTY)
        .select("l_suppkey")
    )
    return s.join(qualifying, s["s_suppkey"] == qualifying["l_suppkey"], "left_semi").select(
        "s_suppkey", "s_name", "s_acctbal"
    )


# ---------------------------------------------------------------------------
# Q21: the sole late supplier on multi-supplier orders.
# ---------------------------------------------------------------------------

_Q21_LATE_DAYS = 75


@query(
    "q21_sole_late_supplier",
    oracle=f"""
    WITH per_order AS (
      SELECT l.l_orderkey,
             count(DISTINCT l.l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate
                                      + INTERVAL {_Q21_LATE_DAYS} DAY
                                 THEN l.l_suppkey END) AS n_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY l.l_orderkey
    ),
    late_pairs AS (
      SELECT DISTINCT l.l_suppkey, l.l_orderkey
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late_pairs lp
    JOIN per_order po ON po.l_orderkey = lp.l_orderkey
                     AND po.n_supp > 1 AND po.n_late = 1
    JOIN supplier s ON s.s_suppkey = lp.l_suppkey
    GROUP BY s.s_name
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up a multi-supplier order
    (late = shipped > {75} days after the order date; the fixture has no
    commit/receipt dates). The classic EXISTS + NOT-EXISTS pair over the
    same lineitem table is re-expressed as one grouped pass computing
    (distinct suppliers, distinct late suppliers) per order — `n_supp > 1
    AND n_late = 1` is exactly "another supplier exists and no other late
    supplier exists" for a late supplier. One shuffle on l_orderkey
    serves both the per-order aggregate and the late-pair dedup, instead
    of the three correlated scans the literal EXISTS form implies."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    lo = l.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {_Q21_LATE_DAYS} DAYS"
    )
    # Two-level aggregation instead of countDistinct×2 + a separate pair
    # dedup: collapsing to (order, supplier, any_late) first means the
    # per-order stats AND the late-pair set both derive from that small
    # table — one Expand-free shuffle on the pair key, then a near-free
    # second aggregate, instead of two distinct-expansions over the raw
    # join output.
    pair = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(is_late, 1).otherwise(0)).alias("late")
    )
    # Per-order stats as WINDOW aggregates over pair instead of a second
    # groupBy + self-join (r14, guide §2.4): `pair` referenced twice made
    # Spark execute the whole lineitem⋈orders+aggregate subtree TWICE
    # (the before plan holds two lineitem and two orders scans) and meet
    # the branches in a SortMergeJoin that shuffled both. The window
    # computes identical (n_supp, n_late) per order — count/sum over the
    # same rows the per-order groupBy aggregated — so the filter keeps
    # exactly the rows the inner join kept. One lineitem pass, one
    # l_orderkey exchange, no join; the window partition is bounded by
    # suppliers-per-order (single digits at any scale), so no skew.
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_orderkey")
    flagged = pair.select(
        "l_suppkey",
        "late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late"),
    )
    return (
        flagged.filter(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
