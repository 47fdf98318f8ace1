"""Query registry: every operator from SURVEY.md §2 as a
``(spark, sf_dir) → DataFrame`` callable paired with an equivalent ANSI-SQL
oracle string (run by DuckDB over the same parquet fixtures).

Conventions (driver contract, __spark_entry__.py):
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the comparator sorts columns by name before hashing);
- floating-point aggregates go through functions.exact_sum/exact_avg
  (decimal accumulation) so results are order-independent and
  hash-identical across engines;
- timestamps are hashed/compared at microsecond precision (the source
  layer already normalizes the nanosecond ``events.ts``);
- fixtures derived inside a query (e.g. the "new batch" for merge tests,
  the nested repo_languages table) are derived by the *same deterministic
  expressions* in both engines.

Each query exercises the real operator implementation from
``dbt_ci_demo_spark.operators`` — the correctness gate therefore covers the
engine code, not a parallel reimplementation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_ci_demo_spark.operators import incremental as incr
from dbt_ci_demo_spark.operators import quality as dq
from dbt_ci_demo_spark.operators import snapshot as snap
from dbt_ci_demo_spark.sources.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def registry_queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def registry_oracles() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship (SURVEY §2.A1-A6): nested ARRAY<STRUCT> build → lateral explode →
# struct field access → count(distinct) → group-by-ordinal.
# Reference: models/aggr_repo_languages.sql:1-6.
# ---------------------------------------------------------------------------


def repo_languages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXTURES.md §2 nested fixture: one row per order, with an
    ARRAY<STRUCT<name,bytes>> column mirroring github.languages."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    o = _t(spark, sf_dir, "orders")
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_orderkey").alias("repo_name"))
        .agg(
            F.collect_list(
                F.struct(
                    F.col("p_type").alias("name"),
                    F.col("l_quantity").cast("bigint").alias("bytes"),
                )
            ).alias("language")
        )
    )


@query(
    "flagship_repo_languages",
    # Oracle is the algebraic equivalent over the un-nested rows: exploding
    # collect_list(struct(...)) returns exactly the joined rows it was built
    # from, so count(distinct) per name matches (and avoids depending on the
    # engine-specific array ordering of collect_list).
    oracle="""
    SELECT p.p_type AS name,
           count(DISTINCT o.o_orderkey) AS repositories_number
    FROM lineitem l
    JOIN part p   ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def flagship_repo_languages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one real query (models/aggr_repo_languages.sql:1-6):
    ``select lang.name, count(distinct repo_name) from t, unnest(language)
    as lang group by 1`` over the derived nested fixture."""
    rl = repo_languages(spark, sf_dir)
    return (
        rl.select("repo_name", F.explode("language").alias("lang"))
        .groupBy(F.col("lang.name").alias("name"))
        .agg(F.countDistinct("repo_name").alias("repositories_number"))
    )


@query(
    "flagship_sql_lateral",
    oracle="""
    SELECT p.p_type AS name,
           count(DISTINCT o.o_orderkey) AS repositories_number
    FROM lineitem l
    JOIN part p   ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def flagship_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same flagship semantics through the SQL surface: LATERAL VIEW explode
    + struct access + GROUP BY ordinal (spark.sql.groupByOrdinal), proving
    the engine's SQL entry point handles the BigQuery query shape."""
    repo_languages(spark, sf_dir).createOrReplaceTempView("repo_languages_v")
    return spark.sql(
        """
        SELECT lang.name AS name,
               count(DISTINCT repo_name) AS repositories_number
        FROM repo_languages_v
        LATERAL VIEW explode(language) AS lang
        GROUP BY 1
        """
    )


@query("test_model_literal", oracle="SELECT 1 AS a")
def test_model_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """models/test_model.sql:1 — ``select 1 as a`` (SURVEY §2.A7)."""
    return spark.sql("SELECT 1 AS a")


# ---------------------------------------------------------------------------
# Data-quality tests (SURVEY §2.B.4). Violations-returning queries.
# ---------------------------------------------------------------------------


@query(
    "dq_unique_violations",
    oracle="""
    SELECT l_orderkey AS unique_field, count(*) AS n_records
    FROM lineitem WHERE l_orderkey IS NOT NULL
    GROUP BY l_orderkey HAVING count(*) > 1
    """,
)
def dq_unique_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq.test_unique(_t(spark, sf_dir, "lineitem"), "l_orderkey")


@query(
    "dq_unique_pass",
    oracle="""
    SELECT o_orderkey AS unique_field, count(*) AS n_records
    FROM orders WHERE o_orderkey IS NOT NULL
    GROUP BY o_orderkey HAVING count(*) > 1
    """,
)
def dq_unique_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq.test_unique(_t(spark, sf_dir, "orders"), "o_orderkey")


@query(
    "dq_not_null_violations",
    oracle="SELECT * FROM documents WHERE text IS NULL",
)
def dq_not_null_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq.test_not_null(_t(spark, sf_dir, "documents"), "text")


@query(
    "dq_accepted_values",
    oracle="""
    SELECT o_orderstatus AS value_field, count(*) AS n_records
    FROM orders GROUP BY o_orderstatus
    HAVING o_orderstatus NOT IN ('O', 'F')
    """,
)
def dq_accepted_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq.test_accepted_values(_t(spark, sf_dir, "orders"), "o_orderstatus", ["O", "F"])


@query(
    "dq_relationships",
    oracle="""
    SELECT DISTINCT from_field FROM (
      SELECT l.l_partkey AS from_field
      FROM lineitem l
      LEFT JOIN (SELECT p_partkey FROM part WHERE p_size <= 25) p
        ON l.l_partkey = p.p_partkey
      WHERE l.l_partkey IS NOT NULL AND p.p_partkey IS NULL
    ) v
    """,
)
def dq_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK check with a deliberately filtered parent so violations are
    non-empty (lineitem.l_partkey → part restricted to p_size <= 25)."""
    child = _t(spark, sf_dir, "lineitem")
    parent = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    return dq.test_relationships(child, "l_partkey", parent, "p_partkey").distinct()


@query(
    "dq_test_harness",
    oracle="""
    WITH viol AS (
      SELECT l_orderkey AS unique_field, count(*) AS n_records
      FROM lineitem WHERE l_orderkey IS NOT NULL
      GROUP BY l_orderkey HAVING count(*) > 1
    )
    SELECT count(*) AS failures,
           count(*) != 0 AS should_warn,
           count(*) > 100 AS should_error
    FROM viol
    """,
)
def dq_test_harness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fail_calc/warn_if/error_if harness row (B25) over the unique test."""
    viol = dq.test_unique(_t(spark, sf_dir, "lineitem"), "l_orderkey")
    return dq.run_test_harness(viol, warn_if="!= 0", error_if="> 100")[0]


@query(
    "dq_freshness_age",
    oracle="""
    SELECT max(ts) AS max_loaded_at,
           CAST(epoch_us(TIMESTAMP '2024-07-01 00:00:00')
                - epoch_us(max(ts)) AS DOUBLE) / 1000000.0 AS age_seconds
    FROM events
    """,
)
def dq_freshness_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source freshness (B29) against a fixed as-of for determinism."""
    return dq.freshness_age_seconds(
        _t(spark, sf_dir, "events"), "ts", F.lit("2024-07-01 00:00:00")
    )


# ---------------------------------------------------------------------------
# Incremental family (SURVEY §2.B.2). Target/source derived deterministically
# from orders / lineitem / events so both engines see identical fixtures.
# ---------------------------------------------------------------------------

_ORD_TGT = "SELECT * FROM orders WHERE o_orderkey % 3 != 0"
_ORD_SRC = """
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
"""


def _orders_target(spark, sf_dir):
    return _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 != 0)


def _orders_source(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )


@query(
    "incr_merge_upsert",
    oracle=f"""
    WITH tgt AS ({_ORD_TGT}), src AS ({_ORD_SRC})
    SELECT * FROM tgt WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
    UNION ALL
    SELECT * FROM src
    """,
)
def incr_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE on unique_key (B8): update-matched + insert-unmatched."""
    return incr.merge_upsert(
        _orders_target(spark, sf_dir), _orders_source(spark, sf_dir), "o_orderkey"
    )


@query(
    "incr_merge_partial_update",
    oracle=f"""
    WITH tgt AS ({_ORD_TGT}), src AS ({_ORD_SRC})
    SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice,
           t.o_orderdate, t.o_orderpriority
    FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
    UNION ALL
    SELECT * FROM src WHERE o_orderkey NOT IN (SELECT o_orderkey FROM tgt)
    """,
)
def incr_merge_partial_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with merge_update_columns=['o_totalprice'] (B8 partial update)."""
    return incr.merge_upsert(
        _orders_target(spark, sf_dir),
        _orders_source(spark, sf_dir),
        "o_orderkey",
        merge_update_columns=["o_totalprice"],
    )


@query(
    "incr_merge_append",
    oracle=f"""
    WITH tgt AS ({_ORD_TGT}), src AS ({_ORD_SRC})
    SELECT * FROM tgt UNION ALL SELECT * FROM src
    """,
)
def incr_merge_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with no unique_key → ``on FALSE`` pure append (B8)."""
    return incr.merge_upsert(
        _orders_target(spark, sf_dir), _orders_source(spark, sf_dir), None
    )


@query(
    "incr_delete_insert",
    oracle=f"""
    WITH tgt AS ({_ORD_TGT}), src AS ({_ORD_SRC})
    SELECT * FROM tgt WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
    UNION ALL
    SELECT * FROM src
    """,
)
def incr_delete_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delete+insert strategy (B11)."""
    return incr.delete_insert(
        _orders_target(spark, sf_dir), _orders_source(spark, sf_dir), "o_orderkey"
    )


_LI_SRC = """
  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
         l_quantity + 1000 AS l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM lineitem WHERE date_trunc('month', l_shipdate) = TIMESTAMP '2024-03-01'
"""


@query(
    "incr_insert_overwrite_dynamic",
    oracle=f"""
    WITH src AS ({_LI_SRC})
    SELECT * FROM lineitem
    WHERE date_trunc('month', l_shipdate) NOT IN
          (SELECT DISTINCT date_trunc('month', l_shipdate) FROM src)
    UNION ALL
    SELECT * FROM src
    """,
)
def incr_insert_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic insert_overwrite (B9/B10): partitions present in the new
    batch are replaced, others untouched."""
    li = _t(spark, sf_dir, "lineitem")
    src = li.filter(
        F.date_trunc("month", F.col("l_shipdate")) == F.lit("2024-03-01").cast("timestamp_ntz")
    ).withColumn("l_quantity", F.col("l_quantity") + 1000)
    return incr.insert_overwrite_partitions(
        li, src, F.date_trunc("month", F.col("l_shipdate"))
    )


@query(
    "incr_watermark",
    oracle="""
    SELECT * FROM events
    WHERE ts > (SELECT max(ts) FROM events WHERE ts <= TIMESTAMP '2024-01-20 00:00:00')
    """,
)
def incr_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """is_incremental() max-watermark pattern (B12/O5): the target's max(ts)
    is computed as a scalar and injected as a pushed-down filter (Catalyst
    turns it into a parquet-level predicate — storage pruning for free)."""
    ev = _t(spark, sf_dir, "events")
    target = ev.filter(F.col("ts") <= F.lit("2024-01-20 00:00:00").cast("timestamp_ntz"))
    wm = incr.max_watermark(target, "ts")
    return incr.incremental_filter(ev, "ts", wm)


# ---------------------------------------------------------------------------
# SCD2 snapshot family (SURVEY §2.B.3). customer-derived v1/v2 fixtures.
# v1 = customers with c_custkey % 7 != 0 @ 2024-01-01.
# v2 = all customers except % 11 == 0 (hard deletes), with acctbal bumped
#      where % 3 == 0 (changes); changed & new rows stamped 2024-02-01.
# ---------------------------------------------------------------------------

_CUST_COLS = "c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment"
_SNAP_V1 = f"""
  SELECT {_CUST_COLS}, TIMESTAMP '2024-01-01 00:00:00' AS updated_at
  FROM customer WHERE c_custkey % 7 != 0
"""
_SNAP_V2 = f"""
  SELECT c_custkey, c_name, c_nationkey,
         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 10.0 ELSE c_acctbal END AS c_acctbal,
         c_mktsegment,
         CASE WHEN c_custkey % 3 = 0 OR c_custkey % 7 = 0
              THEN TIMESTAMP '2024-02-01 00:00:00'
              ELSE TIMESTAMP '2024-01-01 00:00:00' END AS updated_at
  FROM customer WHERE c_custkey % 11 != 0
"""
# The oracle's scd_id hash must match functions.scd_hash with timestamps
# hashed via epoch micros (engine-portable; see operators/snapshot.py).
_ORACLE_SCD_ID = (
    "md5(concat_ws('|', coalesce(CAST(c_custkey AS VARCHAR), ''), "
    "coalesce(CAST(epoch_us(updated_at) AS VARCHAR), '')))"
)


def _snap_v1(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") % 7 != 0).withColumn(
        "updated_at", F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    )


def _snap_v2(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") % 11 != 0)
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 10.0).otherwise(
                F.col("c_acctbal")
            ),
        )
        .withColumn(
            "updated_at",
            F.when(
                (F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0),
                F.lit("2024-02-01 00:00:00"),
            )
            .otherwise(F.lit("2024-01-01 00:00:00"))
            .cast("timestamp_ntz"),
        )
    )


@query(
    "snap_first_build",
    oracle=f"""
    WITH v1 AS ({_SNAP_V1})
    SELECT *, {_ORACLE_SCD_ID} AS dbt_scd_id,
           updated_at AS dbt_updated_at,
           updated_at AS dbt_valid_from,
           CAST(NULL AS TIMESTAMP) AS dbt_valid_to
    FROM v1
    """,
)
def snap_first_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First snapshot run (B15): CTAS of the SCD2-augmented source."""
    return snap.add_scd_metadata(_snap_v1(spark, sf_dir), "c_custkey", "updated_at")


_SNAP_T1 = f"""
  SELECT *, {_ORACLE_SCD_ID} AS dbt_scd_id,
         updated_at AS dbt_updated_at,
         updated_at AS dbt_valid_from,
         CAST(NULL AS TIMESTAMP) AS dbt_valid_to
  FROM ({_SNAP_V1}) v1
"""


@query(
    "snap_changeset_timestamp",
    oracle=f"""
    WITH snapshot AS ({_SNAP_T1}), src AS ({_SNAP_V2}),
    open_rows AS (SELECT * FROM snapshot WHERE dbt_valid_to IS NULL),
    insertions AS (
      SELECT 'insert' AS dbt_change_type, s.*,
             md5(concat_ws('|', coalesce(CAST(s.c_custkey AS VARCHAR), ''),
                 coalesce(CAST(epoch_us(s.updated_at) AS VARCHAR), ''))) AS dbt_scd_id,
             s.updated_at AS dbt_updated_at, s.updated_at AS dbt_valid_from,
             CAST(NULL AS TIMESTAMP) AS dbt_valid_to
      FROM src s LEFT JOIN open_rows o ON s.c_custkey = o.c_custkey
      WHERE o.c_custkey IS NULL OR o.dbt_valid_from < s.updated_at
    ),
    updates AS (
      SELECT 'update' AS dbt_change_type,
             s.c_custkey, s.c_name, s.c_nationkey, s.c_acctbal, s.c_mktsegment,
             s.updated_at,
             o.dbt_scd_id, o.dbt_updated_at, o.dbt_valid_from,
             s.updated_at AS dbt_valid_to
      FROM src s JOIN open_rows o ON s.c_custkey = o.c_custkey
      WHERE o.dbt_valid_from < s.updated_at
    ),
    deletes AS (
      SELECT 'delete' AS dbt_change_type,
             o.c_custkey, o.c_name, o.c_nationkey, o.c_acctbal, o.c_mktsegment,
             o.updated_at,
             o.dbt_scd_id, o.dbt_updated_at, o.dbt_valid_from,
             (SELECT max(updated_at) FROM src) AS dbt_valid_to
      FROM open_rows o LEFT JOIN src s ON o.c_custkey = s.c_custkey
      WHERE s.c_custkey IS NULL
    )
    SELECT * FROM insertions UNION ALL SELECT * FROM updates
    UNION ALL SELECT * FROM deletes
    """,
)
def snap_changeset_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot staging changeset (B16) with the timestamp strategy (B17)
    and hard-delete invalidation: insertions + updates + deletes tagged
    with dbt_change_type."""
    v1 = snap.add_scd_metadata(_snap_v1(spark, sf_dir), "c_custkey", "updated_at")
    return snap.snapshot_changeset(
        _snap_v2(spark, sf_dir),
        v1,
        "c_custkey",
        "updated_at",
        snap.timestamp_strategy("updated_at"),
        invalidate_hard_deletes=True,
    )


@query(
    "snap_cycle_timestamp",
    oracle=f"""
    WITH snapshot AS ({_SNAP_T1}), src AS ({_SNAP_V2}),
    open_rows AS (SELECT * FROM snapshot WHERE dbt_valid_to IS NULL),
    closes AS (
      SELECT o.dbt_scd_id AS close_id, s.updated_at AS close_to
      FROM src s JOIN open_rows o ON s.c_custkey = o.c_custkey
      WHERE o.dbt_valid_from < s.updated_at
      UNION ALL
      SELECT o.dbt_scd_id, (SELECT max(updated_at) FROM src)
      FROM open_rows o LEFT JOIN src s ON o.c_custkey = s.c_custkey
      WHERE s.c_custkey IS NULL
    ),
    closed AS (
      SELECT sn.c_custkey, sn.c_name, sn.c_nationkey, sn.c_acctbal,
             sn.c_mktsegment, sn.updated_at, sn.dbt_scd_id, sn.dbt_updated_at,
             sn.dbt_valid_from,
             CASE WHEN c.close_id IS NOT NULL AND sn.dbt_valid_to IS NULL
                  THEN c.close_to ELSE sn.dbt_valid_to END AS dbt_valid_to
      FROM snapshot sn LEFT JOIN closes c ON sn.dbt_scd_id = c.close_id
    ),
    inserts AS (
      SELECT s.*,
             md5(concat_ws('|', coalesce(CAST(s.c_custkey AS VARCHAR), ''),
                 coalesce(CAST(epoch_us(s.updated_at) AS VARCHAR), ''))) AS dbt_scd_id,
             s.updated_at AS dbt_updated_at, s.updated_at AS dbt_valid_from,
             CAST(NULL AS TIMESTAMP) AS dbt_valid_to
      FROM src s LEFT JOIN open_rows o ON s.c_custkey = o.c_custkey
      WHERE o.c_custkey IS NULL OR o.dbt_valid_from < s.updated_at
    )
    SELECT * FROM closed UNION ALL SELECT * FROM inserts
    """,
)
def snap_cycle_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full snapshot cycle (B14): v1 build, then v2 merge — final SCD2
    history with closed rows + new versions + delete invalidations."""
    v1 = snap.add_scd_metadata(_snap_v1(spark, sf_dir), "c_custkey", "updated_at")
    return snap.snapshot_cycle(
        _snap_v2(spark, sf_dir),
        v1,
        "c_custkey",
        "updated_at",
        strategy="timestamp",
        invalidate_hard_deletes=True,
    )


@query(
    "snap_check_strategy",
    oracle=f"""
    WITH snapshot AS ({_SNAP_T1}), src AS ({_SNAP_V2}),
    open_rows AS (SELECT * FROM snapshot WHERE dbt_valid_to IS NULL)
    SELECT s.c_custkey,
           (s.c_acctbal IS DISTINCT FROM o.c_acctbal
            OR s.c_mktsegment IS DISTINCT FROM o.c_mktsegment) AS row_changed
    FROM src s JOIN open_rows o ON s.c_custkey = o.c_custkey
    """,
)
def snap_check_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The check strategy's change predicate (B18): null-safe column compare
    over tracked columns, surfaced per key for oracle verification."""
    v1 = snap.add_scd_metadata(_snap_v1(spark, sf_dir), "c_custkey", "updated_at")
    src = _snap_v2(spark, sf_dir).alias("src")
    open_rows = v1.filter(F.col("dbt_valid_to").isNull()).alias("snap")
    changed = snap.check_strategy(["c_acctbal", "c_mktsegment"])(src, open_rows)
    return src.join(
        open_rows, F.col("src.c_custkey") == F.col("snap.c_custkey"), "inner"
    ).select(F.col("src.c_custkey").alias("c_custkey"), changed.alias("row_changed"))
