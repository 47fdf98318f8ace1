"""Catalog / metadata introspection operators (SURVEY.md §2.B.5).

The reference's metadata surface is SQL over BigQuery system tables:
- ``bigquery__get_catalog`` (manifest.json:1@3102, 208 LoC): per-relation
  stats (row_count, size_bytes) joined to column metadata from
  INFORMATION_SCHEMA, with date-shard detection via regexp.
- ``bigquery__list_relations_without_caching`` @22342 /
  ``default__list_schemas`` @186522 / ``bigquery__check_schema_exists``
  @25096: namespace listing (B28).
- ``get_partitions_metadata`` @12518: partition listing (B30).

Spark-side these are catalog-API + DESCRIBE calls — driver-side metadata
ops over O(tables) rows, never over data. Row counts come from catalog
statistics when present and fall back to a distributed ``count()`` (the
only data-touching path, itself a metadata-only parquet footer read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("table_database", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("table_type", T.StringType()),
        T.StructField("n_columns", T.LongType()),
        T.StructField("row_count", T.LongType()),
    ]
)

COLUMNS_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType()),
        T.StructField("column_name", T.StringType()),
        T.StructField("column_index", T.LongType()),
        T.StructField("data_type", T.StringType()),
    ]
)


def list_schemas(spark: SparkSession) -> list[str]:
    """B28: ``default__list_schemas`` — all databases in the catalog."""
    return [d.name for d in spark.catalog.listDatabases()]


def schema_exists(spark: SparkSession, database: str) -> bool:
    """B28: ``bigquery__check_schema_exists``."""
    return spark.catalog.databaseExists(database)


def list_relations(spark: SparkSession, database: str) -> DataFrame:
    """B28: ``bigquery__list_relations_without_caching`` — one row per
    relation with its type (table/view)."""
    rows = [
        (database, t.name, "view" if t.tableType == "VIEW" else "table")
        for t in spark.catalog.listTables(database)
        # listTables also surfaces session temp views (namespace-less);
        # BigQuery's list_relations is dataset-scoped, so keep only real
        # catalog relations of this database.
        if t.namespace == [database]
    ]
    return spark.createDataFrame(
        rows, "table_database string, table_name string, table_type string"
    )


def columns_in_relation(spark: SparkSession, qualified: str) -> DataFrame:
    """B27-adjacent: column name/type/ordinal for one relation (the
    INFORMATION_SCHEMA.COLUMNS slice of bigquery__get_catalog)."""
    name = qualified.split(".")[-1]
    fields = spark.table(qualified).schema.fields
    rows = [(name, f.name, i, f.dataType.simpleString()) for i, f in enumerate(fields)]
    return spark.createDataFrame(rows, COLUMNS_SCHEMA)


def get_catalog(spark: SparkSession, database: str) -> DataFrame:
    """B26: the get_catalog rollup — one row per relation with column count
    and row count. Lazy schema access gives n_columns for free; row_count
    is a parquet-footer count for tables (no row materialization) — a
    VIEW's count executes the view's plan, the same cost dbt's catalog
    query pays against a view. Session temp views are excluded with the
    same namespace filter as :func:`list_relations` (r10 review finding:
    they are namespace-less, so resolving ``db.name`` for one raised
    TABLE_OR_VIEW_NOT_FOUND and crashed the whole rollup whenever the
    session held any temp view — e.g. a streaming memory sink)."""
    rows = []
    for t in spark.catalog.listTables(database):
        if t.namespace != [database]:
            continue
        q = f"`{database}`.`{t.name}`"
        df = spark.table(q)
        is_view = t.tableType == "VIEW"
        rows.append(
            (
                database,
                t.name,
                "view" if is_view else "table",
                len(df.schema.fields),
                df.count(),
            )
        )
    return spark.createDataFrame(rows, CATALOG_SCHEMA)


def partitions_metadata(spark: SparkSession, qualified: str) -> DataFrame:
    """B30: ``get_partitions_metadata`` — SHOW PARTITIONS as a DataFrame
    (one row per partition directory of a hive-partitioned table)."""
    return spark.sql(f"SHOW PARTITIONS {qualified}")


def fixture_catalog(spark: SparkSession, sf_dir: str, tables: list[str]) -> DataFrame:
    """The oracle-checkable form of B26 over the parquet fixtures: schema
    from lazy analysis, row_count from footer-only count — the same rollup
    get_catalog performs over the warehouse, addressed by path."""
    from dbt_ci_demo_spark.sources.catalog import load_table

    rows = []
    for name in tables:
        df = load_table(spark, sf_dir, name)
        rows.append((name, len(df.schema.fields), df.count()))
    return spark.createDataFrame(
        rows, "table_name string, n_columns long, row_count long"
    ).orderBy("table_name")


def content_digest(df: DataFrame, columns: list[str]) -> DataFrame:
    """Order-independent, engine-exact content digest of a DataFrame:
    per row, md5 over the LENGTH-PREFIXED '|'-joined column values
    (``len:value`` per field — without the prefix the payload is
    ambiguous when a value contains the separator: ('a|b','c') and
    ('a','b|c') both rendered 'a|b|c', so a change shifting a '|'
    across a field boundary was invisible, r10 review finding; NULL
    renders as the impossible length ``-1:`` — no real value has a
    negative length, so NULL is unambiguous, unlike the previous
    string sentinel which collided with a value literally equal to it,
    r13 review finding), the first 8 hex chars as a 32-bit integer,
    summed in decimal. Any row change, insert, or delete moves the digest; row
    ORDER and partitioning do not (sum is commutative) — which is what
    makes this the DATA analog of the checksum-based `state:modified`
    selection: pipelines diff digests across runs to detect silent
    upstream drift without comparing tables. One scan + a 1-row
    aggregate at any scale.

    Returns a 1-row DataFrame (n_rows, content_digest_sum).
    """

    def lp(c: str):
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("-1:")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s)
        )

    payload = F.concat_ws("|", *[lp(c) for c in columns])
    h = F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h.cast("decimal(38,0)")).cast("decimal(38,0)").alias("content_digest_sum"),
    )
