"""Tests for the metadata/introspection surface (B26/B28/B30) and the
date-sharded writer (B5) — engine-state operators the oracle gate can't
cover because they require a live warehouse."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dbt_ci_demo_spark.operators.materialize import Warehouse
from dbt_ci_demo_spark.sources import metadata as md
from dbt_ci_demo_spark.sources.catalog import load_table


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, f"meta_{tmp_path.name.lower()}", location=str(tmp_path / "wh"))
    yield w
    w.drop_database()


def test_list_relations_and_schema_exists(spark, sf_dir, wh):
    assert md.schema_exists(spark, wh.database)
    assert not md.schema_exists(spark, "no_such_db_xyz")
    assert wh.database in md.list_schemas(spark)

    wh.write_table(load_table(spark, sf_dir, "region"), "t_region")
    wh.create_view("v_region", sql=f"SELECT * FROM {wh.qualified('t_region')}")
    rels = {(r.table_name, r.table_type) for r in md.list_relations(spark, wh.database).collect()}
    assert ("t_region", "table") in rels
    assert ("v_region", "view") in rels


def test_get_catalog_and_columns(spark, sf_dir, wh):
    region = load_table(spark, sf_dir, "region")
    wh.write_table(region, "t_region")
    cat = {r.table_name: r for r in md.get_catalog(spark, wh.database).collect()}
    assert cat["t_region"].row_count == region.count()
    assert cat["t_region"].n_columns == len(region.columns)

    cols = md.columns_in_relation(spark, wh.qualified("t_region")).collect()
    assert [c.column_name for c in cols] == region.columns
    assert all(c.data_type for c in cols)


def test_partitions_metadata(spark, sf_dir, wh):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "ds", F.date_format("o_orderdate", "yyyy-MM")
    )
    wh.write_table(orders, "orders_p", partition_by="ds")
    parts = md.partitions_metadata(spark, wh.qualified("orders_p")).collect()
    n_expected = orders.select("ds").distinct().count()
    assert len(parts) == n_expected


def test_date_sharded_writer(spark, sf_dir, wh):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "day", F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    days = sorted(r.day for r in orders.select("day").distinct().limit(3).collect())

    def for_date(ds):
        return orders.filter(F.col("day") == ds).drop("day")

    wh.write_date_partitions(for_date, "orders_sharded", days)
    got = wh.read("orders_sharded")
    assert {r.ds for r in got.select("ds").distinct().collect()} == set(days)
    assert got.count() == orders.filter(F.col("day").isin(days)).count()

    # Re-write one shard: dynamic overwrite must replace, not append.
    wh.write_date_partitions(for_date, "orders_sharded", days[:1])
    assert got.count() == orders.filter(F.col("day").isin(days)).count()
