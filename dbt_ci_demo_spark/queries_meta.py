"""Metadata, seed, and fingerprinting query registrations (SURVEY.md §2
B3 seeds, B26 catalog, B30 partitions; plus winnowing fingerprints from
the north-star text-analysis family).

The seed oracle is generated from the committed CSV so the two engines
read the exact same bytes; the catalog oracle uses DuckDB's
information_schema over the pre-registered fixture views.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_ci_demo_spark.operators import text as tx
from dbt_ci_demo_spark.queries import _t, query
from dbt_ci_demo_spark.sources import metadata as md

_SEED_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "seeds", "country_codes.csv")
_SEED_TYPES = {"dial_code": "int", "population_m": "double", "gdp_usd_b": "double"}

# Catalog fixture tables (every pre-registered oracle view).
_CATALOG_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _seed_values_sql() -> str:
    """Inline-VALUES oracle built from the committed CSV file — no file
    dependency on the oracle side, no drift possible on the Spark side."""
    with open(_SEED_PATH, newline="") as f:
        rows = list(csv.DictReader(f))
    values = ",\n      ".join(
        "('{code}', '{name}', {dial_code}, {population_m}, {gdp_usd_b})".format(**r)
        for r in rows
    )
    return f"""
    SELECT * FROM (VALUES
      {values}
    ) AS t(code, name, dial_code, population_m, gdp_usd_b)
    """


@query("seed_csv_typed", oracle=_seed_values_sql())
def seed_csv_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: seed CSV load — header, schema inference, per-column type
    overrides (the reference's column_types config:
    default__create_csv_table @68626). The write step (saveAsTable) is
    exercised in tests/test_runner.py; this query checks the read+cast."""
    df = (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .csv(_SEED_PATH)
    )
    for col, dtype in _SEED_TYPES.items():
        df = df.withColumn(col, F.col(col).cast(dtype))
    return df


def _catalog_oracle() -> str:
    per_table = "\n      UNION ALL\n      ".join(
        f"SELECT '{t}' AS table_name, "
        f"(SELECT count(*) FROM information_schema.columns WHERE table_name = '{t}') AS n_columns, "
        f"(SELECT count(*) FROM {t}) AS row_count"
        for t in _CATALOG_TABLES
    )
    return f"""
    SELECT table_name, n_columns, row_count FROM (
      {per_table}
    ) ORDER BY table_name
    """


@query("meta_catalog_fixture", oracle=_catalog_oracle())
def meta_catalog_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26 (bigquery__get_catalog @3102): per-relation column count + row
    count rollup, here over the fixture tables so DuckDB can mirror it
    from information_schema. Row counts are parquet-footer reads."""
    return md.fixture_catalog(spark, sf_dir, _CATALOG_TABLES)


_WINNOW_K = 8
_WINNOW_WINDOW = 4


def _winnow_oracle(src: str = "documents") -> str:
    k, w = _WINNOW_K, _WINNOW_WINDOW
    return f"""
    WITH norm AS (
      SELECT doc_id, lower(text) AS t FROM {src}
    ),
    hashed AS (
      SELECT doc_id,
             CASE WHEN length(t) >= {k}
                  THEN list_transform(range(1, length(t) - {k} + 2),
                                      i -> md5(substr(t, i::INT, {k})))
                  ELSE [] END AS h
      FROM norm
    ),
    fps AS (
      SELECT doc_id,
             CASE WHEN len(h) >= {w}
                  THEN list_distinct(list_transform(range(1, len(h) - {w} + 2),
                       j -> list_aggregate(list_slice(h, j::INT, (j + {w - 1})::INT), 'min')))
                  ELSE [] END AS f
      FROM hashed
    )
    SELECT doc_id, unnest(f) AS fingerprint FROM fps
    """


@query("text_winnowing", oracle=_winnow_oracle())
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (k=8, window=4) over documents — the
    rolling-hash document-fingerprinting entry of the text family.

    The fixture parquet is one input split; repartitioning to cluster
    parallelism before the CPU-heavy k-gram/window projection buys
    full-core execution for a text-sized exchange (on a many-file 100 TB
    table the scan already yields enough splits for this to be moot)."""
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return tx.winnow_fingerprints(docs, "text", "doc_id", k=_WINNOW_K, window=_WINNOW_WINDOW)


_CONT_CAP = 20
_CONT_MIN_SHARED = 2
_CONT_THR = 0.3

# Containment fixture: every 31st document spawns a HOST (its text with a
# doc-unique quoted passage appended) and a FRAGMENT doc that is exactly
# that passage — the short-quote-inside-long-doc shape the operator
# exists to catch. The passage embeds md5(doc_id), so its k-grams are
# globally unique: the pair's shared fingerprints have document-frequency
# 2 and SURVIVE the stop-hash cap at every scale factor (the synthetic
# corpus's own template sentences blow past the cap as the corpus grows,
# which is why un-salted fragments vanish at sf0.1).
_CONT_SRC = (
    "(SELECT doc_id, text FROM documents "
    "UNION ALL "
    "SELECT doc_id + 1000000 AS doc_id, "
    "concat(text, ' quoted passage ', md5(CAST(doc_id AS VARCHAR)), ' end') AS text "
    "FROM documents WHERE doc_id % 31 = 0 "
    "UNION ALL "
    "SELECT doc_id + 2000000 AS doc_id, "
    "concat('quoted passage ', md5(CAST(doc_id AS VARCHAR)), ' end') AS text "
    "FROM documents WHERE doc_id % 31 = 0)"
)


def _containment_oracle() -> str:
    return f"""
    WITH fps AS ({_winnow_oracle(src=_CONT_SRC)}),
    sizes AS (SELECT doc_id, count(*) AS n FROM fps GROUP BY doc_id),
    kept AS (
      SELECT fingerprint FROM fps GROUP BY fingerprint
      HAVING count(*) >= 2 AND count(*) <= {_CONT_CAP}
    ),
    r AS (SELECT f.doc_id, f.fingerprint FROM fps f JOIN kept USING (fingerprint)),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM r a JOIN r b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.id_a, p.id_b, p.shared,
           round(p.shared::DOUBLE / least(sa.n, sb.n), 6) AS containment
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.id_a
    JOIN sizes sb ON sb.doc_id = p.id_b
    WHERE p.shared >= {_CONT_MIN_SHARED}
      AND round(p.shared::DOUBLE / least(sa.n, sb.n), 6) >= {_CONT_THR}
    """


@query("dedup_containment", oracle=_containment_oracle)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment/partial-overlap candidates from shared winnowing
    fingerprints — catches a short document embedded inside a longer one,
    where MinHash resemblance stays near zero (the plagiarism-detection
    gap in symmetric near-dup). Stop-hash df-cap bounds every fingerprint
    bucket's pair fan-out (operators/dedup.containment_candidates), so
    the plan is linear in corpus size with no all-pairs stage. The
    fixture spawns, for every 31st document, a host carrying a
    doc-unique quoted passage and a fragment doc that IS that passage
    (disjoint id ranges), so genuine containment pairs exist — and must
    be recovered through the stop-hash cap — at every scale factor."""
    from dbt_ci_demo_spark.operators import dedup as dd

    base = _t(spark, sf_dir, "documents").select("doc_id", "text")
    marked = base.filter(F.col("doc_id") % 31 == 0)
    quote = F.concat(
        F.lit("quoted passage "), F.md5(F.col("doc_id").cast("string")), F.lit(" end")
    )
    hosts = marked.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" "), quote).alias("text"),
    )
    frags = marked.select(
        (F.col("doc_id") + 2000000).alias("doc_id"), quote.alias("text")
    )
    docs = base.unionByName(hosts).unionByName(frags).repartition(
        spark.sparkContext.defaultParallelism
    )
    fps = tx.winnow_fingerprints(
        docs, "text", "doc_id", k=_WINNOW_K, window=_WINNOW_WINDOW
    )
    return dd.containment_candidates(
        fps,
        "doc_id",
        max_doc_freq=_CONT_CAP,
        min_shared=_CONT_MIN_SHARED,
        min_containment=_CONT_THR,
    )


@query(
    "flagship_distinct_preagg",
    oracle="""
    SELECT name, count(*) AS repositories_number FROM (
      SELECT DISTINCT p.p_type AS name, o.o_orderkey AS repo_name
      FROM lineitem l
      JOIN part p   ON l.l_partkey = p.p_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
    ) GROUP BY name
    """,
)
def flagship_distinct_preagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship aggregation's scale formulation: pre-aggregate the
    distinct (name, repo_name) pairs (map-side partial dedup, one shuffle
    on the pair), then a cheap count per name — the exact two-phase shape
    that replaces countDistinct's expand at 100 TB. The HLL one-pass
    variant (`flagship_approx_distinct`, engine-specific estimates, so not
    oracle-comparable) is accuracy-tested against this exact result in
    tests/test_oracle_correctness.py."""
    from dbt_ci_demo_spark.queries import repo_languages

    rl = repo_languages(spark, sf_dir)
    pairs = (
        rl.select("repo_name", F.explode("language").alias("lang"))
        .select(F.col("lang.name").alias("name"), "repo_name")
        .distinct()
    )
    return pairs.groupBy("name").agg(F.count(F.lit(1)).alias("repositories_number"))


def flagship_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship aggregation with approx_count_distinct — the
    documented 100 TB variant (SURVEY §7.5): one pass, no exact-distinct
    expand, HLL merge instead of a distinct shuffle. Not registered (HLL
    estimates are engine-specific by construction); its accuracy bound vs
    the exact formulation is pinned in pytest."""
    from dbt_ci_demo_spark.queries import repo_languages

    rl = repo_languages(spark, sf_dir)
    return (
        rl.select("repo_name", F.explode("language").alias("lang"))
        .groupBy(F.col("lang.name").alias("name"))
        .agg(F.approx_count_distinct("repo_name").alias("repositories_number_approx"))
    )


@query(
    "meta_content_digest",
    oracle="""
    WITH ofld AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS f1, CAST(o_custkey AS VARCHAR) AS f2,
             o_orderstatus AS f3,
             CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR) AS f4,
             strftime(o_orderdate, '%Y-%m-%d') AS f5, o_orderpriority AS f6
      FROM orders
    ),
    oh AS (
      SELECT ('0x' || substr(md5(concat_ws('|',
               CAST(length(f1) AS VARCHAR) || ':' || f1,
               CAST(length(f2) AS VARCHAR) || ':' || f2,
               CAST(length(f3) AS VARCHAR) || ':' || f3,
               CAST(length(f4) AS VARCHAR) || ':' || f4,
               CAST(length(f5) AS VARCHAR) || ':' || f5,
               CAST(length(f6) AS VARCHAR) || ':' || f6)),
             1, 8))::BIGINT AS h
      FROM ofld
    ),
    nfld AS (
      SELECT CAST(n_nationkey AS VARCHAR) AS f1, n_name AS f2,
             CAST(n_regionkey AS VARCHAR) AS f3
      FROM nation
    ),
    nh AS (
      SELECT ('0x' || substr(md5(concat_ws('|',
               CAST(length(f1) AS VARCHAR) || ':' || f1,
               CAST(length(f2) AS VARCHAR) || ':' || f2,
               CAST(length(f3) AS VARCHAR) || ':' || f3)), 1, 8))::BIGINT AS h
      FROM nfld
    )
    SELECT 'orders' AS table_name, count(*) AS n_rows,
           CAST(SUM(h) AS BIGINT) AS content_digest_sum
    FROM oh
    UNION ALL
    SELECT 'nation', count(*), CAST(SUM(h) AS BIGINT) FROM nh
    """,
)
def meta_content_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset content versioning (sources/metadata.content_digest): an
    order-independent digest per table — per-row md5 summed — the DATA
    analog of checksum-based `state:modified`: runs diff digests to
    detect silent upstream drift without comparing tables (any changed,
    inserted, or deleted row moves the sum; repartitioning does not).
    Doubles enter via an exact cents projection and dates via an
    explicit format string, so the payload renders byte-identically in
    both engines. One scan + a 1-row aggregate per table; the decimal
    accumulator cannot overflow at any corpus size (final cast to
    BIGINT is safe through ~2·10⁹ rows and exists for driver-hash
    comparability)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        "o_orderpriority",
    )
    n = _t(spark, sf_dir, "nation")
    d_o = md.content_digest(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "cents", "odate", "o_orderpriority"]
    ).select(
        F.lit("orders").alias("table_name"),
        "n_rows",
        F.col("content_digest_sum").cast("long").alias("content_digest_sum"),
    )
    d_n = md.content_digest(n, ["n_nationkey", "n_name", "n_regionkey"]).select(
        F.lit("nation").alias("table_name"),
        "n_rows",
        F.col("content_digest_sum").cast("long").alias("content_digest_sum"),
    )
    return d_o.unionByName(d_n)
