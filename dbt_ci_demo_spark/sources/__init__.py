from dbt_ci_demo_spark.sources.catalog import (  # noqa: F401
    TABLES,
    SourceCatalog,
    load_table,
    register_views,
)
