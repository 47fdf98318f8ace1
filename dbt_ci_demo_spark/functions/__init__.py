from dbt_ci_demo_spark.functions.bq_compat import (  # noqa: F401
    array_agg_ordered,
    exact_avg,
    exact_sum,
    range_bucket,
    scd_hash,
    select_except,
    typed_null,
)
