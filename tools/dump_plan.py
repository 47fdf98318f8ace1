"""Dump the explain("formatted") physical plan of one registered query.

    python tools/dump_plan.py <query> [sf_dir]

Companion to tools/probe.py (plans/r14 evidence capture). One query per
invocation; the plan goes to stdout, everything else to stderr."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: python tools/dump_plan.py <query> [sf_dir]")
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import bench

    from dbt_ci_demo_spark.queries import registry_queries
    from dbt_ci_demo_spark.session import get_spark

    overrides, _ = bench._bench_only()
    regs = {**registry_queries(), **overrides}
    if name not in regs:
        sys.exit(f"unknown query {name!r}")
    spark = get_spark(f"dump-plan-{name}")
    df = regs[name](spark, sf_dir)
    print(
        df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )


if __name__ == "__main__":
    main()
