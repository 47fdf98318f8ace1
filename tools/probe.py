"""Isolated fresh-JVM query probe — the adjudication tool for bench
risers (SCALE.md discipline: probe-before-believe).

Config parity (r07 lesson): uses the engine session
(dbt_ci_demo_spark.session.get_spark — local[32], shuffle 32, AQE,
checkpoint dir), NEVER a hand-rolled builder. Rebuild parity (r08
lesson): the DataFrame is rebuilt every pass, so lazily-materialized
pins/caches can't make later passes read artificially low.

    python tools/probe.py <query> [sf_dir]     # warm-3 / min-of-5
    python tools/probe.py q1_pricing_summary   # the canary normalizer

Prints one JSON line: {"query": ..., "min5": ..., "passes": [...]}.
Run each probe in its own process (one query per invocation) so every
number is a fresh-JVM reading.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: python tools/probe.py <query> [sf_dir]")
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import bench

    from dbt_ci_demo_spark.queries import registry_queries
    from dbt_ci_demo_spark.session import get_spark
    # Overlay the bench's own rows/overrides so a probe measures the SAME
    # composition the bench row did — e.g. stream_late_data_accounting is
    # the pipeline-only override (pre-built feed), not the registered
    # fixture-write+pipeline composition, and the xxhash64/star-chain
    # bench-only rows resolve at all.
    overrides, warm_late_feed = bench._bench_only()
    regs = {**registry_queries(), **overrides}
    if name not in regs:
        sys.exit(
            f"unknown query {name!r}; valid names are the registered "
            "queries plus bench-only rows (see bench.py HEADLINE)"
        )
    spark = get_spark(f"probe-{name}")
    fn = regs[name]
    if name in ("stream_late_data_accounting", "stream_session_late_accounting"):
        warm_late_feed(spark, sf_dir)  # untimed, as in bench.main()

    def run() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for _ in range(3):
        run()
    passes = [round(run(), 4) for _ in range(5)]
    print(json.dumps({"query": name, "min5": min(passes), "passes": passes}))


if __name__ == "__main__":
    main()
