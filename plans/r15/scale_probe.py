"""Scale-evidence probe (r15 task 7): warm-1/min-of-2 per query over the
4x fixture, one JSON line per query. argv: <repo_root> <label>"""
import json, os, sys, time
root, label = sys.argv[1], sys.argv[2]
sys.path.insert(0, root)
sf_dir = "/tmp/sfx0.4"
from dbt_ci_demo_spark.session import get_spark
from dbt_ci_demo_spark.queries import registry_queries
spark = get_spark(f"scale-{label}")
regs = registry_queries()
import importlib
benchmod = importlib.import_module("bench")
overrides, _ = benchmod._bench_only()
regs = {**regs, **overrides}
QUERIES = ["q21_sole_late_supplier", "text_unigram_logprob", "text_ccnet_buckets",
           "pipe_budgeted_curation", "pipe_curation_end_to_end",
           "dedup_minhash_lsh", "dedup_simhash_xxhash64"]
# one warm pass of q1 for JVM/codegen
for _ in range(2):
    regs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
out = {}
for name in QUERIES:
    def run():
        t0 = time.perf_counter()
        regs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    run()  # warm
    out[name] = round(min(run(), run()), 3)
    print(json.dumps({"label": label, "query": name, "min2": out[name]}), flush=True)
print(json.dumps({"label": label, "all": out}))
spark.stop()
