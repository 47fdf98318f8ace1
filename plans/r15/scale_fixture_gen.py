"""Deterministic 4x inflation of sf0.1 into /tmp/sfx0.4 (scale-evidence
fixture, r15 VERDICT task 7 — /root/testdata is read-only and has no
generator). Each table is 4 shifted copies; shifts are ==0 mod 50 and
far below the 1M dup-offset so every %-derived fixture keeps its
selectivity; TPC-H keys shift consistently so join structure replicates."""
import sys
sys.path.insert(0, "/root/repo")
from dbt_ci_demo_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("gen-scale")
src = "/root/testdata/sf0.1"
dst = "/tmp/sfx0.4"
N = 4

def rep(df, shifts):  # shifts: {col: per-replica-offset}
    parts = []
    for i in range(N):
        p = df
        for c, off in shifts.items():
            p = p.withColumn(c, (F.col(c) + F.lit(i * off)).cast(df.schema[c].dataType))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

T = {
  "documents": {"doc_id": 100_000},
  "embeddings": {"vec_id": 100_000},
  "lineitem": {"l_orderkey": 10_000_000, "l_suppkey": 100_000, "l_partkey": 1_000_000},
  "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
  "customer": {"c_custkey": 1_000_000},
  "supplier": {"s_suppkey": 100_000},
  "part": {"p_partkey": 1_000_000},
  "events": {"event_id": 100_000_000, "user_id": 1_000_000},
}
import os
os.makedirs(dst, exist_ok=True)
for name in ["region", "nation"]:
    spark.read.parquet(f"{src}/{name}.parquet").write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
for name, shifts in T.items():
    df = spark.read.parquet(f"{src}/{name}.parquet")
    missing = [c for c in shifts if c not in df.columns]
    assert not missing, (name, missing)
    rep(df, shifts).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
    print(name, "rows:", spark.read.parquet(f"{dst}/{name}.parquet").count())
# sanity: doc_id ranges
d = spark.read.parquet(f"{dst}/documents.parquet")
print("doc_id min/max:", d.agg(F.min("doc_id"), F.max("doc_id")).first())
spark.stop()
