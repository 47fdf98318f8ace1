"""Dump the physical plan of the minhash candidate-pair band self-join
(plans/r14 evidence: the signature subtree duplication before/after the
band-table pin)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_ci_demo_spark.operators import dedup as dd
from dbt_ci_demo_spark.session import get_spark
from dbt_ci_demo_spark.queries_northstar import (
    _MINHASH_BANDS,
    _MINHASH_K,
    _MINHASH_N,
    _docs_dup,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dump-minhash-plan")
    docs = _docs_dup(spark, sf_dir)
    sh = dd.word_shingles(docs, "text", "doc_id", _MINHASH_K).persist()
    sig = dd.minhash_signatures(sh, "doc_id", _MINHASH_N, "md5")
    if hasattr(dd, "lsh_pairs_from_buckets"):
        banded = dd.banded_buckets(
            sig, "doc_id", _MINHASH_N, _MINHASH_BANDS, "md5"
        ).persist()
        cand = dd.lsh_pairs_from_buckets(banded, "doc_id")
    else:
        cand = dd.lsh_candidate_pairs(sig, "doc_id", _MINHASH_N, _MINHASH_BANDS, "md5")
    print("---- candidate pairs (the band self-join) ----")
    print(
        cand._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )


if __name__ == "__main__":
    main()
