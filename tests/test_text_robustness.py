"""Null / degenerate / unicode text robustness: a 100 TB crawl corpus
contains NULL text (failed fetches), empty and whitespace-only
documents, emoji/CJK, and pathological single-token blobs. Per-row
metric operators must emit a row per input (never raise, never
silently drop); shingle-shaped operators drop shingle-less docs by
construction (documented) but must not error."""

from __future__ import annotations

import pyspark.sql.functions as F

from dbt_ci_demo_spark.operators import dedup as dd
from dbt_ci_demo_spark.operators import text as tx

ROWS = [
    (1, None),
    (2, ""),
    (3, "   \n\t  "),
    (4, "🦆 emoji only 🦆🦆"),
    (5, "漢字テキストと English mixed"),
    (6, "x" * 5000),  # one pathological 5k-char token
    (7, "a normal english sentence with several plain words."),
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id bigint, text string")


def test_per_row_text_ops_emit_row_per_input(spark):
    docs = _docs(spark)
    n = len(ROWS)
    for fn in (
        tx.text_stats,
        tx.language_id,
        tx.redact_pii,
        tx.repetition_metrics,
        tx.fingerprint,
        tx.gopher_rules,
    ):
        out = fn(docs, "text", "doc_id")
        assert out.count() == n, fn.__name__
        assert out.filter(F.col("doc_id").isNull()).count() == 0, fn.__name__


def test_scalar_token_counts_null_and_degenerate(spark):
    docs = _docs(spark)
    out = docs.select(
        "doc_id",
        tx.token_count(F.col("text")).alias("tc"),
        tx.bpe_ish_token_count(F.col("text")).alias("btc"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # null text must not produce a phantom positive count
    assert (by_id[1].tc or 0) == 0 and (by_id[1].btc or 0) == 0
    assert by_id[7].tc >= 7


def test_shingle_ops_tolerate_degenerate_docs(spark):
    docs = _docs(spark)
    # no near-dup pairs among these; must complete without error
    assert dd.minhash_near_duplicates(docs, "text", "doc_id").count() == 0
    assert dd.simhash_near_duplicates(docs, "text", "doc_id").count() == 0
    assert dd.exact_duplicates(docs, "text", "doc_id").count() == 0


def test_line_dedup_and_chunks_degenerate(spark):
    docs = _docs(spark)
    cleaned = tx.remove_duplicate_lines(docs, "text", "doc_id")
    assert cleaned.count() <= len(ROWS)
    chunks = tx.sentence_chunks(docs, "text", "doc_id")
    # only docs with usable sentences produce chunks; none may error
    assert chunks.filter(F.col("doc_id") == 7).count() >= 1


def test_badwords_and_urls_degenerate(spark):
    docs = _docs(spark)
    flagged = tx.badword_filter(docs, "text", "doc_id", ["emoji"])
    assert {r.doc_id for r in flagged.filter(~F.col("keep")).collect()} == {4}
    doms = tx.url_domains(docs, "text", "doc_id")
    assert doms.count() == 0  # no URLs anywhere, no errors
