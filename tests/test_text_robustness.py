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


def test_badwords_case_empty_and_url_whitespace(spark):
    """r10 review findings: (a) uppercase blocklist entries are
    lowercased before compiling (they silently never matched the
    lowered text); (b) an EMPTY blocklist keeps everything (the naive
    compile produced \\b()\\b, matching at every word boundary and
    dropping the whole corpus); (c) a URL terminated by newline/tab no
    longer swallows the following text into the 'domain'."""
    docs = spark.createDataFrame(
        [
            (1, "contains spamword here"),
            (2, "clean text https://example.com\nmore text"),
            (3, "tab case https://tab.example.com\tafter-tab"),
        ],
        "doc_id bigint, text string",
    )
    up = tx.badword_filter(docs, "text", "doc_id", words=("SPAMWORD",))
    assert {r.doc_id: r.keep for r in up.collect()} == {1: False, 2: True, 3: True}
    empty = tx.badword_filter(docs, "text", "doc_id", words=())
    assert all(r.keep and r.n_badwords == 0 for r in empty.collect())
    doms = {r.domain for r in tx.url_domains(docs, "text", "doc_id").collect()}
    assert doms == {"example.com", "tab.example.com"}, doms


def test_catalog_ignores_temp_views_and_digest_separator_shift(spark, tmp_path):
    """r10 review findings: (a) get_catalog excludes session temp views
    with the list_relations namespace filter — one temp view anywhere in
    the session (e.g. a streaming memory sink) crashed the whole rollup
    with TABLE_OR_VIEW_NOT_FOUND; (b) content_digest's length-prefixed
    payload distinguishes rows that shift a separator character across a
    field boundary ('a|b','c' vs 'a','b|c' hashed identically before)."""
    from dbt_ci_demo_spark.sources import metadata as md

    db = "cat_tmpview_db"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    try:
        spark.createDataFrame([(1,)], "k int").write.mode("overwrite").saveAsTable(
            f"{db}.t1"
        )
        spark.createDataFrame([(9,)], "x int").createOrReplaceTempView("a_temp_view")
        cat = md.get_catalog(spark, db)
        names = {r.table_name for r in cat.collect()}
        assert "t1" in names and "a_temp_view" not in names
    finally:
        spark.catalog.dropTempView("a_temp_view")
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    d1 = spark.createDataFrame([("a|b", "c")], "x string, y string")
    d2 = spark.createDataFrame([("a", "b|c")], "x string, y string")
    h1 = md.content_digest(d1, ["x", "y"]).first()["content_digest_sum"]
    h2 = md.content_digest(d2, ["x", "y"]).first()["content_digest_sum"]
    assert h1 != h2
    # r13 review finding: NULL renders as the impossible length "-1:" —
    # the old string sentinel ("\x00null") collided with a value
    # literally equal to it, giving two different tables one digest.
    d3 = spark.createDataFrame([(None, "c")], "x string, y string")
    d4 = spark.createDataFrame([("\x00null", "c")], "x string, y string")
    h3 = md.content_digest(d3, ["x", "y"]).first()["content_digest_sum"]
    h4 = md.content_digest(d4, ["x", "y"]).first()["content_digest_sum"]
    assert h3 != h4
    # ...and NULL stays distinguishable from the empty string
    d5 = spark.createDataFrame([("", "c")], "x string, y string")
    h5 = md.content_digest(d5, ["x", "y"]).first()["content_digest_sum"]
    assert h3 != h5
