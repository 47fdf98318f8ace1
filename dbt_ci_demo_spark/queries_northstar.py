"""North-star query registrations: dedup, similarity search, text analysis
(driver BASELINE.json extensions; SURVEY.md §7.4).

The MinHash/SimHash/LSH oracles replicate the *exact same* md5-derived
signatures in DuckDB SQL (generated programmatically below from the same
parameters), so candidate generation matches bit-for-bit — the correctness
gate covers the approximate pipeline end-to-end, not just its exact
verifier stage.

Duplicate injection: the fixture corpus has no planted duplicates, so
near-dup queries derive a dup-injected corpus deterministically (append
perturbed copies of every 25th document / 20th vector) identically in both
engines.
"""

from __future__ import annotations

import atexit
import glob
import hashlib
import os
import shutil
import tempfile
import uuid
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_ci_demo_spark.operators import dedup as dd
from dbt_ci_demo_spark.operators import similarity as sim
from dbt_ci_demo_spark.operators import text as tx
from dbt_ci_demo_spark.queries import _t, query

# ---------------------------------------------------------------------------
# Shared derived fixtures
# ---------------------------------------------------------------------------


def _docs_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select("doc_id", "text")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents table spread across the cluster before CPU-heavy text
    expressions. The fixture parquet is one row group (one input split);
    the repartition is a tiny exchange that buys full-core parallelism for
    the md5/regex projections. On a real multi-file 100 TB table the scan
    already yields many splits and this is a cheap no-op-sized shuffle."""
    par = spark.sparkContext.defaultParallelism
    return _docs_raw(spark, sf_dir).repartition(par)

_DOCS_DUP = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' near duplicate trailing marker' AS text
  FROM documents WHERE doc_id % 25 = 0
"""


def _docs_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Union BEFORE the parallelism repartition: one exchange over the
    # combined corpus instead of two, and downstream stages see
    # defaultParallelism partitions rather than the union's 2× that —
    # halves per-stage task count through the whole minhash pipeline.
    d = _docs_raw(spark, sf_dir)
    dups = (
        d.filter(F.col("doc_id") % 25 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" near duplicate trailing marker")).alias("text"),
        )
    )
    return d.unionByName(dups).repartition(spark.sparkContext.defaultParallelism)


_DOCS_EXACT_DUP = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0
"""


def _docs_exact_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_raw(spark, sf_dir)
    return d.unionByName(
        d.filter(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    ).repartition(spark.sparkContext.defaultParallelism)


# ---------------------------------------------------------------------------
# Exact dedup + fingerprint
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_groups",
    oracle=f"""
    WITH docs AS ({_DOCS_EXACT_DUP})
    SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM docs GROUP BY md5(text) HAVING count(*) > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content duplicate groups over a dup-injected corpus."""
    return dd.exact_duplicates(_docs_exact_dup(spark, sf_dir), "text", "doc_id")


@query(
    "dedup_exact_survivors",
    oracle=f"""
    WITH docs AS ({_DOCS_EXACT_DUP}),
    keep AS (SELECT min(doc_id) AS doc_id FROM docs GROUP BY md5(text))
    SELECT d.doc_id, d.text FROM docs d JOIN keep k ON d.doc_id = k.doc_id
    """,
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows surviving exact dedup (min doc_id per content hash)."""
    return dd.dedup_keep_first(_docs_exact_dup(spark, sf_dir), "text", "doc_id")


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH docs AS ({_DOCS_DUP}),
    toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM docs
    ),
    grams AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], chr(31)) AS g
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) s
      WHERE len(t) >= 8
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    marked AS (SELECT gr.doc_id, gr.pos FROM grams gr JOIN dup USING (g)),
    islands AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev IS NOT NULL AND pos - prev <= 8
                      THEN 0 ELSE 1 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS isl
      FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM marked)
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 7 AS BIGINT) AS span_end,
           CAST(max(pos) - min(pos) + 8 AS BIGINT) AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_dup_grams
    FROM islands GROUP BY doc_id, isl
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SUBSTRING dedup (Lee et al. 2022 suffix-array family,
    distributed as duplicated k-gram span extraction — the dedup family
    the doc-level operators don't cover: splice-out removal intervals,
    not whole-doc drops). Over the trailing-marker dup-injected corpus
    the copies share every token but the appended marker, so the span
    boundary math is exercised exactly: the copy's maximal span must END
    at the last shared token, excluding the marker; the raw corpus also
    contributes organic duplicated 8-gram runs. The oracle keys
    duplicate detection on the k-token gram STRING while the operator
    keys on its xxhash64 (the `remove_duplicate_lines` discipline), so
    the match also certifies collision-free hashing on this corpus."""
    return dd.duplicated_ngram_spans(
        _docs_dup(spark, sf_dir), "text", "doc_id", k=8
    )


@query(
    "dedup_substring_splice",
    oracle=f"""
    WITH docs AS ({_DOCS_DUP}),
    toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM docs
    ),
    grams AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], chr(31)) AS g
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) s
      WHERE len(t) >= 8
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    marked AS (SELECT gr.doc_id, gr.pos FROM grams gr JOIN dup USING (g)),
    islands AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev IS NOT NULL AND pos - prev <= 8
                      THEN 0 ELSE 1 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS isl
      FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM marked)
    ),
    spans AS (
      SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end
      FROM islands GROUP BY doc_id, isl
    ),
    tok_rows AS (
      SELECT doc_id, i - 1 AS pos, t[i] AS tok
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) s
    ),
    removed AS (
      SELECT tr.doc_id, tr.pos FROM tok_rows tr JOIN spans sp
        ON tr.doc_id = sp.doc_id
       AND tr.pos BETWEEN sp.span_start AND sp.span_end
      GROUP BY tr.doc_id, tr.pos
    ),
    kept AS (
      SELECT tr.doc_id, tr.pos, tr.tok
      FROM tok_rows tr LEFT JOIN removed r
        ON tr.doc_id = r.doc_id AND tr.pos = r.pos
      WHERE r.pos IS NULL
    ),
    agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_spliced,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(a.text_spliced, '') AS text_spliced,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(len(t.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
    FROM toks t LEFT JOIN agg a USING (doc_id)
    """,
)
def dedup_substring_splice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-substring dedup family END-TO-END (r11, VERDICT r10 #7's
    named candidate): detect duplicated spans (`duplicated_ngram_spans`,
    the registered detection row's exact pipeline) and SPLICE them out of
    every document (`remove_spans`), value-checking the CUT DOCUMENTS
    themselves — the surface the detection-only row leaves to pytest
    brute-force equality. Row-preserving over the dup-injected corpus:
    every doc comes back with its reassembled survivor text (single-space
    joins, the documented token-splice normalization), its token count,
    and how many tokens the spans removed; a fully-duplicated doc
    survives with empty text (the caller's drop decision), docs without
    duplicated spans pass through with n_removed = 0.

    Plan: the detection pipeline's three shuffles plus ONE doc-keyed join
    of the (output-proportional) span table back onto the corpus; the
    splice itself is a pure array expression (filter-with-index + exists
    over each doc's bounded interval list) — zero additional shuffles, no
    corpus token explode (the oracle's tok_rows explode is the DuckDB
    replay, not the Spark plan). The oracle derives the spans from the
    gram STRING (certifying the operator's xxhash64 keying collision-free
    again) and splices with an independent formulation (position
    anti-join + ordered string_agg), so the match is two independent
    implementations of the whole detect->cut recipe."""
    docs = _docs_dup(spark, sf_dir)
    spans = dd.duplicated_ngram_spans(docs, "text", "doc_id", k=8)
    return dd.remove_spans(docs, spans, "text", "doc_id")


@query(
    "text_repetition",
    oracle="""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000, repeat('buy now ', 50)
      FROM documents WHERE doc_id % 50 = 0
    ),
    base AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS t
      FROM docs
    ),
    arrstats AS (
      SELECT doc_id,
             len(bg) AS n_big, len(list_distinct(bg)) AS n_big_d,
             len(lines) AS n_lines, len(list_distinct(lines)) AS n_lines_d
      FROM (
        SELECT doc_id,
               CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                    ELSE [] END AS bg,
               string_split(text, chr(10)) AS lines
        FROM base)
    ),
    tokstats AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
             count(*) AS n_tok_d, CAST(MAX(c) AS BIGINT) AS top_c
      FROM (SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(t) AS tok FROM base)
            GROUP BY doc_id, tok)
      GROUP BY doc_id
    ),
    scored AS (
      SELECT a.doc_id,
             coalesce(n_tok, 0) AS n_tokens,
             round(CASE WHEN coalesce(n_tok, 0) > 0
                        THEN coalesce(n_tok_d, 0)::DOUBLE / n_tok ELSE 0.0 END, 6)
               AS distinct_token_ratio,
             round(CASE WHEN coalesce(n_tok, 0) > 0
                        THEN coalesce(top_c, 0)::DOUBLE / n_tok ELSE 0.0 END, 6)
               AS top_token_ratio,
             round(1.0 - CASE WHEN n_big > 0
                              THEN n_big_d::DOUBLE / n_big ELSE 1.0 END, 6)
               AS dup_bigram_ratio,
             round(1.0 - CASE WHEN n_lines > 0
                              THEN n_lines_d::DOUBLE / n_lines ELSE 1.0 END, 6)
               AS dup_line_ratio
      FROM arrstats a LEFT JOIN tokstats USING (doc_id)
    )
    SELECT *,
           (top_token_ratio > 0.2 OR dup_bigram_ratio > 0.2
            OR dup_line_ratio > 0.3) AS is_repetitive
    FROM scored
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (operators/text.repetition_metrics)
    over the corpus plus seeded boilerplate docs ('buy now ' × 50, ids
    +2000000) that must flag is_repetitive — the signals that catch spam
    which length/stopword heuristics miss."""
    d = _docs(spark, sf_dir)
    spam = d.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.expr("repeat('buy now ', 50)").alias("text"),
    )
    return tx.repetition_metrics(
        d.select("doc_id", "text").unionByName(spam), "text", "doc_id"
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g'))) AS fingerprint,
           length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                      ' +', ' ', 'g'))) AS normalized_len
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.fingerprint(_docs(spark, sf_dir), "text", "doc_id")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup — oracle generated from the same parameters
# ---------------------------------------------------------------------------

_MINHASH_N = 32
_MINHASH_BANDS = 8
_MINHASH_K = 3
_MINHASH_THRESHOLD = 0.7


def _minhash_band_ctes() -> str:
    """The shared DuckDB replay of the engine's shingle → signature → band
    pipeline (identical md5-affine constants), as the CTE chain
    ``toks, shingles, sigs, bands`` over a preceding ``docs(doc_id, text)``
    CTE — used by every minhash oracle below."""
    n, bands, k = _MINHASH_N, _MINHASH_BANDS, _MINHASH_K
    rows = n // bands
    prime = dd._MINHASH_PRIME
    sig_cols = ",\n      ".join(
        f"min(({a} * h + {b}) % {prime}) AS sig_{i}"
        for i, (a, b) in enumerate(dd._affine_params(n))
    )
    band_structs = ",\n        ".join(
        "struct_pack(band_id := {b}, band_hash := md5(concat_ws('|', {sigs})))".format(
            b=b, sigs=", ".join(f"sig_{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    return f"""
    toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM docs
    ),
    shingles AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - {k - 2}),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM toks WHERE len(t) >= {k}
      )
    ),
    sigs AS (
      SELECT doc_id,
      {sig_cols}
      FROM (SELECT doc_id,
                   ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h
            FROM shingles)
      GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, b.band_id AS band_id, b.band_hash AS band_hash FROM (
        SELECT doc_id, unnest([
        {band_structs}
        ]) AS b FROM sigs
      )
    )"""


def _minhash_oracle(incremental: bool = False) -> str:
    # Incremental mode: candidates only BETWEEN the corpus (original ids)
    # and the batch (seeded ids >= 1000000), mirroring
    # minhash_near_duplicates_against; full mode: ordered self-join pairs.
    pair_cond = (
        "l.doc_id < 1000000 AND r.doc_id >= 1000000"
        if incremental
        else "l.doc_id < r.doc_id"
    )
    return f"""
    WITH docs AS ({_DOCS_DUP}),
    {_minhash_band_ctes()},
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
       AND {pair_cond}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY c.id_a, c.id_b
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             round(coalesce(i.n_inter, 0)::DOUBLE /
                   (na.n + nb.n - coalesce(i.n_inter, 0)), 6) AS jaccard
      FROM cand c
      LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
      JOIN sizes na ON na.doc_id = c.id_a
      JOIN sizes nb ON nb.doc_id = c.id_b
    )
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= {_MINHASH_THRESHOLD}
    """


@query("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32)+LSH(8×4) near-dup pairs, exact-Jaccard verified ≥ 0.7.
    The oracle replays the identical md5-minhash banding, so Spark and
    DuckDB produce the same candidates AND the same verified pairs."""
    return dd.minhash_near_duplicates(
        _docs_dup(spark, sf_dir),
        "text",
        "doc_id",
        k=_MINHASH_K,
        n_hashes=_MINHASH_N,
        bands=_MINHASH_BANDS,
        threshold=_MINHASH_THRESHOLD,
    )


@query("dedup_incremental_minhash", oracle=_minhash_oracle(incremental=True))
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-corpus) MinHash near-dup: the seeded-dup rows
    (ids >= 1000000) play the incoming batch, the original documents the
    existing corpus; candidates come only from batch bands joined against
    corpus bands (operators/dedup.minhash_near_duplicates_against) — the
    delta-proportional production path for continuous curation. The
    oracle replays the identical pipeline with the cross-side candidate
    restriction."""
    d = _docs_dup(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") < 1000000)
    batch = d.filter(F.col("doc_id") >= 1000000)
    return dd.minhash_near_duplicates_against(
        corpus,
        batch,
        "text",
        "doc_id",
        k=_MINHASH_K,
        n_hashes=_MINHASH_N,
        bands=_MINHASH_BANDS,
        threshold=_MINHASH_THRESHOLD,
    )


_IDX_ROOT: str | None = None


def _idx_path(sf_dir: str, nonce: str | None = None) -> str:
    """Fresh index-artifact directory under one process-level temp root.

    Keyed by a hash of the ABSOLUTE sf_dir (ADVICE r12: two distinct
    directories sharing a basename must never share an index) plus a
    per-invocation ``nonce`` so two concurrent executions in one process
    cannot interleave their overwrite/append sequences on one path. The
    root is removed at interpreter exit."""
    global _IDX_ROOT
    if _IDX_ROOT is None:
        _IDX_ROOT = tempfile.mkdtemp(prefix="dbt_ci_demo_spark_idx_")
        atexit.register(shutil.rmtree, _IDX_ROOT, ignore_errors=True)
    key = hashlib.sha256(os.path.abspath(sf_dir).encode("utf-8")).hexdigest()[:16]
    if nonce is not None:
        key = f"{key}-{nonce}"
    return os.path.join(_IDX_ROOT, key)


def _pinned_batch_artifacts(
    batch: DataFrame, k: int, n_hashes: int, bands: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(shingles, bands, sizes) artifacts of one index-flow input with the
    SHINGLE table pinned, derived once for every consumer (the admission's
    ``batch_index`` and the append/overwrite's ``artifacts`` — VERDICT r14
    #4: without this, each call re-runs the input's tokenize + shingle
    distinct, the dominant stage). Only the shingle table is persisted:
    bands/sizes are cheap aggregates over the cache, and persisting THEM
    would freeze their 32-partition cache layout into the written
    artifacts (AQE cannot re-coalesce cached plan output by default) —
    tiny-file debris the admission scans would then pay for (guide §6).
    The caller owns the unpersist (the lone persisted frame is element 0,
    but unpersisting all three is a safe no-op)."""
    sh = dd.word_shingles(batch, "text", "doc_id", k).persist()
    bd = dd.banded_buckets(
        dd.minhash_signatures(sh, "doc_id", n_hashes), "doc_id", n_hashes, bands
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    return sh, bd, sizes


def _materialize_artifacts(art: tuple[DataFrame, ...]) -> None:
    """Force the pinned shingle cache (noop sink — full compute, no
    output): run inside the protocol-overlap pool so artifact derivation
    back-fills executors while the corpus index build's write jobs run
    (guide §2.6)."""
    art[0].write.format("noop").mode("overwrite").save()


def _run_all_settled(*fns) -> None:
    """Run independent Spark-action thunks concurrently; let every one
    settle before raising (the write_minhash_index pool discipline — a
    failure must not leave siblings racing the caller's cleanup)."""
    with ThreadPoolExecutor(max_workers=len(fns)) as pool:
        futures = [pool.submit(fn) for fn in fns]
        errs = [f.exception() for f in futures]
    for err in errs:
        if err is not None:
            raise err


def _refresh_oracle() -> str:
    # Admission 1 sees corpus-vs-batch1 candidates; admission 2 sees
    # (corpus ∪ batch1)-vs-batch2 — the refreshed-index semantics. UNION
    # (not UNION ALL) plays the engine's per-admission DISTINCT: the two
    # arms are disjoint (id_b ranges differ), so the global dedup equals
    # per-arm dedup.
    return f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             text || ' near duplicate trailing marker' AS text
      FROM documents WHERE doc_id % 25 = 0
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id,
             text || ' near duplicate trailing marker' AS text
      FROM documents WHERE doc_id % 50 = 0
    ),
    {_minhash_band_ctes()},
    cand AS (
      SELECT 1 AS admission, l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
       AND l.doc_id < 1000000
       AND r.doc_id >= 1000000 AND r.doc_id < 2000000
      UNION
      SELECT 2 AS admission, l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
       AND l.doc_id < 2000000 AND r.doc_id >= 2000000
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM (SELECT DISTINCT id_a, id_b FROM cand) c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY c.id_a, c.id_b
    ),
    scored AS (
      SELECT c.admission, c.id_a, c.id_b,
             round(coalesce(i.n_inter, 0)::DOUBLE /
                   (na.n + nb.n - coalesce(i.n_inter, 0)), 6) AS jaccard
      FROM cand c
      LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
      JOIN sizes na ON na.doc_id = c.id_a
      JOIN sizes nb ON nb.doc_id = c.id_b
    )
    SELECT admission, id_a, id_b, jaccard
    FROM scored WHERE jaccard >= {_MINHASH_THRESHOLD}
    """


@query("dedup_index_refresh_cycle", oracle=_refresh_oracle)
def dedup_index_refresh_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored near-dup index's full production loop as ONE row:
    build the corpus index to parquet (operators/dedup.write_minhash_index),
    admit batch 1 against the READ-BACK index (no corpus-side compute:
    corpus=None), REFRESH the index by appending batch 1's own per-doc
    artifacts (mode="append" — exact because no index artifact aggregates
    across documents; O(|batch|) work, corpus partitions untouched), then
    admit batch 2 against the refreshed index. Batch 2 duplicates docs that
    exist in BOTH the original corpus and batch 1, so admission 2's pairs
    with id_a in the batch-1 range [1000000, 2000000) are the refresh
    witness — an unrefreshed index cannot produce them (batch 1 ids enter
    the stored band table only via the append). Closes the
    rebuild-vs-refresh gap VERDICT r11 #5 named: the index is
    append-refreshable for admissions, rebuild-only for deletes/edits."""
    par = spark.sparkContext.defaultParallelism
    d = _docs_raw(spark, sf_dir)
    corpus = d.repartition(par)
    batch1 = (
        d.filter(F.col("doc_id") % 25 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" near duplicate trailing marker")).alias("text"),
        )
        .repartition(par)
    )
    batch2 = (
        d.filter(F.col("doc_id") % 50 == 0)
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" near duplicate trailing marker")).alias("text"),
        )
        .repartition(par)
    )
    base = _idx_path(sf_dir, nonce=uuid.uuid4().hex[:12])
    kw = dict(k=_MINHASH_K, n_hashes=_MINHASH_N, bands=_MINHASH_BANDS)
    # r15 (VERDICT r14 #1/#4): each batch's per-doc artifacts are needed
    # TWICE — batch 1 by its admission AND the append that refreshes the
    # index; batch 2 by its admission (and its derivation is independent
    # of every protocol phase) — so derive them ONCE, pinned, and thread
    # them through ``batch_index``/``artifacts``. The corpus index build
    # and both batches' artifact materializations share no state, so they
    # run CONCURRENTLY (guide §2.6: overlap independent jobs); the
    # admissions/append stay strictly sequential — the protocol's
    # read-after-commit contract.
    art1 = _pinned_batch_artifacts(batch1, **kw)
    art2 = _pinned_batch_artifacts(batch2, **kw)
    try:
        _run_all_settled(
            lambda: dd.write_minhash_index(
                corpus, "text", "doc_id", base, mode="overwrite", **kw
            ),
            lambda: _materialize_artifacts(art1),
            lambda: _materialize_artifacts(art2),
        )
        # Admission pairs are eagerly checkpointed by the operator, so pairs1
        # is materialized BEFORE the refresh mutates the parquet artifacts.
        pairs1 = dd.minhash_near_duplicates_against(
            None, batch1, "text", "doc_id",
            corpus_index=dd.read_minhash_index(spark, base),
            batch_index=art1,
            threshold=_MINHASH_THRESHOLD, **kw,
        )
        dd.write_minhash_index(
            None, "text", "doc_id", base, mode="append", batch_id="batch1",
            artifacts=art1, **kw,
        )
        pairs2 = dd.minhash_near_duplicates_against(
            None, batch2, "text", "doc_id",
            corpus_index=dd.read_minhash_index(spark, base),
            batch_index=art2,
            threshold=_MINHASH_THRESHOLD, **kw,
        )
    finally:
        for frame in (*art1, *art2):
            frame.unpersist()
    return (
        pairs1.select(F.lit(1).alias("admission"), "id_a", "id_b", "jaccard")
        .unionByName(pairs2.select(F.lit(2).alias("admission"), "id_a", "id_b", "jaccard"))
    )


def _retry_replay_oracle() -> str:
    # Both phases must serve the identical admission — batch2 against the
    # refreshed (corpus ∪ batch1) index — so the oracle is ONE scored CTE
    # emitted twice under phase 1 (retry after a partial promote) and
    # phase 2 (replayed batch_id after an overwrite rebuild). A surviving
    # protocol defect breaks exactly one phase: a non-exact retry leaves
    # duplicate per-doc rows that multiply pairs/shift jaccard in phase 1;
    # a stale commit marker makes the replayed append a silent no-op, so
    # phase 2 loses every pair with id_a in the batch-1 range.
    return f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             text || ' near duplicate trailing marker' AS text
      FROM documents WHERE doc_id % 25 = 0
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id,
             text || ' near duplicate trailing marker' AS text
      FROM documents WHERE doc_id % 50 = 0
    ),
    {_minhash_band_ctes()},
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
       AND l.doc_id < 2000000 AND r.doc_id >= 2000000
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY c.id_a, c.id_b
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             round(coalesce(i.n_inter, 0)::DOUBLE /
                   (na.n + nb.n - coalesce(i.n_inter, 0)), 6) AS jaccard
      FROM cand c
      LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
      JOIN sizes na ON na.doc_id = c.id_a
      JOIN sizes nb ON nb.doc_id = c.id_b
    ),
    kept AS (SELECT id_a, id_b, jaccard FROM scored
             WHERE jaccard >= {_MINHASH_THRESHOLD})
    SELECT 1 AS phase, id_a, id_b, jaccard FROM kept
    UNION ALL
    SELECT 2 AS phase, id_a, id_b, jaccard FROM kept
    """


@query("dedup_index_retry_replay", oracle=_retry_replay_oracle)
def dedup_index_retry_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible witness of the stored index's crash-retry contract
    (r14; VERDICT r13 #4's named candidate — ADVICE r13 found two real
    holes in this protocol, so the contract joins the permanent
    correctness surface instead of living only in pytest simulations).

    Phase 1 — retry-exactness: append batch 1 under a ``batch_id``, then
    reproduce EXACTLY the on-disk state a crash between the promote
    renames and the marker write leaves behind (commit marker absent,
    one of the token's promoted files missing), retry the same append,
    and admit batch 2 against the read-back index. A non-exact retry
    (duplicate per-doc sizes/shingle rows) multiplies admission pairs or
    shifts jaccard; a non-repairing retry loses candidates.

    Phase 2 — rebuild-replay: overwrite-rebuild the corpus index (which
    must scrub the append protocol's commit markers and staging debris —
    the ADVICE r13 medium), replay the SAME ``batch_id``, and admit
    batch 2 again. A stale marker would make the replay a silent no-op:
    every phase-2 pair whose id_a is in the batch-1 range [1000000,
    2000000) would vanish while the caller believes the batch committed.

    Both phases must return the identical pair set — the oracle emits
    one scored CTE twice. Corpus is the even-id half of ``documents``
    (the witness needs protocol coverage, not corpus scale; batch 2's
    seeds at doc_id % 50 are even, so every batch-2 doc near-duplicates
    BOTH a corpus doc and a batch-1 doc)."""
    par = spark.sparkContext.defaultParallelism
    d = _docs_raw(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 2 == 0).repartition(par)

    def seeded(mod: int, offset: int) -> DataFrame:
        return (
            d.filter(F.col("doc_id") % mod == 0)
            .select(
                (F.col("doc_id") + offset).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" near duplicate trailing marker")
                ).alias("text"),
            )
            .repartition(par)
        )

    batch1, batch2 = seeded(25, 1000000), seeded(50, 2000000)
    base = _idx_path(sf_dir, nonce=uuid.uuid4().hex[:12])
    kw = dict(k=_MINHASH_K, n_hashes=_MINHASH_N, bands=_MINHASH_BANDS)
    token = hashlib.sha256(b"b1").hexdigest()[:16]

    # r15 (VERDICT r14 #1/#4): the witness re-runs the same derivations
    # many times — batch 1 is appended THREE times (append, crash-retry,
    # replay), batch 2 admitted twice, the corpus built twice — so each
    # input's per-doc artifacts are derived ONCE, pinned, and threaded
    # through ``artifacts``/``batch_index``. Phase 1's corpus build and
    # both batches' artifact materializations are independent actions and
    # run concurrently (guide §2.6); every protocol mutation and every
    # admission stays strictly sequential, so the crash/retry/replay
    # on-disk states are byte-identical to the sequential form.
    artc = _pinned_batch_artifacts(corpus, **kw)
    art1 = _pinned_batch_artifacts(batch1, **kw)
    art2 = _pinned_batch_artifacts(batch2, **kw)

    def admit(batch: DataFrame) -> DataFrame:
        return dd.minhash_near_duplicates_against(
            None, batch, "text", "doc_id",
            corpus_index=dd.read_minhash_index(spark, base),
            batch_index=art2,
            threshold=_MINHASH_THRESHOLD, **kw,
        )

    def append_b1() -> None:
        dd.write_minhash_index(
            None, "text", "doc_id", base, mode="append", batch_id="b1",
            artifacts=art1, **kw,
        )

    def overwrite_corpus() -> None:
        dd.write_minhash_index(
            None, "text", "doc_id", base, mode="overwrite", artifacts=artc, **kw
        )

    try:
        # phase 1: append, simulate the mid-promote crash state, retry, admit
        _run_all_settled(
            overwrite_corpus,
            lambda: _materialize_artifacts(art1),
            lambda: _materialize_artifacts(art2),
        )
        append_b1()
        os.remove(os.path.join(base, "_appends", token))
        promoted = sorted(glob.glob(os.path.join(base, "bands", f"b-{token}-*.parquet")))
        os.remove(promoted[0])
        append_b1()
        pairs_retry = admit(batch2)  # eagerly checkpointed by the operator

        # phase 2: overwrite rebuild (must scrub markers), replay batch_id
        overwrite_corpus()
        append_b1()
        pairs_replay = admit(batch2)
    finally:
        for frame in (*artc, *art1, *art2):
            frame.unpersist()

    return (
        pairs_retry.select(F.lit(1).alias("phase"), "id_a", "id_b", "jaccard")
        .unionByName(
            pairs_replay.select(F.lit(2).alias("phase"), "id_a", "id_b", "jaccard")
        )
    )


@query(
    "dedup_jaccard_pairs",
    oracle=f"""
    WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
                  UNION ALL
                  SELECT doc_id + 1000000, text || ' x' FROM documents WHERE doc_id % 25 = 0),
    toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM docs),
    shingles AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM toks WHERE len(t) >= 3)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sizes a JOIN sizes b ON a.doc_id < b.doc_id),
    inter AS (
      SELECT sa.doc_id AS id_a, sb.doc_id AS id_b, count(*) AS n_inter
      FROM shingles sa JOIN shingles sb
        ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
      GROUP BY sa.doc_id, sb.doc_id
    ),
    scored AS (
      SELECT p.id_a, p.id_b,
             round(coalesce(i.n_inter, 0)::DOUBLE /
                   (na.n + nb.n - coalesce(i.n_inter, 0)), 6) AS jaccard
      FROM pairs p
      LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
      JOIN sizes na ON na.doc_id = p.id_a
      JOIN sizes nb ON nb.doc_id = p.id_b
    )
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5
    """,
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force n-gram Jaccard pairs ≥ 0.5 on a subsampled corpus —
    the exact baseline the LSH pipeline is verified against. (All-pairs is
    deliberately the non-scale path; it exists as the verifier.)"""
    docs = _docs(spark, sf_dir)
    sub = docs.filter(F.col("doc_id") % 5 == 0)
    dups = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    )
    corpus = sub.unionByName(dups)
    sh = dd.word_shingles(corpus, "text", "doc_id", k=3)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        sizes.select(F.col("doc_id").alias("id_a"))
        .crossJoin(sizes.select(F.col("doc_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    return dd.jaccard_scores(sh, "doc_id", pairs).filter(F.col("jaccard") >= 0.5)


# ---------------------------------------------------------------------------
# SimHash near-dup — oracle is brute force (banding has guaranteed recall
# for hamming <= 3, so banded == brute force provably)
# ---------------------------------------------------------------------------


def _simhash_oracle() -> str:
    bit_terms = ",\n      ".join(
        "sum(CAST(floor((strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1) / {den}) AS BIGINT) % 2) AS bit_{j}".format(
            pos=j // 4 + 1, den=2 ** (j % 4), j=j
        )
        for j in range(32)
    )
    sig_sum = " + ".join(
        f"CASE WHEN bit_{j} * 2 >= n_tok THEN {2**j} ELSE 0 END" for j in range(32)
    )
    return f"""
    WITH docs AS ({_DOCS_DUP}),
    toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM docs
      ) WHERE tok != ''
    ),
    hashed AS (SELECT doc_id, md5(tok) AS h FROM toks),
    bits AS (
      SELECT doc_id, count(*) AS n_tok,
      {bit_terms}
      FROM hashed GROUP BY doc_id
    ),
    sigs AS (SELECT doc_id, CAST({sig_sum} AS BIGINT) AS simhash FROM bits)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-32 near-dup pairs (hamming ≤ 3) via 4-block banded
    candidates + exact hamming filter. Oracle brute-forces all pairs — the
    pigeonhole guarantee makes the banded result provably identical."""
    return dd.simhash_near_duplicates(_docs_dup(spark, sf_dir), "text", "doc_id", max_hamming=3)


def _cluster_components_oracle(rounds: int = 12) -> str:
    """Connected-components oracle as ``rounds`` unrolled min-label
    propagation steps over the bidirected SimHash pair graph.

    The earlier recursive-CTE transitive closure was exact but
    O(Σ|component|²) rows — intractable on DuckDB 1.0 at the sf0.1 stress
    scale (1.5M pairs). Min-label propagation is |V| rows per round and
    monotone, so equality between round R and round R+1 proves the global
    fixpoint (= the exact closure answer). The oracle checks that proof
    itself: if any label still changes at round R+1 it emits a poison row
    (-1, -1, NULL) that can never match the Spark output — the unrolling
    assumption (diameter ≤ R; banding quasi-cliques have tiny diameters)
    is therefore loudly verified, never silently wrong.

    Every chained CTE is AS MATERIALIZED: DuckDB 1.0 otherwise inlines a
    CTE at each reference, and lab{{i}} references lab{{i-1}} twice — 2^R
    expansions of the whole SimHash pipeline without it."""
    ctes = [
        f"pairs AS MATERIALIZED ({_simhash_oracle()})",
        """edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    )""",
        "lab0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS l FROM edges)",
    ]
    for i in range(1, rounds + 2):
        ctes.append(
            f"""lab{i} AS MATERIALIZED (
      SELECT node, min(l) AS l FROM (
        SELECT node, l FROM lab{i - 1}
        UNION ALL
        SELECT e.dst AS node, p.l FROM lab{i - 1} p JOIN edges e ON e.src = p.node
      ) GROUP BY node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node AS doc_id, l AS cluster_id, (node = l) AS is_survivor
    FROM lab{rounds}
    UNION ALL
    SELECT -1, -1, NULL
    WHERE EXISTS (SELECT 1 FROM lab{rounds} a JOIN lab{rounds + 1} b
                  ON a.node = b.node AND a.l != b.l)
    """
    )


@query("dedup_cluster_components", oracle=_cluster_components_oracle())
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: connected components over the SimHash near-dup
    pair graph (A~B, B~C ⇒ one cluster even though (A,C) was never
    emitted), with the cluster-minimum as survivor — the step that turns
    pairwise detections into corpus dedup decisions. Pregel-style
    min-label propagation (one shuffle per round, lineage truncated per
    round); the dense banded pair graph converges in a handful of rounds."""
    pairs = dd.simhash_near_duplicates(_docs_dup(spark, sf_dir), "text", "doc_id", max_hamming=3)
    return dd.duplicate_clusters(pairs)


@query("dedup_cluster_star", oracle=_cluster_components_oracle)
def dedup_cluster_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering result via the large-star/small-star alternation
    (operators/dedup.connected_components_star, Kiveris et al. SoCC'14)
    — the O(log diameter) variant for high-diameter general graphs.
    Deliberately value-checked against the SAME unrolled min-label
    oracle as dedup_cluster_components: both algorithms must label every
    node with its component minimum, so a hash match here certifies the
    star rewriting end-to-end, not just on toy graphs."""
    pairs = dd.simhash_near_duplicates(_docs_dup(spark, sf_dir), "text", "doc_id", max_hamming=3)
    cc = dd.connected_components_star(pairs)
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_survivor"),
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def _regex_count(expr: str, pattern: str) -> str:
    return f"len(regexp_extract_all({expr}, '{pattern}'))"


def _text_stats_oracle() -> str:
    stop_sum = " + ".join(
        _regex_count("lower(text)", f"\\b{w}\\b") for w in tx.STOPWORDS_EN
    )
    n_words = _regex_count("lower(text)", "[a-z0-9]+")
    n_tokens = _regex_count("text", "\\S+")
    n_punct = _regex_count("text", "[.,;:!?''\"()\\[\\]{{}}-]".replace("''", "''"))
    return f"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars,
             {n_tokens} AS n_tokens,
             {n_words} AS n_words,
             length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS word_chars,
             {n_punct} AS n_punct,
             {stop_sum} AS n_stop
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_chars, n_tokens, n_words,
             round(CASE WHEN n_words > 0 THEN word_chars::DOUBLE / n_words ELSE 0.0 END, 6) AS avg_word_len,
             round(CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0.0 END, 6) AS punct_ratio,
             round(CASE WHEN n_words > 0 THEN n_stop::DOUBLE / n_words ELSE 0.0 END, 6) AS stopword_ratio
      FROM m
    )
    SELECT doc_id, n_chars, n_tokens, n_words, avg_word_len, punct_ratio, stopword_ratio,
           round((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN avg_word_len BETWEEN 3 AND 10 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN punct_ratio <= 0.2 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN stopword_ratio >= 0.05 THEN 0.25 ELSE 0.0 END), 6) AS quality_score
    FROM r
    """


@query("text_stats", oracle=_text_stats_oracle())
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics (C4/Gopher-style heuristics)."""
    return tx.text_stats(_docs(spark, sf_dir), "text", "doc_id")


def _langid_oracle() -> str:
    langs = list(tx.LANG_MARKERS)
    score_cols = ",\n             ".join(
        "CAST({} AS BIGINT) AS score_{}".format(
            " + ".join(_regex_count("lower(text)", f"\\b{w}\\b") for w in words), lang
        )
        for lang, words in tx.LANG_MARKERS.items()
    )
    # argmax with first-language-wins tie-break, mirroring the Spark fold
    pred = f"'{langs[0]}'"
    acc = f"score_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN score_{lang} > {acc} THEN '{lang}' ELSE {pred} END"
        acc = f"greatest({acc}, score_{lang})"
    return f"""
    WITH s AS (
      SELECT doc_id,
             {score_cols}
      FROM documents
    )
    SELECT doc_id, {', '.join(f'score_{lang}' for lang in langs)},
           {pred} AS predicted_lang
    FROM s
    """


@query(
    "text_vocab_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    f AS (
      SELECT tok, count(*) AS term_freq, count(DISTINCT doc_id) AS doc_freq
      FROM toks WHERE tok != '' GROUP BY tok
    )
    SELECT tok, term_freq, doc_freq
    FROM f ORDER BY term_freq DESC, tok LIMIT 100
    """,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary builder: corpus-wide term and document frequencies,
    top-100 by term frequency (deterministic tie-break on token). The
    top-k is orderBy+limit — Spark's TakeOrderedAndProject computes
    per-partition heaps then merges k rows on the driver, so there is no
    global sort and no single-partition window at any corpus size."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    return freq.orderBy(F.desc("term_freq"), F.asc("tok")).limit(100)


@query("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language identification with deterministic argmax."""
    return tx.language_id(_docs(spark, sf_dir), "text", "doc_id")


@query(
    "text_token_counts",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '\\S+')) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]+')) AS n_bpe_ish
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        tx.token_count(F.col("text")).alias("n_ws_tokens"),
        tx.bpe_ish_token_count(F.col("text")).alias("n_bpe_ish"),
    )


# ---------------------------------------------------------------------------
# Similarity search — oracles share the deterministic md5-derived planes
# ---------------------------------------------------------------------------


def _planes_sql(dim: int = 64, n_planes: int = 8, seed: int = 0) -> list[str]:
    planes = sim._hyperplanes(dim, n_planes, seed=seed)
    return ["[" + ", ".join(f"{w}.0" for w in row) + "]::DOUBLE[]" for row in planes]


_COS = (
    "round(list_inner_product({a}, {b}) / "
    "(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b}))), 6)"
)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings spread across the cluster before the dot-product-heavy
    plane projections / scoring joins — same single-input-split rationale
    as _docs."""
    par = spark.sparkContext.defaultParallelism
    return _t(spark, sf_dir, "embeddings").repartition(par)


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             {_COS.format(a='qv', b='cv')} AS cosine_r
      FROM c, q WHERE neighbor_id != query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_r DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine_r, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors vec_id < 5 against the corpus."""
    emb = _emb(spark, sf_dir)
    out = sim.cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 5), k=5)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


_LSH_PLANES = 4
_LSH_TABLES = 8


def _lsh_oracle() -> str:
    # One bucketed SELECT per table (same md5-seeded planes as the Spark
    # operator), UNION ALL'd into long form; candidate iff co-bucketed in
    # any table, deduped per pair before exact ranking.
    per_table = []
    for t in range(_LSH_TABLES):
        planes = _planes_sql(n_planes=_LSH_PLANES, seed=t + 1)
        bucket_terms = " + ".join(
            f"CASE WHEN list_inner_product(v, {planes[p]}) >= 0 THEN {2**p} ELSE 0 END"
            for p in range(len(planes))
        )
        per_table.append(
            f"SELECT vec_id, v, {t} AS t, CAST({bucket_terms} AS BIGINT) AS bucket FROM base"
        )
    bucketed = "\n      UNION ALL\n      ".join(per_table)
    return f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bucketed AS (
      {bucketed}
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, t, bucket FROM bucketed WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, v AS cv, t, bucket FROM bucketed),
    cand AS (
      SELECT DISTINCT q.query_id, c.neighbor_id,
             {_COS.format(a='q.qv', b='c.cv')} AS cosine_r
      FROM c JOIN q ON c.t = q.t AND c.bucket = q.bucket
                   AND c.neighbor_id != q.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_r DESC, neighbor_id) AS rank
      FROM cand
    )
    SELECT query_id, neighbor_id, cosine_r, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """


@query("sim_lsh_ann", oracle=_lsh_oracle())
def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN top-5 — the oracle re-derives the same
    md5-seeded planes and bucket assignment, verifying the approximate
    index itself, not just the final ranking."""
    emb = _emb(spark, sf_dir)
    out = sim.lsh_ann_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=5,
        n_planes=_LSH_PLANES,
        n_tables=_LSH_TABLES,
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


_EMB_DUP = """
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_concat([embedding[1]::DOUBLE + 0.01], (embedding[2:])::DOUBLE[])
  FROM embeddings WHERE vec_id % 20 = 0
"""


def _emb_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    pert = (
        emb.filter(F.col("vec_id") % 20 == 0)
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.concat(
                F.array(F.col("embedding").getItem(0).cast("double") + 0.01),
                F.transform(F.slice("embedding", 2, 63), lambda x: x.cast("double")),
            ).alias("v"),
        )
    )
    # union before the parallelism repartition — one exchange, no 2× fan-out
    return base.unionByName(pert).repartition(spark.sparkContext.defaultParallelism)


def _neardup_oracle() -> str:
    planes = _planes_sql()
    bucket_terms = " + ".join(
        f"CASE WHEN list_inner_product(v, {planes[p]}) >= 0 THEN {2**p} ELSE 0 END"
        for p in range(len(planes))
    )
    return f"""
    WITH base AS ({_EMB_DUP}),
    bucketed AS (SELECT vec_id, v, CAST({bucket_terms} AS BIGINT) AS bucket FROM base),
    cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT id_a, id_b, {_COS.format(a='va', b='vb')} AS cosine_r FROM cand
    )
    SELECT id_a, id_b, cosine_r FROM scored WHERE cosine_r >= 0.99
    """


@query("sim_embedding_neardup", oracle=_neardup_oracle())
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicates (cosine ≥ 0.99) over a dup-injected
    corpus, LSH-bucketed candidates + exact verification."""
    corpus = _emb_dup(spark, sf_dir).withColumnRenamed("v", "embedding")
    return sim.embedding_near_duplicates(corpus, id_col="vec_id", threshold=0.99)


_SEM_K = 8  # coarse clusters; at scale k ∝ corpus/target_cluster_size
_SEM_THRESHOLD = 0.99


def _semdedup_oracle() -> str:
    cos = _COS.format(a="a.v", b="b.v")
    return f"""
    WITH base0 AS ({_EMB_DUP}),
    base AS (
      SELECT vec_id, v,
             list_transform(v, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS q
      FROM base0),
    seeds AS (SELECT vec_id AS cluster_id, q AS sq FROM base
              WHERE vec_id < {_SEM_K}),
    scored AS (
      SELECT b.vec_id, s.cluster_id,
             list_inner_product(b.q, b.q) - 2 * list_inner_product(b.q, s.sq)
               + list_inner_product(s.sq, s.sq) AS dist
      FROM base b CROSS JOIN seeds s),
    assigned AS (
      SELECT r.vec_id, r.cluster_id, b.v
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cluster_id) AS rn
            FROM scored) r
      JOIN base b ON b.vec_id = r.vec_id
      WHERE r.rn = 1),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE {cos} >= {_SEM_THRESHOLD})
    SELECT a.vec_id, a.cluster_id, (d.vec_id IS NULL) AS is_kept
    FROM assigned a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    """


@query("dedup_semantic_clusters", oracle=_semdedup_oracle)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embedding corpus, then drop
    every vector whose cosine to a smaller-id member of its OWN cluster
    is ≥ 0.99 — the min-id survivor rule the whole dedup family uses.
    Complements `sim_embedding_neardup` (global LSH buckets): clustering
    bounds candidate pairs by cluster size (Σ|c|² instead of n², with k
    sized so clusters stay small at 100 TB), at the documented recall
    trade that a near-dup pair straddling two clusters is not dropped —
    exactly SemDeDup's published design point.

    Scale shape: cluster assignment is the r06 Lloyd path — the k seed
    vectors are driver-held bounded model state, and assignment is a
    pure zero-shuffle projection (no broadcast join, no rank window)
    via the routed seam `_kmeans_assign`: one struct per centroid while
    k ≤ `_KM_LITERAL_K_MAX` (= 100; the registered k = 8 plans the
    literal path), and a single nested-array
    matrix literal with a transform-with-index argmin above that — the
    literal-per-centroid tree is k·d expression LEAVES, which at
    production k in the 10^4+ range is a planner-side blow-up
    (Catalyst analysis + 64KB codegen limit), not an executor problem.
    The only exchanges are the equi self-join on cluster_id
    (hash-partitioned; with production k in the 10^4+ range the key
    space is wide and AQE skew-splits outliers) and the final
    left-anti-shaped membership join. The assignment projection re-evaluates per join branch — a
    scan-shaped recompute; production would persist the assignment as a
    stored artifact (the build_ivf_index pattern)."""
    from dbt_ci_demo_spark.queries_embed import (
        _FX,
        _collect_seed_items,
        _kmeans_assign,
    )

    corpus = _emb_dup(spark, sf_dir)
    base = corpus.select(
        "vec_id",
        "v",
        F.transform(
            F.col("v"), lambda x: F.round(x * F.lit(_FX)).cast("long")
        ).alias("q"),
    )
    seed_items = _collect_seed_items(
        base.filter(F.col("vec_id") < _SEM_K).select(
            F.col("vec_id").alias("cluster_id"), F.col("q").alias("sq")
        )
    )
    assigned = base.select(
        "vec_id", "v", _kmeans_assign(seed_items).alias("cluster_id")
    )
    # Per-pair cosine evaluates THREE 64-element folds (dot + both norms);
    # the norms depend only on the row, so they are precomputed once per
    # SIDE and the pair stage pays one fold (r14, guide §1.2 per-task
    # work: the Σ|c|² pair stage is this row's dominant cost). Float math
    # is bit-identical to sim.cosine — same den = norm_a·norm_b guard,
    # same fold order, same division — so every oracle value is unchanged.
    norm = F.sqrt(
        F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    left = assigned.select(
        "cluster_id",
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        norm.alias("na"),
    )
    right = assigned.select(
        "cluster_id",
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        norm.alias("nb"),
    )
    den = F.col("na") * F.col("nb")
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pair_cos = F.when(den > 0, dot / den).otherwise(F.lit(0.0))
    dropped = (
        left.join(right, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(pair_cos, 6) >= F.lit(_SEM_THRESHOLD))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return assigned.join(
        dropped.withColumn("dup", F.lit(True)), "vec_id", "left"
    ).select("vec_id", "cluster_id", F.col("dup").isNull().alias("is_kept"))


def _ivf_oracle() -> str:
    # The IVF "training" is a single deterministic pass: per-cluster,
    # per-dimension decimal-exact means (order-independent, so DuckDB
    # reproduces the centroids bit-for-bit). Probe ranking and final
    # ranking both round cosines to 6 dp with the same tie-breakers as the
    # Spark operator.
    return f"""
    WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    pos AS (
      SELECT label, unnest(v) AS val, unnest(range(1, len(v) + 1)) AS pos FROM base
    ),
    means AS (
      SELECT label, pos,
             CAST(SUM(CAST(round(val * 1000000.0) AS BIGINT)) AS DOUBLE) / count(*) / 1000000.0 AS mean
      FROM pos GROUP BY label, pos
    ),
    cents AS (
      SELECT label AS cluster, list(mean ORDER BY pos) AS centroid
      FROM means GROUP BY label
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5),
    qc AS (
      SELECT query_id, qv, cluster,
             {_COS.format(a='qv', b='centroid')} AS ccos
      FROM q, cents
    ),
    probes AS (
      SELECT query_id, qv, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY ccos DESC, cluster) AS crank
        FROM qc
      ) WHERE crank <= 2
    ),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             {_COS.format(a='p.qv', b='c.v')} AS cosine_r
      FROM base c JOIN probes p ON c.label = p.cluster
      WHERE c.vec_id != p.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_r DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine_r, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """


@query("sim_ivf_topk", oracle=_ivf_oracle())
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: per-label centroids (decimal-exact means — fully
    deterministic, so the oracle re-derives them in SQL), probe the 2
    nearest clusters, exact-rank within them. Recall vs brute force is
    additionally validated in tests/test_northstar.py."""
    emb = _emb(spark, sf_dir)
    out = sim.ivf_topk(emb, emb.filter(F.col("vec_id") < 5), "label", k=5, n_probe=2)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@query(
    "text_tfidf_topterms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM toks WHERE tok != '' GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.tok,
             round(t.tf * ln(n.n_docs / d.df), 6) AS tfidf
      FROM tf t JOIN df d ON d.tok = t.tok CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, tok) AS rank
      FROM scored
    )
    SELECT doc_id, tok, tfidf, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf (ln(N/df)
    weighting) — the classic corpus-keyword extractor. The document
    frequency table derives from the already-aggregated term-frequency
    table (tf rows are unique per (doc, tok)), so the corpus is scanned
    and tokenized exactly once; df is a tiny vocabulary-keyed aggregate
    that re-joins broadcast-style, N is a one-row broadcast scalar, and
    the per-document ranking window partitions on doc_id — no global
    sort anywhere. tf and df are integers and every engine computes the
    identical ln(N/df) doubles, rounded to 6 for hash stability."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = _t(spark, sf_dir, "documents").agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df_t, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
    )


@query(
    "text_line_dedup",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN 'NAVIGATION MENU HOME ABOUT CONTACT' || chr(10) ELSE '' END
             || text
             || chr(10) || 'ref: doc-' || CAST(doc_id AS VARCHAR)
             || CASE WHEN doc_id % 3 = 0
                     THEN chr(10) || 'SUBSCRIBE TO OUR NEWSLETTER' ELSE '' END
               AS text
      FROM documents
    ),
    lines AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos,
             unnest(string_split(text, chr(10))) AS line
      FROM docs
    ),
    dup AS (SELECT line FROM lines GROUP BY line HAVING count(*) >= 2),
    kept AS (
      SELECT l.doc_id, l.pos, l.line
      FROM lines l LEFT JOIN dup d ON d.line = l.line
      WHERE d.line IS NULL
    ),
    reassembled AS (
      SELECT doc_id,
             string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(r.text_dedup, '') AS text_dedup,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(string_split(d.text, chr(10))) - coalesce(r.n_kept, 0) AS BIGINT)
             AS n_dropped
    FROM docs d LEFT JOIN reassembled r ON r.doc_id = d.doc_id
    """,
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide line dedup over a boilerplate-injected
    fixture: every doc gains a unique reference line, every 5th a shared
    navigation header, every 3rd a shared subscribe footer. The operator
    (operators/text.remove_duplicate_lines) must drop exactly the shared
    lines and reassemble the survivors in original order — all verified
    per document, including reassembled text."""
    d = _docs(spark, sf_dir)
    injected = d.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit("NAVIGATION MENU HOME ABOUT CONTACT\n"),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.lit("\nref: doc-"),
            F.col("doc_id").cast("string"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("\nSUBSCRIBE TO OUR NEWSLETTER")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return tx.remove_duplicate_lines(injected, "text", "doc_id")


@query(
    "text_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS c
      FROM toks WHERE tok != '' GROUP BY doc_id, tok
    ),
    vocab AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS c_tok FROM tf GROUP BY tok),
    tot AS (SELECT CAST(SUM(c_tok) AS BIGINT) AS n, count(*) AS v FROM vocab),
    lp AS (
      SELECT tok,
             CAST(round(round(ln((c_tok + 1)::DOUBLE / (t.n + t.v)), 6) * 1000000.0)
                  AS BIGINT) AS lp_e6
      FROM vocab CROSS JOIN tot t
    ),
    per_doc AS (
      SELECT f.doc_id,
             CAST(SUM(f.c) AS BIGINT) AS n_tokens,
             CAST(SUM(f.c * l.lp_e6) AS BIGINT) AS s
      FROM tf f JOIN lp l ON l.tok = f.tok
      GROUP BY f.doc_id
    )
    SELECT doc_id, n_tokens,
           round(s::DOUBLE / n_tokens / 1000000.0, 6) AS avg_logprob
    FROM per_doc
    """,
)
def text_unigram_logprob(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """Cheap-LM quality scoring: per-document mean token log-probability
    under the corpus's own add-one-smoothed unigram model — the
    perplexity-filter stage of public curation pipelines (CCNet-style),
    here with the corpus itself as the reference model. Low scores mark
    gibberish/outlier token distributions.

    Portability: each token's logprob is quantized to a 6-decimal integer
    (round(ln·1e6)) before the per-document accumulation, so sums are
    exact integer arithmetic — order-independent and bit-identical across
    engines (the module's fixed-point discipline); only the final mean
    divides in doubles. Plan: one tokenize shuffle (tf), a vocabulary
    aggregate reusing it, a broadcast 1-row total, a vocab-keyed join
    back, one doc-keyed aggregate — the same shape as TF-IDF.

    ``materialize`` (r14): the plan REFERENCES tf from three subtrees
    (per_doc, vocab→lp, vocab→tot) and Spark executes the whole
    tokenize+count derivation once per reference — the physical plan
    holds THREE `Generate explode(split(text))` scans over the corpus
    and zero ReusedExchange (guide §2.4 duplicated-subtree class; at
    100 TB that is three full-text tokenize passes where one suffices).
    True (default, the registered/bench path) pins the slim tf table
    (doc_id, tok, c — no text), eager LOCAL-checkpoints the doc-sized
    result, and unpersists the pin — nothing corpus-sized stays pinned,
    callers get materialized rows. The materialization is
    ``localCheckpoint`` rather than a reliable checkpoint (r15, VERDICT
    r14 #3): the r14 disk checkpoint's write+read round-trip cost more
    locally than the single-tokenize-pass saved, and the result is
    doc-sized with a bounded blast radius (an executor loss re-derives
    it in one job at application level — the ``_pin_small`` precedent;
    contrast the corpus-scale iterative operators, which stay on
    reliable checkpoints). False returns the lazy composable plan (plan
    tests; zero persists)."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    if materialize:
        tf = tf.persist()
        try:
            return _unigram_from_tf(tf).localCheckpoint(eager=True)
        finally:
            tf.unpersist()
    return _unigram_from_tf(tf)


def _unigram_from_tf(tf: DataFrame) -> DataFrame:
    """vocab → smoothed logprob model → per-doc mean, over a (doc_id,
    tok, c) term-frequency table (see :func:`text_unigram_logprob`)."""
    vocab = tf.groupBy("tok").agg(F.sum("c").alias("c_tok"))
    tot = vocab.agg(
        F.sum("c_tok").alias("n"), F.count(F.lit(1)).alias("v")
    )
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.round(
            F.round(F.log((F.col("c_tok") + 1) / (F.col("n") + F.col("v"))), 6)
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("lp_e6"),
    )
    per_doc = (
        tf.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lp_e6")).alias("s"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.col("s").cast("double") / F.col("n_tokens") / F.lit(1_000_000.0), 6
        ).alias("avg_logprob"),
    )


@query(
    "text_source_quality",
    oracle="""
    WITH h AS (
      SELECT source, md5(text) AS hh, n_chars,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS toks
      FROM documents
    ),
    c AS (SELECT hh, count(*) AS cnt FROM h GROUP BY hh)
    SELECT h.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
           round(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
             AS dup_rate,
           round(avg(h.n_chars), 6) AS avg_chars,
           CAST(sum(h.toks) AS BIGINT) AS total_tokens
    FROM h JOIN c USING (hh)
    GROUP BY h.source
    """,
)
def text_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard: document count, exact-duplicate
    rate (share of docs whose md5(text) occurs ≥2× corpus-wide), mean
    length, and total whitespace tokens — the aggregate that feeds
    source-mixture planning (``source_mixture_sample`` fractions are set
    from exactly these numbers in a real pipeline).

    Plan: one shuffle for the corpus-wide content-hash counts, a
    co-partitioned join back on the hash (AQE skew-split handles
    boilerplate heavy-hitters), then a tiny per-source aggregate. Token
    and char sums ride the same scan."""
    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.md5(F.col("text")).alias("hh"),
        "n_chars",
        tx.token_count(F.col("text")).cast("long").alias("toks"),
    )
    c = d.groupBy("hh").agg(F.count(F.lit(1)).alias("cnt"))
    is_dup = (F.col("cnt") > 1).cast("int")
    return (
        d.join(c, on="hh")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(is_dup).alias("dup_docs"),
            F.round(F.sum(is_dup).cast("double") / F.count(F.lit(1)), 6).alias(
                "dup_rate"
            ),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.sum("toks").alias("total_tokens"),
        )
    )


@query(
    "text_bigram_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      FROM toks, unnest(range(1, len(t))) AS r(i)
      WHERE t[i] != '' AND t[i+1] != ''
    )
    SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM grams GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 50
    """,
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts (the n-gram language-model building block),
    top-50 with deterministic tie-break. Bigrams come from one slice pass
    over the token array (transform over indices — no self-join of token
    positions); the top-k is TakeOrderedAndProject: per-partition heaps,
    k-row driver merge, no global sort."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.col("text")), r"\s+")
    grams = (
        d.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 2),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i + 1).alias("a"),
                        F.element_at(F.col("t"), i + 2).alias("b"),
                    ),
                )
            ).alias("g"),
        )
        .filter((F.col("g.a") != "") & (F.col("g.b") != ""))
        .select("doc_id", F.concat_ws(" ", F.col("g.a"), F.col("g.b")).alias("bigram"))
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Train-set decontamination (eval-leak detection)
# ---------------------------------------------------------------------------

_DECONTAM_N = 5

_DECONTAM_ORACLE = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 != 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             text || ' near duplicate trailing marker' AS text
      FROM documents WHERE doc_id % 97 = 0
    ),
    bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
    ct AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM corpus),
    cg AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS g
        FROM ct WHERE len(t) >= 5
      )
    ),
    bt AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM bench),
    bg AS (
      SELECT DISTINCT g FROM (
        SELECT unnest(list_transform(range(1, len(t) - 3),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS g
        FROM bt WHERE len(t) >= 5
      )
    ),
    sizes AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY doc_id),
    hits AS (
      SELECT cg.doc_id, count(*) AS shared_ngrams
      FROM cg JOIN bg USING (g) GROUP BY cg.doc_id
    )
    SELECT h.doc_id, s.n_grams, h.shared_ngrams,
           round(h.shared_ngrams::DOUBLE / s.n_grams, 6) AS overlap_frac
    FROM hits h JOIN sizes s USING (doc_id)
"""


@query("pipe_decontaminate", oracle=_DECONTAM_ORACLE)
def pipe_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-set decontamination (operators/dedup.decontaminate_against):
    flag corpus documents sharing word 5-grams with a held-out
    benchmark set. Fixture: docs with doc_id %% 97 == 0 act as the
    benchmark; the corpus is everything else PLUS a contaminated variant
    of each benchmark doc (id + 1e6, trailing-marker suffix) — modeling
    eval text embedded verbatim in crawl documents. Every contaminated
    variant must surface with overlap_frac near 1; organic 5-gram
    collisions surface too (same in the oracle).

    Scale: benchmark n-gram set is eval-sized and BROADCAST; the corpus
    side is one scan + broadcast join + doc-keyed aggregate. Production
    runs use n=13 (the GPT-3/PaLM wash); the fixture uses 5 so the
    synthetic corpus has measurable organic overlap."""
    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    contaminated = bench.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near duplicate trailing marker")).alias(
            "text"
        ),
    )
    corpus = d.filter(F.col("doc_id") % 97 != 0).unionByName(contaminated)
    return dd.decontaminate_against(
        corpus, bench, "text", "doc_id", n=_DECONTAM_N
    )


# ---------------------------------------------------------------------------
# Iterative graph analytics: fixed-point PageRank (operators/graph.py)
# ---------------------------------------------------------------------------

_PAGERANK_ROUNDS = 10

_PAGERANK_ORACLE = """
    WITH e AS (
      SELECT DISTINCT src, dst FROM (
        SELECT l_suppkey AS src, l_partkey + 10000000 AS dst FROM lineitem
        UNION ALL
        SELECT l_partkey + 10000000 AS src, l_suppkey AS dst FROM lineitem)
    ),
    nodes AS (SELECT DISTINCT id FROM
      (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
    params AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT id, 1000000000000 // (SELECT n FROM params) AS rank FROM nodes),
    r1 AS (
      SELECT n.id,
             CAST(((1000000000000 // (SELECT n FROM params)) * 15) // 100
             + (COALESCE(SUM(r.rank // d.deg), 0) * 85) // 100 AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.id
      LEFT JOIN r0 r ON r.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    ),
    r2 AS (
      SELECT n.id,
             CAST(((1000000000000 // (SELECT n FROM params)) * 15) // 100
             + (COALESCE(SUM(r.rank // d.deg), 0) * 85) // 100 AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.id
      LEFT JOIN r1 r ON r.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    ),
    r3 AS (
      SELECT n.id,
             CAST(((1000000000000 // (SELECT n FROM params)) * 15) // 100
             + (COALESCE(SUM(r.rank // d.deg), 0) * 85) // 100 AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.id
      LEFT JOIN r2 r ON r.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    ),
    r4 AS (
      SELECT n.id,
             CAST(((1000000000000 // (SELECT n FROM params)) * 15) // 100
             + (COALESCE(SUM(r.rank // d.deg), 0) * 85) // 100 AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.id
      LEFT JOIN r3 r ON r.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    ),
    r5 AS (
      SELECT n.id,
             CAST(((1000000000000 // (SELECT n FROM params)) * 15) // 100
             + (COALESCE(SUM(r.rank // d.deg), 0) * 85) // 100 AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.id
      LEFT JOIN r4 r ON r.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    ),
    r6 AS (
      SELECT n.id,
             CAST(((1000000000000 // (SELECT n FROM params)) * 15) // 100
             + (COALESCE(SUM(r.rank // d.deg), 0) * 85) // 100 AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.id
      LEFT JOIN r5 r ON r.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    ),
    r7 AS (
      SELECT n.id,
             CAST(((1000000000000 // (SELECT n FROM params)) * 15) // 100
             + (COALESCE(SUM(r.rank // d.deg), 0) * 85) // 100 AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.id
      LEFT JOIN r6 r ON r.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    ),
    r8 AS (
      SELECT n.id,
             CAST(((1000000000000 // (SELECT n FROM params)) * 15) // 100
             + (COALESCE(SUM(r.rank // d.deg), 0) * 85) // 100 AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.id
      LEFT JOIN r7 r ON r.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    ),
    r9 AS (
      SELECT n.id,
             CAST(((1000000000000 // (SELECT n FROM params)) * 15) // 100
             + (COALESCE(SUM(r.rank // d.deg), 0) * 85) // 100 AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.id
      LEFT JOIN r8 r ON r.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    ),
    r10 AS (
      SELECT n.id,
             CAST(((1000000000000 // (SELECT n FROM params)) * 15) // 100
             + (COALESCE(SUM(r.rank // d.deg), 0) * 85) // 100 AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.id
      LEFT JOIN r9 r ON r.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    )
    SELECT id, rank FROM r10
"""


@query("graph_pagerank", oracle=_PAGERANK_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point PageRank (operators/graph.pagerank), 10
    rounds over the supplier↔part co-occurrence graph derived from
    lineitem (edges both directions, distinct). Every transfer is
    explicit floor division on integer micro-mass, so all 10
    unrolled oracle rounds match value-by-value — the float formulation
    would diverge on summation order alone. Per round: one co-partitioned
    rank-onto-edges join + one dst aggregate, rank table reliable-
    checkpointed (O(1) lineage, the iterative-job discipline shared with
    connected components and the k-means loop)."""
    from dbt_ci_demo_spark.operators import graph as gr

    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    fwd = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + 10000000).alias("dst"),
    )
    edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return gr.pagerank(edges, rounds=_PAGERANK_ROUNDS)


@query(
    "text_ccnet_buckets",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS c
      FROM toks WHERE tok != '' GROUP BY doc_id, tok
    ),
    vocab AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS c_tok FROM tf GROUP BY tok),
    tot AS (SELECT CAST(SUM(c_tok) AS BIGINT) AS n, count(*) AS v FROM vocab),
    lp AS (
      SELECT tok,
             CAST(round(round(ln((c_tok + 1)::DOUBLE / (t.n + t.v)), 6) * 1000000.0)
                  AS BIGINT) AS lp_e6
      FROM vocab CROSS JOIN tot t
    ),
    per_doc AS (
      SELECT f.doc_id,
             CAST(SUM(f.c) AS BIGINT) AS n_tokens,
             CAST(SUM(f.c * l.lp_e6) AS BIGINT) AS s
      FROM tf f JOIN lp l ON l.tok = f.tok
      GROUP BY f.doc_id
    ),
    scored AS (
      SELECT p.doc_id, d.lang, p.n_tokens,
             round(p.s::DOUBLE / p.n_tokens / 1000000.0, 6) AS avg_logprob
      FROM per_doc p JOIN documents d USING (doc_id)
    ),
    nt AS (
      SELECT *, ntile(3) OVER (PARTITION BY lang
                               ORDER BY avg_logprob DESC, doc_id) AS b
      FROM scored
    )
    SELECT doc_id, lang, n_tokens, avg_logprob,
           CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM nt
    """,
)
def text_ccnet_buckets(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """CCNet-style corpus partitioning: per LANGUAGE, documents ranked by
    unigram-LM fluency (text_unigram_logprob's score) and split into
    head/middle/tail thirds — the bucketing public pipelines use to keep
    head outright, re-filter middle, and drop tail. The oracle states the
    semantics as ntile(3) over (score desc, doc_id); the engine COMPUTES
    the identical buckets by histogram threshold selection (the
    `samp_quota_threshold` pattern), because an ntile window partitioned
    by language sorts each whole language stratum in ONE reduce task — a
    90%-English corpus funnels 90% of its rows into a single window
    partition that no ``WindowGroupLimit`` can bound (found by the r07
    second-pass window-skew audit, SCALE.md).

    Plan (see :func:`tercile_buckets` for the full design): after the
    unigram scoring shuffles, the per-lang (n, min, max) stats and the
    1024-equi-width-bin histogram are COLLECTED (bounded: one row per
    language, ≤ langs·1024 histogram rows — the driver-held model-state
    pattern the Lloyd rewrite established), the SQL-standard tercile
    boundary ranks and boundary bins resolve in Python, and the corpus
    pass carries the bin expression and boundary thresholds as literal
    CASE chains: rows outside the two boundary bins take their bucket
    scan-side with NO shuffle, and only boundary-bin rows (~stratum/
    1024) are ranked in a (lang, bin)-partitioned — bounded — window,
    the in-bin (score desc, doc_id) rank plus the bin's cumulative
    offset reproducing the global row_number exactly, ties included
    (equal scores always share a bin, so the doc_id tie-break happens
    entirely inside the bounded window). Degenerate-distribution
    caveat: a language whose scores are ALL identical collapses to one
    bin and its whole stratum ranks in one task (recurse the histogram
    on doc_id if a real corpus ever looks like that); any score spread
    at all restores the 1024-fold bound.

    ``materialize=False`` returns the un-checkpointed plan (same
    contract as ``minhash_near_duplicates``) so plan tests can inspect
    the bucket plan's window shapes — an eager checkpoint truncates the
    visible plan to a ``Scan ExistingRDD``. (The two bounded threshold
    collects still run either way; only the corpus pass stays lazy.)"""
    # Thread materialize through: the eager path gets the scores already
    # checkpointed (one tokenize pass, r14), while the lazy plan-test
    # path keeps the full scoring lineage visible (the whitelist's
    # InMemoryRelation-prints-the-BNLJ contract relies on it).
    scores = text_unigram_logprob(spark, sf_dir, materialize=materialize)
    langs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    if not materialize:
        return tercile_buckets(scores.join(langs, "doc_id"))
    # The scoring pipeline is the expensive subtree and the bucket plan
    # references it several times (stats, histogram, assignment). The
    # pin is the fault-tolerant persist(MEMORY_AND_DISK) (r10, ADVICE
    # r09): the slim 4-column table materializes once — inside the
    # stats collect — and the histogram job plus both union branches
    # read the cached blocks. Because this branch MATERIALIZES the
    # result (eager checkpoint), the pinned input is dead weight
    # afterwards, so this caller owns the pin and unpersists it —
    # bounded cache lifetime, unlike the operator-internal default
    # whose CacheManager entry lives until clearCache (fine for the
    # lazy/compose path, wasteful after an eager materialization).
    from dbt_ci_demo_spark.operators.sampling import _pin_corpus

    scored = _pin_corpus(scores.join(langs, "doc_id"))
    try:
        # Doc-sized result, bounded blast radius: localCheckpoint skips
        # the reliable checkpoint's disk write+read round-trip (r15,
        # the text_unigram_logprob rationale above).
        return tercile_buckets(scored, pin_input=False).localCheckpoint(
            eager=True
        )
    finally:
        scored.unpersist()


def tercile_buckets(
    scored: DataFrame,
    score_col: str = "avg_logprob",
    id_col: str = "doc_id",
    strata_cols: list[str] | None = None,
    n_bins: int = 1024,
    pin_input: bool = True,
) -> DataFrame:
    """Exact ntile(3)-per-stratum bucket assignment ('head'/'middle'/
    'tail') WITHOUT a stratum-sized window — the bounded plan behind
    :func:`text_ccnet_buckets`, factored out so tests pin the production
    code. Decision-identical to
    ``ntile(3) OVER (PARTITION BY strata ORDER BY score DESC, id)``
    (property-tested across tie regimes, tiny strata, and bin counts).

    A thin labeling wrapper over the generic driver-held-threshold
    engine :func:`dbt_ci_demo_spark.operators.sampling.ntile_histogram`
    (see there for the full plan design: k-row stats + ≤k·n_bins
    histogram collected, literal CASE-chain thresholds, one bounded
    (stratum, bin)-partitioned edge window, ~stratum/n_bins ranked
    rows). Descending score order — the highest-fluency third is
    'head'."""
    from dbt_ci_demo_spark.operators.sampling import ntile_histogram

    strata = list(strata_cols) if strata_cols is not None else ["lang"]
    t = ntile_histogram(
        scored,
        3,
        score_col,
        id_col,
        strata,
        n_bins=n_bins,
        ascending=False,
        tile_col="__tile",
        pin_input=pin_input,
    )
    return t.select(
        *scored.columns,
        F.when(F.col("__tile") == 1, F.lit("head"))
        .when(F.col("__tile") == 2, F.lit("middle"))
        .when(F.col("__tile") == 3, F.lit("tail"))
        .otherwise(F.lit(None).cast("string"))
        .alias("bucket"),
    )


_SENT_PAT = r"((?:\S+ ){5}\S+) "


@query(
    "text_sentence_chunks",
    oracle=r"""
    WITH sent AS (
      SELECT doc_id,
             list_filter(string_split_regex(
               regexp_replace(text, '((?:\S+ ){5}\S+) ', '\1. ', 'g'),
               '[.!?]+\s+'), s -> s <> '') AS s
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, s, CAST(st AS BIGINT) AS st
      FROM sent, unnest(range(1, len(s) + 1, 2)) AS r(st)
      WHERE len(s) > 0
    )
    SELECT doc_id,
           (st - 1) // 2 AS chunk_idx,
           CAST(least(3, len(s) - st + 1) AS BIGINT) AS n_sentences,
           array_to_string(list_slice(s, st, st + 2), ' ') AS chunk_text
    FROM chunks
    """,
)
def text_sentence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-aware overlapping chunking (operators/text.
    sentence_chunks): the RAG / long-context prep stage — 3-sentence
    windows every 2 sentences (1-sentence overlap) so no boundary
    context is lost. The fixture corpus has no punctuation, so both
    engines first sentence-ify it identically (a period after every 6th
    token via the same regex; only the replacement-group SYNTAX differs
    between Java regex and RE2). One codegen'd projection + explode —
    no shuffle at any corpus size; every chunk's text is byte-compared
    against the oracle."""
    d = _docs(spark, sf_dir)
    sentenced = d.select(
        "doc_id",
        F.regexp_replace(F.col("text"), _SENT_PAT, "$1. ").alias("text"),
    )
    return tx.sentence_chunks(
        sentenced, "text", "doc_id", sentences_per_chunk=3, stride=2
    )


def _ivf_quantized_oracle() -> str:
    # Float centroid probe (the existing IVF shape) + int8 candidate
    # scoring (the quantization CTE): the composition sim.ivf_topk_int8
    # implements. Zero-norm guards mirror the operator.
    return f"""
    WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    pos AS (
      SELECT label, unnest(v) AS val, unnest(range(1, len(v) + 1)) AS pos FROM base
    ),
    means AS (
      SELECT label, pos,
             CAST(SUM(CAST(round(val * 1000000.0) AS BIGINT)) AS DOUBLE) / count(*) / 1000000.0 AS mean
      FROM pos GROUP BY label, pos
    ),
    cents AS (
      SELECT label AS cluster, list(mean ORDER BY pos) AS centroid
      FROM means GROUP BY label
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5),
    qc AS (
      SELECT query_id, cluster,
             {_COS.format(a='qv', b='centroid')} AS ccos
      FROM q, cents
    ),
    probes AS (
      SELECT query_id, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY ccos DESC, cluster) AS crank
        FROM qc
      ) WHERE crank <= 2
    ),
    m AS (
      SELECT vec_id, label, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM base
    ),
    qz AS (
      SELECT vec_id, label,
             CASE WHEN scale > 0
                  THEN list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
                  ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
      FROM m
    ),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             round(CASE WHEN list_inner_product(qs.q, qs.q) > 0
                         AND list_inner_product(c.q, c.q) > 0
                   THEN list_inner_product(qs.q, c.q)::DOUBLE /
                        (sqrt(list_inner_product(qs.q, qs.q)::DOUBLE)
                         * sqrt(list_inner_product(c.q, c.q)::DOUBLE))
                   ELSE 0.0 END, 6) AS cosine_r
      FROM qz c
      JOIN probes p ON c.label = p.cluster
      JOIN qz qs ON qs.vec_id = p.query_id
      WHERE c.vec_id != p.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_r DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine_r, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """


@query("sim_ivf_quantized", oracle=_ivf_quantized_oracle)
def sim_ivf_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with int8 candidate scoring (operators/similarity.
    ivf_topk_int8): the probe ranks the tiny float centroid table, and
    the corpus-sized within-cluster ranking runs on integer dot products
    of the quantized codes — the production composition where the stage
    that touches the corpus moves 4× less data. Every (neighbor, score,
    rank) oracle-checked against the identical float-probe + int8-score
    pipeline in DuckDB."""
    emb = _t(spark, sf_dir, "embeddings")
    out = sim.ivf_topk_int8(
        emb, emb.filter(F.col("vec_id") < 5), "label", k=5, n_probe=2
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


def _gopher_oracle() -> str:
    stop_hits = " + ".join(
        f"CASE WHEN regexp_matches(lower(text), '\\b{w}\\b') THEN 1 ELSE 0 END"
        for w in tx.GOPHER_STOPWORDS
    )
    return f"""
    WITH m AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks,
             list_filter(string_split_regex(text, '\\n'), x -> x <> '') AS lines,
             CAST(len(regexp_extract_all(text, '#')) AS BIGINT)
               + CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS n_sym,
             ({stop_hits}) AS stop_hits
      FROM documents
    ),
    r AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             round(CASE WHEN len(toks) > 0 THEN
               list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT)))::DOUBLE
               / len(toks) ELSE 0.0 END, 6) AS mean_word_len,
             round(CASE WHEN len(toks) > 0 THEN n_sym::DOUBLE / len(toks)
                   ELSE 0.0 END, 6) AS symbol_word_ratio,
             round(CASE WHEN len(lines) > 0 THEN
               len(list_filter(lines, x -> regexp_matches(x, '^\\s*[-*•]')))::DOUBLE
               / len(lines) ELSE 0.0 END, 6) AS bullet_line_frac,
             round(CASE WHEN len(lines) > 0 THEN
               len(list_filter(lines, x -> regexp_matches(x, '\\.\\.\\.\\s*$')))::DOUBLE
               / len(lines) ELSE 0.0 END, 6) AS ellipsis_line_frac,
             round(CASE WHEN len(toks) > 0 THEN
               len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
               / len(toks) ELSE 0.0 END, 6) AS alpha_word_frac,
             CAST(stop_hits AS INTEGER) AS stopword_hits
      FROM m
    )
    SELECT *,
           (n_words BETWEEN 50 AND 100000)
           AND (mean_word_len BETWEEN 3 AND 10)
           AND symbol_word_ratio <= 0.1
           AND bullet_line_frac <= 0.9
           AND ellipsis_line_frac <= 0.3
           AND alpha_word_frac >= 0.8
           AND stopword_hits >= 2 AS keep
    FROM r
    """


@query("text_gopher_rules", oracle=_gopher_oracle)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete published Gopher document-quality ruleset
    (operators/text.gopher_rules) over the corpus: word-count bounds,
    mean word length, symbol-to-word ratio, bullet/ellipsis line
    fractions, alphabetic-word fraction, stopword presence — every
    ratio and the per-document keep decision oracle-checked. One
    codegen'd scan, zero shuffles at any corpus size."""
    return tx.gopher_rules(_docs(spark, sf_dir), "text", "doc_id")
