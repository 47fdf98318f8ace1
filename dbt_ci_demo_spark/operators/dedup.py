"""Deduplication operators for large-scale training-data pipelines.

The reference has no dedup surface (SURVEY.md §2.B.8); these extend the
engine per the driver's north star. Every operator is pure DataFrame
algebra over built-in functions — no Python UDFs — so the hot path stays
in whole-stage codegen and scales with executors.

Determinism contract: all hashing defaults to md5 (not hash()/xxhash64,
whose seeds/implementations differ between engines), so the DuckDB
oracles replicate signatures bit-for-bit. The MinHash pipeline also
offers ``hash_fn="xxhash64"`` — the JVM-native 64-bit path for
production corpora where cross-engine bit-parity is not needed; the
verification stage (exact Jaccard over shingle sets) is hash-agnostic,
so both paths return identically-scored pairs and differ only in
candidate recall at the LSH stage.

Scale design:
- exact dedup: one shuffle on the content hash.
- exact SUBSTRING dedup (span extraction): duplicated k-token windows
  via one map-side-combinable gram-hash count + output-proportional
  semi join, merged to maximal removal intervals by a doc-bounded
  gaps-and-islands window — the distributed stand-in for the
  suffix-array method (Lee et al. 2022); no corpus-sized state, no
  global window.
- MinHash+LSH: shingle explode → 1 groupBy for signatures (N min-aggs in
  one pass) → band explode → self-join on (band, band_hash) buckets →
  exact-Jaccard verification of candidates only. No O(n²) stage; the
  band join's fan-out is controlled by band width. This is the
  standard web-scale near-dup pipeline (cf. Broder's shingling/minhash
  and the GPT-3/C4 dedup recipes; PAPERS.md).
- SimHash: 32-bit signature via nibble arithmetic; candidate pairs via
  4-block banding (pigeonhole: hamming ≤ 3 ⇒ at least one equal block),
  then exact hamming filter — guaranteed recall at threshold ≤ 3, so
  results equal brute force while the join stays bucketed.
- n-gram Jaccard & embedding-cosine near-dup: exact pairwise scoring
  intended for *verification* of candidates or small corpora; the LSH
  variants are the scale path.
"""

from __future__ import annotations

import hashlib
import os
import uuid
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_ci_demo_spark.session import ensure_checkpoint_dir


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact-content duplicate groups: md5(text) → (content group, canonical
    keeper = min id, group size). One shuffle on the 128-bit hash; at 100 TB
    the hash groupBy is the only wide stage and AQE handles skew (identical
    boilerplate docs) via skew-join splitting."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def dedup_keep_first(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Surviving rows after exact dedup (min id per content hash wins)."""
    w_min = (
        df.groupBy(F.md5(F.col(text_col)).alias("__h"))
        .agg(F.min(F.col(id_col)).alias(id_col))
        .drop("__h")
    )
    return df.join(w_min, on=id_col, how="left_semi")


def word_shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Distinct word k-shingles per document: (id, shingle) rows.

    Tokenization is lowercase whitespace-split (engine-portable); documents
    with fewer than k tokens produce no shingles and are excluded from
    near-dup detection (standard behavior). The size guard matters:
    Spark's ``sequence(0, n)`` *descends* when n < 0."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    with_toks = df.select(F.col(id_col), toks.alias("__t")).filter(F.size("__t") >= k)
    shingles = F.transform(
        F.sequence(F.lit(0), F.size("__t") - k),
        lambda i: F.concat_ws(" ", F.slice(F.col("__t"), i + 1, k)),
    )
    return with_toks.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )


_MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32


def _hash32(col: Column, hash_fn: str) -> Column:
    """32-bit integer hash of a string column.

    ``md5``: first 8 hex chars → integer; bit-identical in any engine with
    md5 + base conversion (the oracle-parity path). ``xxhash64``: Spark's
    JVM-native seeded xxHash folded into 32 bits — no hex string
    materialization, no conv(), ~3× cheaper per shingle (the per-shingle
    hash dominates MinHash cost at corpus scale) but Spark-specific."""
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(1 << 32).cast("long"))
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")


def _affine_params(n: int, seed: int = 1) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the affine hash family
    h_i(x) = (a*x + b) mod P, generated by a fixed LCG so both engines
    embed identical constants. a < 2^20 keeps a*x < 2^52 — no 64-bit
    overflow under ANSI arithmetic in either engine."""
    state, out = seed, []
    for _ in range(n):
        state = (state * 1103515245 + 12345) % (1 << 31)
        a = state % ((1 << 20) - 1) + 1
        state = (state * 1103515245 + 12345) % (1 << 31)
        b = state % (1 << 20)
        out.append((a, b))
    return out


def minhash_signatures(
    shingles: DataFrame, id_col: str, n_hashes: int = 32, hash_fn: str = "md5"
) -> DataFrame:
    """MinHash signature per document: ONE md5 per shingle → 32-bit integer
    (first 8 hex chars), then n_hashes affine hashes (a_i*h + b_i) mod P —
    the classic universal-hash family. One groupBy computes all N mins in
    one pass with map-side partial aggregation. Versus hashing the shingle
    text n_hashes times, this cuts per-shingle hashing cost ~n_hashes×,
    which dominates the pipeline at corpus scale (the shingle table is by
    far the largest intermediate)."""
    # Materialize h in a projection ahead of the aggregate: the hash
    # appears once in the plan instead of inside all n_hashes agg
    # expressions (subexpression elimination across aggregates is not
    # guaranteed), so each shingle row is hashed exactly once.
    hashed = shingles.withColumn("__h", _hash32(F.col("shingle"), hash_fn))
    h = F.col("__h")
    aggs = [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(_MINHASH_PRIME)).alias(f"sig_{i}")
        for i, (a, b) in enumerate(_affine_params(n_hashes))
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def banded_buckets(
    signatures: DataFrame, id_col: str, n_hashes: int = 32, bands: int = 8,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, band_id, band_hash) rows: the signature split into ``bands``
    bands of ``n_hashes // bands`` rows, each band hashed to a bucket key.
    This is the precomputable, storable artifact of LSH — a production
    corpus keeps its band table materialized and new batches join against
    it (see :func:`minhash_near_duplicates_against`).

    ``bands`` must divide ``n_hashes`` exactly: a remainder would
    silently drop the trailing signature rows from every band key,
    weakening LSH recall with no visible symptom (the no-silent-caps
    discipline; r11 review)."""
    if bands < 1 or n_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must be >= 1 and divide n_hashes={n_hashes} "
            "exactly — a remainder silently drops trailing signature rows "
            "from every band"
        )
    rows = n_hashes // bands

    def band_hash(cols: list[Column]) -> Column:
        if hash_fn == "xxhash64":
            # Native multi-arg hash: no string concat materialized at all.
            return F.xxhash64(*cols).cast("string")
        return F.md5(F.concat_ws("|", *cols))

    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            band_hash([F.col(f"sig_{b * rows + r}") for r in range(rows)]).alias(
                "band_hash"
            ),
        )
        for b in range(bands)
    ]
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("b")
    ).select(id_col, "b.band_id", "b.band_hash")


def lsh_pairs_from_buckets(banded: DataFrame, id_col: str) -> DataFrame:
    """The band-bucket self-join of :func:`lsh_candidate_pairs`, factored
    over an already-built (id, band_id, band_hash) table so callers that
    hold the band table (a pin, or the stored index artifact) pay the
    signature aggregation ONCE: the self-join references its input from
    both sides, and the two subtrees do not share execution (one side
    plans as a BroadcastExchange — there is no exchange to reuse), so an
    un-pinned input re-runs the whole shingle→signature→band derivation
    per side (r14; guide §2.4 duplicated-subtree class)."""
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, n_hashes: int = 32, bands: int = 8,
    hash_fn: str = "md5",
) -> DataFrame:
    """LSH banding: document pairs sharing any (band_id, band_hash)
    bucket. The self-join shuffles on the band hash — bucket sizes are
    the scale knob, not corpus size²."""
    banded = banded_buckets(signatures, id_col, n_hashes, bands, hash_fn)
    return lsh_pairs_from_buckets(banded, id_col)


def jaccard_scores(
    shingles: DataFrame, id_col: str, pairs: DataFrame,
    sizes: DataFrame | None = None,
    prefiltered: bool = False,
) -> DataFrame:
    """Exact Jaccard similarity for candidate pairs from their distinct
    shingle sets: |A∩B| / (|A|+|B|-|A∩B|). Joins are keyed by document id
    (candidates) and shingle (intersection) — both co-partitioned shuffles.

    Two plans, chosen by whether ``sizes`` is provided:

    - ``sizes=None`` (self-dedup / first build): per-doc counts are
      aggregated from the full shingle table. That aggregate and the
      candidate generation are INDEPENDENT subtrees, so their stages run
      concurrently — serializing them behind a candidate semi-join was
      measured ~2× slower end-to-end on the minhash bench rows, and the
      intersection join is already candidate-proportional (``pairs`` is
      small and broadcasts onto the shingle scan).
    - ``sizes`` given (the stored per-doc count artifact of
      :func:`build_minhash_index` — the ADMISSION path): the shingle
      table is the corpus-sized index read back from parquet, so here
      the corpus-wide count aggregate would be pure waste; instead the
      shingle table is semi-joined down to the (broadcast) candidate-id
      set before the intersection join, and the counts come from the
      artifact. No stage aggregates or shuffles the full corpus.

    ``prefiltered`` (r15, sizes path only): the caller already restricted
    ``shingles`` to the candidate-id set (and typically PERSISTED the
    restricted table), so the semi-join here would be a redundant second
    derivation of the candidate ids — skip it. Without a caller-side pin
    the un-persisted semi-join subtree is referenced twice below
    (``sh_a``/``sh_b``) and the stored shingle index is scanned twice per
    admission (guide §2.4 duplicated-subtree class)."""
    sh = shingles
    if sizes is None:
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    elif prefiltered:
        pass  # caller restricted (and pinned) the shingle table already
    else:
        ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .unionByName(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        sh = shingles.join(F.broadcast(ids), on=id_col, how="left_semi")
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sh_a, on="id_a")
        .join(sh_b, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(inter, on=["id_a", "id_b"], how="left")
        .join(na, on="id_a")
        .join(nb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    hash_fn: str = "md5",
    materialize: bool = True,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle → signature → banded
    candidates → exact-Jaccard verification ≥ threshold.

    ``hash_fn="md5"`` (default) is bit-reproducible across engines — the
    oracle-gate path. ``hash_fn="xxhash64"`` is the production path for
    Spark-only corpora: same verified output semantics (Jaccard scoring is
    hash-agnostic), JVM-native hashing at the dominant (per-shingle) stage.

    The shingle table feeds two branches (signatures and the exact-Jaccard
    verifier); persisting it computes the explode+dedup scan once instead
    of twice — at corpus scale the shingle table is the dominant
    intermediate, so this halves the heaviest stage (MEMORY_AND_DISK:
    spills rather than OOMs on big partitions).

    With ``materialize=True`` (default) the result — the near-dup pair
    list, tiny relative to the shingle table — is eagerly computed and
    reliable-checkpointed (lineage truncated to the checkpoint files), and
    the shingle cache is unpersisted before returning: no invocation
    leaves anything pinned in executor storage. ``materialize=False``
    returns the lazy plan WITHOUT any persist — composable, nothing to
    leak, at the cost of recomputing the shingle scan per branch."""
    if not materialize:
        sh = word_shingles(df, text_col, id_col, k)
        sig = minhash_signatures(sh, id_col, n_hashes, hash_fn)
        cand = lsh_candidate_pairs(sig, id_col, n_hashes, bands, hash_fn)
        return jaccard_scores(sh, id_col, cand).filter(F.col("jaccard") >= threshold)
    ensure_checkpoint_dir(df.sparkSession)
    sh = word_shingles(df, text_col, id_col, k).persist()
    # The candidate-pair table is referenced TWICE inside jaccard_scores
    # (the intersection join and the final pair join), and Spark's
    # exchange reuse does not cover the subtree (verified: the executed
    # plan holds zero ReusedExchange nodes), so un-persisted the
    # 32-min signature aggregate + band self-join execute twice per
    # action over the corpus-scale shingle cache. Persisting the tiny
    # candidate table makes that subtree run once — the index path's
    # existing precedent. Honest A/B (r11, fresh-JVM min-of-5 at sf0.1,
    # canary-normalized): local wall ≈ parity (2.54 vs 2.49 — the
    # duplicated subtree is latency-hidden at this scale); the change is
    # kept for the STRUCTURAL claim, which is what matters at 100 TB
    # where a second pass over the dominant intermediate is real cluster
    # cost. cand is output-proportional, never corpus-sized; unpersisted
    # in the finally, so nothing outlives the call.
    cand = None
    banded = None
    try:
        sig = minhash_signatures(sh, id_col, n_hashes, hash_fn)
        # Pin the slim band table (≈bands rows per doc of (id, band_id,
        # band_hash)) before the bucket self-join: the join references it
        # from BOTH sides and the subtrees share no execution (one side is
        # a BroadcastExchange — nothing to reuse), so un-pinned the
        # 32-min signature aggregate over the corpus-scale shingle cache
        # runs TWICE per candidate materialization (r14; fresh-JVM probes
        # read −13% on dedup_minhash_lsh, −7% on the xxhash64 row —
        # latency-hidden locally, but at corpus scale the avoided second
        # signature pass over the dominant intermediate is real cluster
        # cost). Same bounded lifetime as cand.
        banded = banded_buckets(sig, id_col, n_hashes, bands, hash_fn).persist()
        cand = lsh_pairs_from_buckets(banded, id_col).persist()
        out = jaccard_scores(sh, id_col, cand).filter(F.col("jaccard") >= threshold)
        return out.checkpoint(eager=True)
    finally:
        sh.unpersist()
        if banded is not None:
            banded.unpersist()
        if cand is not None:
            cand.unpersist()


def build_minhash_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    hash_fn: str = "md5",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Precompute the STORABLE near-dup index of a corpus: the distinct
    shingle table (id, shingle), the banded-bucket table
    (id, band_id, band_hash), and the per-doc shingle-count table
    (id, n). All three are plain DataFrames meant to be written to
    parquet once per corpus build; daily batch admission then reads them
    back and passes them to :func:`minhash_near_duplicates_against` as
    ``corpus_index`` — turning the per-batch cost into batch-sized work
    plus index-reads, with NO recomputation over the corpus: the sizes
    artifact in particular removes the corpus-wide per-doc count
    aggregate from the admission path's Jaccard verifier. The index must
    be rebuilt with the same (k, n_hashes, bands, hash_fn) that the
    admission call uses; the band table keys are meaningless across
    differing parameters."""
    sh = word_shingles(df, text_col, id_col, k)
    bd = banded_buckets(
        minhash_signatures(sh, id_col, n_hashes, hash_fn), id_col, n_hashes, bands, hash_fn
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    return sh, bd, sizes


_INDEX_PARTS = ("shingles", "bands", "sizes")


def _index_fs(spark: SparkSession, base_path: str):
    """Hadoop FileSystem + Path factory for the index location (works on
    any scheme, not just local disk — the materialize._scrub_location
    idiom)."""
    jvm = spark._jvm
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(base_path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path_cls


def write_minhash_index(
    df: DataFrame | None,
    text_col: str,
    id_col: str,
    base_path: str,
    mode: str = "overwrite",
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    hash_fn: str = "md5",
    batch_id: str | None = None,
    artifacts: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> None:
    """Write (``mode="overwrite"``) or REFRESH (``mode="append"``) the
    stored near-dup index at ``base_path`` — three parquet tables,
    ``shingles/``, ``bands/``, ``sizes/`` (the
    :func:`build_minhash_index` artifacts).

    The append mode is the daily-admission refresh: after a batch is
    admitted via :func:`minhash_near_duplicates_against`, appending the
    batch's own per-doc artifacts makes the stored index serve
    corpus ∪ batch for the NEXT admission. The refresh is EXACT, not
    approximate, because none of the three artifacts aggregates across
    documents — shingles are per-doc distinct rows, band hashes are
    per-doc, sizes are per-doc counts — so
    index(corpus ∪ batch) = index(corpus) ∪ index(batch) row-for-row,
    and a refresh costs O(|batch|) compute + writes while the corpus
    partitions are never read or rewritten. (This is why the index
    never needs a rebuild for pure appends; deletions/edits still
    require one.) Parameters must match every write to the same
    ``base_path`` — band keys are meaningless across differing
    (k, n_hashes, bands, hash_fn).

    Failure / retry contract (ADVICE r12): an append never writes into
    the live artifact dirs directly. The three artifacts are staged to
    ``_staging-<token>/`` under ``base_path``, then PROMOTED by per-file
    rename (cheap metadata ops; each promoted file carries the batch
    token as a name prefix), and — when ``batch_id`` is supplied — a
    commit marker lands at ``_appends/<token>`` last. With a
    ``batch_id``, the append is idempotent and retry-exact: a repeated
    call whose marker exists is a no-op, and a retry after a mid-promote
    failure first scrubs the exact files its token promoted before
    re-staging, so no duplicate per-doc rows can survive (duplicate
    sizes rows would otherwise multiply pairs in jaccard_scores on the
    admission path). WITHOUT a ``batch_id`` a failed append cannot be
    retried exactly — rebuild with ``mode="overwrite"`` (which is itself
    retry-idempotent: it replaces every artifact, INCLUDING the append
    protocol's byproducts — commit markers under ``_appends/`` and any
    stale ``_staging-*`` debris are scrubbed before the rewrite, so a
    batch_id used before a rebuild can be replayed against the rebuilt
    index and is not silently swallowed by a stale marker; ADVICE r13).
    The marker is O(1) metadata; no corpus partition is ever read for
    the guard.

    Concurrency contract: appends with DIFFERENT batch_ids may run
    concurrently (disjoint staging dirs, disjoint name prefixes,
    disjoint markers), but the protocol is not a snapshot-isolated
    commit — a reader that lists the live dirs DURING a promote can see
    a batch's artifacts partially (e.g. its bands but not yet its
    sizes), which silently drops that batch's pairs from an admission
    run. Readers must therefore gate on the batch's commit marker
    (``_appends/<sha256(batch_id)[:16]>``) or serialize reads behind
    the append — the standard single-writer, read-after-commit contract
    for rename-promoted parquet artifacts. Two concurrent calls with
    the SAME batch_id are not supported (a retry must wait for the
    failed attempt to die); the rename-failure raise below turns the
    worst outcome of that race into a loud error instead of lost rows.

    ``artifacts`` (r15): precomputed (shingles, bands, sizes) frames —
    :func:`build_minhash_index` output, typically PERSISTED by the
    caller — written as-is instead of re-deriving them from ``df`` (which
    may then be ``None``). Caller-managed storage (never persisted or
    unpersisted here), same contract as ``corpus_index`` on the admission
    path. This is how a flow that admits a batch and then appends it (or
    rebuilds twice, as the crash-retry witness does) computes the
    shingle/signature aggregations ONCE instead of once per call — the
    protocol (staging, scrub, promote, marker) is identical."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be 'overwrite' or 'append', got {mode!r}")
    if artifacts is not None and len(artifacts) != len(_INDEX_PARTS):
        raise ValueError(
            f"artifacts must be (shingles, bands, sizes), got {len(artifacts)}"
        )
    spark = (df if df is not None else artifacts[0]).sparkSession
    staging: str | None = None
    write_mode = "overwrite"
    if mode == "append":
        fs, path_cls = _index_fs(spark, base_path)
        # File-name-safe token: hash the caller's batch_id (any string)
        # so it can never escape the marker/prefix namespace.
        token = (
            hashlib.sha256(batch_id.encode("utf-8")).hexdigest()[:16]
            if batch_id is not None
            else uuid.uuid4().hex[:16]
        )
        marker = path_cls(os.path.join(base_path, "_appends", token))
        if batch_id is not None and fs.exists(marker):
            return  # this batch already committed — idempotent repeat
        prefix = f"b-{token}-"
        # Scrub any files a prior PARTIAL promote of this token left in
        # the live dirs (exact: promoted names carry the prefix).
        for part in _INDEX_PARTS:
            live = path_cls(os.path.join(base_path, part))
            if fs.exists(live):
                for st in fs.listStatus(live):
                    if st.getPath().getName().startswith(prefix):
                        fs.delete(st.getPath(), False)
        staging = os.path.join(base_path, f"_staging-{token}")
        # Scrub this token's own staging debris from a crashed prior
        # attempt before re-staging (the per-part parquet overwrite
        # would clear the part dirs anyway; this also removes files a
        # partial promote already renamed OUT of, and stray leftovers
        # the part writes would never touch). ADVICE r13.
        fs.delete(path_cls(staging), True)
    else:
        # overwrite == full rebuild: every prior artifact AND every
        # append-protocol byproduct is invalid. Scrub commit markers
        # (a replayed append with a previously-used batch_id must NOT
        # no-op against the rebuilt index — ADVICE r13 medium) and all
        # stale _staging-* debris (nameless failed appends leak them
        # forever otherwise — ADVICE r13 low) BEFORE the rewrite:
        # overwrite is retry-idempotent, so a crash after this scrub
        # just means another overwrite, whereas scrubbing AFTER the
        # writes would reopen the stale-marker window on a crash
        # between the writes and the cleanup.
        fs, path_cls = _index_fs(spark, base_path)
        base = path_cls(base_path)
        if fs.exists(base):
            fs.delete(path_cls(os.path.join(base_path, "_appends")), True)
            for st in fs.listStatus(base):
                if st.getPath().getName().startswith("_staging-"):
                    fs.delete(st.getPath(), True)
    # The three artifacts all derive from the shingle table, whose
    # tokenize+explode+distinct is the dominant stage — written naively,
    # each artifact's write re-derives it (3× the dominant cost per index
    # build; the lineage re-expansion class). Persist it across the three
    # writes instead (the module's minhash_near_duplicates precedent):
    # the shingle write itself populates the cache, the band and size
    # writes consume it, and nothing outlives the call.
    out_base = staging if staging is not None else base_path
    sh = None if artifacts is not None else word_shingles(
        df, text_col, id_col, k
    ).persist()
    try:
        # The three artifact writes are INDEPENDENT actions over the one
        # persisted shingle table, so they run CONCURRENTLY from a small
        # thread pool (guide §2.6: overlap independent jobs — later jobs
        # back-fill executors freed by the current job's tail). The
        # shingle cache dedups the shared compute: BlockInfoManager gives
        # each cached partition a single writer, so whichever job reaches
        # a block first computes it and the others read it — verified by
        # row-identical artifacts under the concurrent plan. Measured at
        # sf0.1: 2.0-2.5 s sequential → 1.1-1.35 s concurrent per corpus
        # build (r14); at cluster scale the same structure overlaps the
        # sizes write with the band aggregation's stragglers.
        if artifacts is not None:
            artifact = {
                part: (lambda a=a: a)
                for part, a in zip(_INDEX_PARTS, artifacts)
            }
        else:
            artifact = {
                _INDEX_PARTS[0]: lambda: sh,
                _INDEX_PARTS[1]: lambda: banded_buckets(
                    minhash_signatures(sh, id_col, n_hashes, hash_fn),
                    id_col, n_hashes, bands, hash_fn,
                ),
                _INDEX_PARTS[2]: lambda: sh.groupBy(id_col).agg(
                    F.count(F.lit(1)).alias("n")
                ),
            }

        def _write(part: str) -> None:
            artifact[part]().write.mode(write_mode).parquet(
                os.path.join(out_base, part)
            )

        with ThreadPoolExecutor(max_workers=len(_INDEX_PARTS)) as pool:
            futures = [pool.submit(_write, part) for part in _INDEX_PARTS]
            # Let every write settle before raising, so a failure can't
            # leave sibling writes racing the caller's cleanup/retry.
            errs = [f.exception() for f in futures]
        for err in errs:
            if err is not None:
                raise err
    finally:
        if sh is not None:
            sh.unpersist()
    if staging is not None:
        # Promote: move each staged data file into its live dir under the
        # token prefix (pure renames — a failure here is repaired by the
        # scrub on retry with the same batch_id), then commit the marker.
        # The renames target DISTINCT destination names, so they are
        # independent metadata ops — run them from a small pool instead
        # of one JVM round-trip at a time (guide §2.6 applied to FS
        # metadata; a staged artifact can hold dozens of part files and
        # the per-call latency was the promote's wall time). Every future
        # settles before any raise, and a False/failed rename still keeps
        # the marker unwritten.
        renames: list[tuple] = []
        for part in _INDEX_PARTS:
            src_dir = path_cls(os.path.join(staging, part))
            dst_dir = path_cls(os.path.join(base_path, part))
            fs.mkdirs(dst_dir)
            for st in fs.listStatus(src_dir):
                name = st.getPath().getName()
                if name.startswith("_") or name.startswith("."):
                    continue  # _SUCCESS / hidden
                renames.append((st.getPath(), path_cls(dst_dir, prefix + name)))
        with ThreadPoolExecutor(max_workers=8) as pool:
            futures = [
                pool.submit(fs.rename, src, dst) for src, dst in renames
            ]
            outcomes = [
                (f.exception() or (None if f.result() else False))
                for f in futures
            ]
        for (src, dst), outcome in zip(renames, outcomes):
            # Hadoop rename reports failure by returning False, not
            # raising — an unchecked False here would leave the file
            # in staging, then commit the marker and delete staging,
            # silently losing rows with the marker blocking any
            # retry (ADVICE r13). Raise so the marker is never
            # committed over a partial promote.
            if isinstance(outcome, BaseException):
                raise outcome
            if outcome is False:
                raise IOError(
                    f"minhash index promote failed: rename {src} -> "
                    f"{dst} returned false; the commit marker was NOT "
                    "written — retry with the same batch_id to repair"
                )
        if batch_id is not None:
            fs.mkdirs(path_cls(os.path.join(base_path, "_appends")))
            fs.create(marker, True).close()
        fs.delete(path_cls(staging), True)


def read_minhash_index(
    spark: SparkSession, base_path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Read back the stored index written by :func:`write_minhash_index`,
    in the (shingles, bands, sizes) order
    :func:`minhash_near_duplicates_against` expects as ``corpus_index``."""
    sh, bd, sizes = (
        spark.read.parquet(os.path.join(base_path, p)) for p in _INDEX_PARTS
    )
    return sh, bd, sizes


def minhash_near_duplicates_against(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    hash_fn: str = "md5",
    corpus_index: tuple[DataFrame, ...] | None = None,
    broadcast_batch_bands: bool = True,
    batch_index: tuple[DataFrame, ...] | None = None,
) -> DataFrame:
    """Incremental near-dup detection: MinHash candidates between a NEW
    batch and an EXISTING corpus only — never corpus×corpus. Returns
    (id_a = corpus doc, id_b = batch doc, jaccard ≥ threshold).

    This is the production shape of continuous corpus curation: the
    corpus's band table (:func:`banded_buckets`) is a precomputable,
    storable artifact, so admitting a new batch costs
    shingle+sign+band the BATCH (delta-sized work) plus one equi-join of
    batch bands against corpus bands — a bucketed join whose cost scales
    with bucket collision counts, not |corpus|×|batch|. The full
    self-join pipeline (:func:`minhash_near_duplicates`) is the
    first-build path; this is every day after. Document ids must be
    unique across the two sides (standard for global doc ids); the
    Jaccard verifier runs on the union of both sides' shingle tables.

    Eager by design (same contract as :func:`minhash_near_duplicates`
    with ``materialize=True``): the pair result is reliable-checkpointed
    and the internally-persisted shingle caches are unpersisted before
    returning, so repeated daily admissions leave nothing pinned in
    executor storage.

    ``corpus_index`` — the (shingles, bands, sizes) artifacts from
    :func:`build_minhash_index` (a legacy (shingles, bands) pair is also
    accepted — sizes are then re-counted from the candidates' shingles),
    typically read back from parquet — skips ALL corpus-side
    computation: the corpus scan, shingling, signatures and banding
    never run, which is the true production admission cost (batch-sized
    work + index reads). The Jaccard verifier semi-joins the corpus
    shingle index down to candidate ids before anything else, so no
    stage on the index path aggregates or shuffles the full corpus.
    When provided, the corpus-side frames are used as-is (caller-managed
    storage, not persisted here); they must have been built with the
    same (k, n_hashes, bands, hash_fn).

    ``broadcast_batch_bands`` (default True, index path only): pin the
    band join's build side to the BATCH band table so the stored corpus
    band index is never shuffled — without the hint the batch side sits
    behind an aggregation whose size the planner cannot estimate, and
    the scale plan degrades to a sort-merge join over the whole index.
    Set False for a batch too large to broadcast (the join then falls
    back to the planner's shuffle strategy).

    ``batch_index`` (r15) — the batch's OWN (shingles, bands[, sizes])
    artifacts, precomputed by the caller (typically persisted
    :func:`build_minhash_index` frames that a following
    :func:`write_minhash_index` append will also write — the
    refresh-cycle flow derives them once instead of once per call).
    Caller-managed storage, same contract as ``corpus_index``: frames are
    used as-is, never persisted or unpersisted here, and must have been
    built with the same (k, n_hashes, bands, hash_fn).
    """
    ensure_checkpoint_dir(
        (batch if batch is not None else batch_index[0]).sparkSession
    )
    sizes_c = None
    if corpus_index is not None:
        sh_c, bands_c, *rest = corpus_index
        sizes_c = rest[0] if rest else None
        own = []
    else:
        sh_c = word_shingles(corpus, text_col, id_col, k).persist()
        bands_c = banded_buckets(
            minhash_signatures(sh_c, id_col, n_hashes, hash_fn), id_col, n_hashes, bands, hash_fn
        )
        own = [sh_c]
    sizes_b_pre = bands_b_pre = None
    if batch_index is not None:
        sh_b, bands_b_pre, *brest = batch_index
        sizes_b_pre = brest[0] if brest else None
    else:
        sh_b = word_shingles(batch, text_col, id_col, k).persist()
        own.append(sh_b)
    try:
        bands_b = (
            bands_b_pre
            if batch_index is not None
            else banded_buckets(
                minhash_signatures(sh_b, id_col, n_hashes, hash_fn),
                id_col, n_hashes, bands, hash_fn,
            )
        )
        if corpus_index is not None and broadcast_batch_bands:
            # Index path: the corpus band table is the STORED corpus-sized
            # artifact, and the batch side sits behind an aggregation whose
            # size estimate the planner treats as unknown — at scale the
            # unhinted plan is a sort-merge join that SHUFFLES the whole
            # corpus index, exactly the cost the stored-index design exists
            # to avoid (guide §3.1: estimates are badly wrong after
            # aggregations; hint the side you know is small). Broadcasting
            # the batch bands keeps the corpus scan shuffle-free at any
            # corpus size; pass ``broadcast_batch_bands=False`` for a
            # batch too large to broadcast (the decontaminate_against
            # escape-hatch precedent).
            bands_b = F.broadcast(bands_b)
        cand = (
            bands_c.alias("l")
            .join(
                bands_b.alias("r"),
                (F.col("l.band_id") == F.col("r.band_id"))
                & (F.col("l.band_hash") == F.col("r.band_hash")),
            )
            .select(
                F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
            )
            # jaccard_scores references cand at least twice (index path:
            # three times) and exchange reuse does not cover the band-join
            # subtree — persist the tiny output-proportional pair table
            # rather than re-run signatures + band join per use (r11; same
            # rationale and bounded lifetime as minhash_near_duplicates).
            .distinct()
            .persist()
        )
        own.append(cand)
        sizes = None
        if sizes_c is not None:
            sizes_b = (
                sizes_b_pre
                if sizes_b_pre is not None
                else sh_b.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
            )
            sizes = sizes_c.select(id_col, "n").unionByName(sizes_b)
        sh_all = sh_c.unionByName(sh_b)
        prefiltered = False
        if sizes is not None:
            # Index path: restrict the (corpus-index ∪ batch) shingle
            # union to the candidate-id set ONCE and pin the restricted
            # table (candidate-proportional, never corpus-sized).
            # jaccard_scores references its shingle input twice
            # (sh_a/sh_b); un-pinned, each reference re-runs the
            # semi-join over the stored shingle index — TWO full index
            # scans per admission where one suffices (guide §2.4;
            # measured r15: the two ~0.5 s 64-task index-scan broadcast
            # builds per admission collapse to one). Same bounded
            # lifetime as cand.
            ids = (
                cand.select(F.col("id_a").alias(id_col))
                .unionByName(cand.select(F.col("id_b").alias(id_col)))
                .distinct()
            )
            sh_all = sh_all.join(
                F.broadcast(ids), on=id_col, how="left_semi"
            ).persist()
            own.append(sh_all)
            prefiltered = True
        out = jaccard_scores(
            sh_all, id_col, cand, sizes=sizes, prefiltered=prefiltered
        ).filter(F.col("jaccard") >= threshold)
        return out.checkpoint(eager=True)
    finally:
        for cached in own:
            cached.unpersist()


def containment_candidates(
    fps: DataFrame,
    id_col: str,
    fp_col: str = "fingerprint",
    max_doc_freq: int = 20,
    min_shared: int = 2,
    min_containment: float = 0.3,
    pin_input: bool = True,
) -> DataFrame:
    """Containment/partial-overlap detection from shared winnowing
    fingerprints (the plagiarism-detection half of dedup that MinHash
    misses: resemblance ~ 0 when a short doc is wholly CONTAINED in a
    long one, but containment ~ 1).

    Input is a (id, fingerprint) table — e.g.
    :func:`dbt_ci_demo_spark.operators.text.winnow_fingerprints` output,
    one row per distinct fingerprint per document. Output:
    (id_a, id_b, shared, containment) with id_a < id_b, where
    ``containment`` = shared / min(|fps_a|, |fps_b|) — ≥ the overlap
    share of the smaller document.

    Scale shape: per-fingerprint doc-frequency is computed first and
    fingerprints outside [2, max_doc_freq] are DROPPED before the
    self-join — the "stop hash" trick: a fingerprint appearing in
    millions of documents is boilerplate whose pairs are both
    meaningless and quadratic, so the cap bounds every join bucket's
    fan-out at max_doc_freq² pairs and keeps total work linear in corpus
    size. The pair aggregation and size joins are co-partitioned
    shuffles on (id_a, id_b) / id. No all-pairs stage anywhere.

    STAGING ORDER (by design, not a bug): a document duplicated more
    than ``max_doc_freq`` times pushes ALL of its fingerprints over the
    doc-frequency cap, so its copies are invisible to this operator —
    the stop-hash cap cannot distinguish organic boilerplate from mass
    duplication. Run exact and/or MinHash dedup FIRST and feed this
    operator the survivors: after dedup each surviving doc's
    fingerprints have df reflecting genuine cross-document reuse, and
    the contained/quoting pairs reappear. The staged pipeline is
    exact-dedup → near-dedup → containment; tests pin both the blind
    spot and the staged recovery.

    ``pin_input`` (default True): this operator references ``fps`` from
    FIVE subtrees (per-doc sizes, the stop-hash df table, and both
    self-join sides through the rare filter), so an un-pinned input
    re-derives its whole lineage — the winnowing shingle/hash CPU pass —
    once per subtree (the r08 engine-wide lineage audit found 18 leaf
    scans in the registered query's plan; pinning measured ~25% faster
    even at sf0.1, and at 100 TB four redundant corpus derivations are
    the dominant cost). The pin is a lazy localCheckpoint: one
    materialization inside the first action, every subtree reads the
    computed rows. Pass False when ``fps`` is already a materialized
    table (a bare scan is cheaper re-read than copied into executor
    storage)."""
    if max_doc_freq < 2:
        raise ValueError("max_doc_freq must be >= 2 (pairs need 2 docs)")
    if pin_input:
        fps = fps.localCheckpoint(eager=False)
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    kept_fp = (
        fps.groupBy(fp_col)
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_doc_freq))
        .select(fp_col)
    )
    rare = fps.join(kept_fp, on=fp_col)
    pairs = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            (F.col(f"a.{fp_col}") == F.col(f"b.{fp_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(na, on="id_a")
        .join(nb, on="id_b")
        .select(
            "id_a",
            "id_b",
            "shared",
            F.round(
                F.col("shared").cast("double") / F.least(F.col("n_a"), F.col("n_b")), 6
            ).alias("containment"),
        )
        .filter(
            (F.col("shared") >= min_shared)
            & (F.col("containment") >= min_containment)
        )
    )


# ---------------------------------------------------------------------------
# Duplicate clustering: connected components over near-dup pairs
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b", max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components of the near-dup pair graph: (node, component)
    where component = the minimum node id reachable from the node.

    This is the step that turns pairwise near-dup *detections* into corpus
    *dedup decisions* — documents A~B and B~C must end up in one group even
    though (A, C) was never emitted as a pair.

    Pregel-style min-label propagation, all DataFrame algebra: each round
    sends every node's current label to its neighbors and takes the min.
    Converges in O(component diameter) rounds — near-dup clusters are
    dense (quasi-cliques from banding), so diameters are tiny; 25 rounds
    bounds even pathological chains of 2^25 nodes under doubling. For
    web-scale general graphs the same loop accepts the large-star/
    small-star edge rewriting (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — not needed for dedup clusters.

    Scale notes: one shuffle per round (join on src + min-agg); labels
    are RELIABLE-checkpointed each round so the plan/lineage stays O(1)
    instead of growing by one join per iteration (the classic
    iterative-algorithm OOM) — reliable (checkpoint-dir) rather than
    local checkpoints because local-checkpoint blocks can never be
    released (unpersist is a guarded no-op on them), which would pin one
    |V|-sized label table in executor storage PER ROUND for the session
    lifetime; checkpoint files live on disk and are droppable.
    Convergence detection is a 1-row aggregate, not a label-table join:
    every label is a min over (old label ∪ messages), so labels only
    ever DECREASE — sum(component) is therefore equal round-over-round
    iff every label is unchanged (monotone per element ⇒ sum is a
    rigorous fixpoint witness). One scan of the freshly-checkpointed
    label table per round instead of a |V|×|V| equi-join.
    """
    ensure_checkpoint_dir(pairs.sparkSession)
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    try:
        labels = (
            edges.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("component", F.col("id"))
            .checkpoint(eager=True)
        )
        # decimal accumulation: exact at any |V| (a wrapped long sum could
        # in principle alias two different label states)
        label_sum = labels.agg(F.sum(F.col("component").cast("decimal(38,0)"))).first()[0]
        for rounds in range(1, max_iter + 1):
            msgs = labels.join(edges, labels["id"] == edges["src"]).select(
                F.col("dst").alias("id"), F.col("component")
            )
            new_labels = (
                labels.unionByName(msgs)
                .groupBy("id")
                .agg(F.min("component").alias("component"))
                .checkpoint(eager=True)
            )
            new_sum = new_labels.agg(
                F.sum(F.col("component").cast("decimal(38,0)"))
            ).first()[0]
            labels = new_labels
            if new_sum == label_sum:
                if stats is not None:
                    stats["rounds"] = rounds
                break
            label_sum = new_sum
        else:
            raise RuntimeError(
                f"connected_components: no fixpoint in {max_iter} rounds"
            )
    finally:
        edges.unpersist()
    return labels


def connected_components_star(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b", max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components via alternating large-star/small-star edge
    rewriting (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): same (node, component=min reachable id) output as
    :func:`connected_components`, but converging in O(log diameter)
    rounds instead of O(diameter) — the variant for HIGH-DIAMETER
    general graphs (long chains, meshes), where min-label propagation
    needs one round per hop. For near-dup clusters (banding
    quasi-cliques, tiny diameters) min-label's cheaper rounds win; this
    operator exists for the general-graph case the SCALE audit calls
    out.

    Per round: large-star connects every neighbor larger than u to u's
    minimum neighborhood label (one groupBy + join), small-star does the
    same for the smaller neighbors over min-oriented edges. Both are
    key-partitioned shuffles; the edge set is reliable-checkpointed per
    round (O(1) lineage, nothing pinned in executor storage — same
    discipline as the min-label loop). Convergence = the star edge set
    reaches a fixpoint (two small anti-join counts per round)."""
    ensure_checkpoint_dir(pairs.sparkSession)
    edges = (
        pairs.filter(F.col(a_col) != F.col(b_col))
        .select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .distinct()
        .checkpoint(eager=True)
    )
    isolated = pairs.filter(F.col(a_col) == F.col(b_col)).select(
        F.col(a_col).alias("id")
    )

    # Each star step needs, per node u, the minimum of its neighborhood.
    # SKEW DISCIPLINE (r06, VERDICT r05 finding #1): this was a window min
    # over partitionBy(u) — one shuffle, but an unbounded window has no
    # map-side partial aggregation, so a supernode (or, late in
    # convergence, the component minimum, whose star edge set approaches
    # component size) funnels its ENTIRE neighborhood into one task that
    # AQE cannot split. Instead: groupBy(u).agg(min) — partial-aggregated
    # on the map side, so the exchange carries ~one row per (input
    # partition, u), never a neighborhood — joined back onto the edge
    # list. The join on u IS skew-splittable (AQE skew-join duplicates
    # the 1-row-per-u min side), so a degree-10^8 node costs a split
    # sort-merge join, not a single straggler task.

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        out = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(
                F.least(F.col("v"), F.col("m")).alias("a"),
                F.greatest(F.col("v"), F.col("m")).alias("b"),
            )
        )
        # No distinct here: small_star's groupBy-min and its final
        # distinct are duplicate-tolerant, and each round's edge set is
        # bounded by |E| with or without it — dropping the exchange saves
        # a full shuffle per round (the dedup happens once, in
        # small_star, instead of twice).
        return out.filter(F.col("a") != F.col("b"))

    def small_star(e: DataFrame) -> DataFrame:
        # orient every edge large->small: u = max endpoint, v = min
        oriented = e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        # m <= every v < u, so no least(m, u) needed here
        mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        to_min = oriented.join(mins, "u").select(
            F.col("v").alias("hi"), F.col("m").alias("lo")
        ).unionByName(
            # (u, m) is constant per u — take it from the 1-row-per-u
            # aggregate, not deg(u) duplicated join rows
            mins.select(F.col("u").alias("hi"), F.col("m").alias("lo"))
        )
        return (
            to_min.filter(F.col("hi") != F.col("lo"))
            .select(F.col("lo").alias("a"), F.col("hi").alias("b"))
            .distinct()
        )

    # Fixpoint detection (r15, VERDICT r14 #2): a round's OUTPUT is a
    # fixpoint of the alternation iff it is already a STAR FOREST — with
    # every edge oriented a < b by construction, that is exactly "every
    # b occurs once AND no value occurs as both a root (a) and a leaf
    # (b)" (each node then has at most one parent and parents are never
    # leaves). Sufficiency is mechanical: on a star forest large_star
    # maps every root u to m = min(N(u) ∪ u) = u and emits its own
    # edges, leaves have no larger neighbors, and small_star re-emits
    # each (leaf → root) unchanged. Necessity is the Kiveris et al.
    # convergence theorem (fixpoints of the alternation are star forests
    # — the assumption the label derivation below always made). Checking
    # the CURRENT round's output therefore stops one full rewrite round
    # earlier than the previous |new| == |old| ∧ anti-join-empty test,
    # which had to run an identity round just to observe equality — on
    # the 64-chain bench fixture that is one whole large+small star pass
    # (3 shuffles + checkpoint) of ~13 scheduled jobs, for the price of
    # one 2-stage aggregate per round in place of the per-round count
    # and the final anti-join.
    for rounds in range(1, max_iter + 1):
        new_edges = small_star(large_star(edges)).checkpoint(eager=True)
        stacked = new_edges.select(
            F.col("a").alias("n"), F.lit(0).alias("b_side")
        ).unionByName(
            new_edges.select(F.col("b").alias("n"), F.lit(1).alias("b_side"))
        )
        violations = (
            stacked.groupBy("n")
            .agg(F.sum("b_side").alias("nb"), F.count(F.lit(1)).alias("deg"))
            .filter((F.col("nb") > 1) | ((F.col("nb") == 1) & (F.col("deg") > 1)))
            .count()
        )
        edges = new_edges
        if violations == 0:
            if stats is not None:
                stats["rounds"] = rounds
            break
    else:
        raise RuntimeError(f"connected_components_star: no fixpoint in {max_iter} rounds")
    # at the fixpoint the edge set is a star forest: (min, v) per non-root
    labels = edges.select(F.col("b").alias("id"), F.col("a").alias("component"))
    roots = edges.select(F.col("a").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    singles = isolated.distinct().withColumn("component", F.col("id"))
    return labels.unionByName(roots).unionByName(
        singles.join(labels.select("id"), "id", "left_anti").join(
            roots.select("id"), "id", "left_anti"
        )
    )


def duplicate_clusters(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """Cluster near-dup pairs and mark survivors: (doc_id, cluster_id,
    is_survivor) for every document appearing in at least one pair; the
    cluster minimum survives, the rest are the removal set."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_survivor"),
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash32(
    df: DataFrame, text_col: str, id_col: str, hash_fn: str = "md5"
) -> DataFrame:
    """32-bit SimHash per document over distinct lowercase word tokens.

    Bit j (= 4*k + b for hex char k, bit b) of a token's 32-bit hash
    contributes +1; the signature bit is 1 iff at least half the tokens set
    it. With the default ``hash_fn="md5"`` the hash is substring/conv
    arithmetic any ANSI engine reproduces exactly (the oracle-parity path);
    ``hash_fn="xxhash64"`` is the production path — JVM-native, no hex
    string materialization, same per-token cost profile as MinHash's
    xxhash64 mode (see :func:`_hash32`)."""
    # Two signature plans, routed by MEASURED cost (sf0.1, 3-pass A/B,
    # value-identical outputs either way):
    #
    # - md5 (default): ZERO-SHUFFLE per-row signature (r06). The
    #   signature is a per-document aggregate of the document's own
    #   tokens, so it never needed the explode → token shuffle →
    #   groupBy(id) it used through r05: transform() hashes each
    #   distinct token once (separate Project so the hashed array
    #   materializes once), then 32 aggregate() folds count the bit
    #   contributions — no exchange in the signature stage at any
    #   corpus size. dedup_simhash 2.8→1.9 s: conv(substring(md5))
    #   dominates per-token cost, so skipping the explode+exchange wins.
    # - xxhash64: the EXPLODED groupBy plan. The JVM-native hash is so
    #   cheap in codegen'd row form that per-element evaluation inside
    #   higher-order lambdas costs more than the exchange it saves
    #   (measured 1.7→2.6 s the other way); the groupBy's map-side
    #   partial agg already collapses each document's contiguous token
    #   rows to one row before the shuffle, so the exploded plan's
    #   exchange is doc-sized, not token-sized. (Same asymmetry measured
    #   on MinHash — see SCALE.md.)
    #
    # Bit mapping identical in both: for md5, bit j of the signature =
    # bit 4*(7-j//4)+j%4 of v (hex char k carries place value 16^(7-k));
    # for xxhash64 the same extraction is a fixed bit permutation,
    # equally valid as a simhash bit assignment. Empty-token documents
    # produce no signature row on either plan.
    if hash_fn == "xxhash64":
        tokens = (
            df.select(
                F.col(id_col),
                F.explode(
                    F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
                ).alias("tok"),
            )
            .filter(F.col("tok") != "")
            .select(F.col(id_col), _hash32(F.col("tok"), hash_fn).alias("v"))
        )
        bit_sums = tokens.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_tok"),
            *[
                F.sum(
                    F.shiftright(F.col("v"), 4 * (7 - j // 4) + j % 4).bitwiseAND(
                        F.lit(1)
                    )
                ).alias(f"bit_{j}")
                for j in range(32)
            ],
        )
    else:
        toks = F.array_distinct(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
            )
        )
        hashed = df.select(
            F.col(id_col),
            F.transform(toks, lambda t: _hash32(t, hash_fn)).alias("__hv"),
        ).filter(F.size("__hv") > 0)
        n_tok = F.size("__hv")

        def _bit_count(j: int) -> Column:
            pos = 4 * (7 - j // 4) + j % 4
            return F.aggregate(
                F.col("__hv"),
                F.lit(0).cast("long"),
                lambda acc, v: acc + F.shiftright(v, pos).bitwiseAND(F.lit(1)),
            ).alias(f"bit_{j}")

        bit_sums = hashed.select(
            F.col(id_col), n_tok.alias("n_tok"), *[_bit_count(j) for j in range(32)]
        )
    sig = sum(
        [
            (F.when(F.col(f"bit_{j}") * 2 >= F.col("n_tok"), F.lit(2**j)).otherwise(0))
            for j in range(32)
        ],
        F.lit(0),
    ).cast("long")
    return bit_sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming (≤ 3).

    Candidates come from 4-block banding of the 32-bit signature: if two
    hashes differ in ≤ 3 bits, at least one 8-bit block is identical
    (pigeonhole), so banded candidate generation has *guaranteed* recall —
    the result provably equals brute force while the join stays bucketed.
    ``hash_fn`` is forwarded to :func:`simhash32` (md5 = oracle parity,
    xxhash64 = production).

    Pin discipline (r14, hash-routed like the signature plan itself):
    the bucket self-join references the block table from BOTH sides and
    the subtrees share no execution (one side plans as a
    BroadcastExchange — nothing to reuse; the broadcast build FINISHES
    before the probe side streams), so the signature derivation runs
    twice sequentially per materialization. Whether fixing that pays
    depends on what the duplicated subtree CONTAINS, so the pin is
    routed by ``hash_fn`` on measurement:

    - ``xxhash64`` (production): the signature is the EXPLODED
      token→groupBy plan — the duplicate re-runs a corpus token explode
      plus a doc-keyed aggregation SHUFFLE. Pinning the slim block
      table (id, simhash, block_id, block_val — 4 rows/doc, no text),
      eager-checkpointing the pair result and releasing the pin (the
      minhash_near_duplicates contract) removes the second pass:
      fresh-JVM min5 2.00 → 1.40 (−30 %), and at 100 TB the avoided
      pass is a full token shuffle over the corpus.
    - ``md5`` (oracle parity): the signature is the ZERO-SHUFFLE fused
      per-row conv battery — duplicating it costs two cheap fully
      parallel scan stages, while a pin must serialize them behind a
      cache materialization and pay the checkpoint round-trip.
      Measured TWICE this round (signature-table pin: +8 %; block-table
      pin, interleaved stash A/B: 1.95 → 2.72 min5) — the lazy form
      stays, and the composing CC queries keep fusing the pair plan
      into their own first checkpoint.

    NOTE the API consequence (ADVICE r14): with ``hash_fn="xxhash64"``
    this function is EAGER — it runs the full pair computation and
    writes checkpoint files at call time, so callers that only build or
    inspect the plan still pay full materialization; the md5 path stays
    lazy. If a lazy xxhash64 composition is ever needed, compose
    :func:`simhash32` + the 4-block banding directly."""
    if max_hamming > 3:
        raise ValueError("4-block banding guarantees recall only for max_hamming <= 3")
    sig = simhash32(df, text_col, id_col, hash_fn=hash_fn)
    blocks = sig.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(blk).alias("block_id"),
                        (F.floor(F.col("simhash") / (2 ** (8 * blk))) % 256)
                        .cast("int")
                        .alias("block_val"),
                    )
                    for blk in range(4)
                ]
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.block_id", "b.block_val")
    pin = hash_fn == "xxhash64"
    if pin:
        ensure_checkpoint_dir(df.sparkSession)
        blocks = blocks.persist()
    try:
        l, r = blocks.alias("l"), blocks.alias("r")
        cand = (
            l.join(
                r,
                (F.col("l.block_id") == F.col("r.block_id"))
                & (F.col("l.block_val") == F.col("r.block_val"))
                & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
            )
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
                F.col("l.simhash").alias("sim_a"),
                F.col("r.simhash").alias("sim_b"),
            )
            .distinct()
        )
        hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        out = cand.select(
            "id_a", "id_b", hamming.cast("int").alias("hamming")
        ).filter(F.col("hamming") <= max_hamming)
        return out.checkpoint(eager=True) if pin else out
    finally:
        if pin:
            blocks.unpersist()


def decontaminate_against(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
    min_shared: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Train-set DECONTAMINATION: flag corpus documents that share word
    n-grams with a held-out benchmark/eval set (the GPT-3 appendix-C /
    PaLM 13-gram wash — a training corpus that contains eval text
    invalidates the eval). Returns per flagged document
    (id, n_grams, shared_ngrams, overlap_frac) where ``overlap_frac`` =
    shared / distinct n-grams of the document; downstream either drops
    the doc or splices out the contaminated spans.

    Scale shape: the benchmark side is eval-sized (thousands of docs —
    MMLU/HumanEval-scale), so its distinct n-gram set is BROADCAST
    (``broadcast_benchmark=True``) and the corpus side is one scan +
    broadcast semi-pattern join + per-doc aggregate: no corpus-wide
    shuffle except the final doc-keyed count, which composes with the
    shingle aggregate already computed for dedup. For an unusually large
    benchmark set pass ``broadcast_benchmark=False`` and the join falls
    back to a hash shuffle on the n-gram.

    Uses the same whitespace word-shingle semantics (and the same DuckDB
    twin) as the MinHash pipeline; n-grams are matched exactly — this
    catches verbatim leakage, while near-dup contamination is the
    MinHash/containment operators' job (staged after exact decontam)."""
    if n < 1 or min_shared < 1:
        raise ValueError("n and min_shared must be >= 1")
    c_grams = word_shingles(corpus, text_col, id_col, k=n)
    b_grams = (
        word_shingles(benchmark, text_col, id_col, k=n)
        .select("shingle")
        .distinct()
    )
    if broadcast_benchmark:
        b_grams = F.broadcast(b_grams)
    per_doc = c_grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        c_grams.join(b_grams, on="shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )
    return hits.join(per_doc, on=id_col).select(
        id_col,
        "n_grams",
        "shared_ngrams",
        F.round(F.col("shared_ngrams").cast("double") / F.col("n_grams"), 6).alias(
            "overlap_frac"
        ),
    )


def duplicated_ngram_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """EXACT SUBSTRING dedup (span extraction): find every maximal token
    span that is part of text duplicated elsewhere in the corpus — the
    distributed reformulation of suffix-array exact-substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"; the RefinedWeb/Gopher exact-span stage). Returns per
    duplicated span (id, span_start, span_end, span_tokens, n_dup_grams)
    with 0-based inclusive token indices; downstream splices the spans
    out of the document (removal-set semantics) rather than dropping the
    whole doc — the behavior that distinguishes this family from
    doc-level exact/near dedup (`exact_duplicates`, MinHash).

    Semantics: tokenize on whitespace (case-SENSITIVE — "exact" means
    exact; `word_shingles`' lowercase canon is the near-dup family's),
    slide a k-token window, and mark every window whose token sequence
    occurs >= ``min_occurrences`` times corpus-wide (same-document
    repeats count — self-repetition IS duplication, cf. the suffix
    array's corpus-level count). Any duplicated substring of length
    L >= k tokens is covered by its L-k+1 duplicated windows, so spans
    of at least k tokens are recovered with EXACT boundaries; shorter
    duplicates are invisible (the standard k-length floor). Marked
    window starts at distance <= k merge (overlap or exact adjacency)
    into one maximal removal interval via per-document gaps-and-islands.

    Plan shape (one corpus tokenize per reference, three shuffles, no
    O(n^2) stage):
      1. projection: split + transform/posexplode -> (id, pos, gram
         hash); narrow, whole-stage-codegen.
      2. groupBy(gram hash) count -> duplicated-gram set: map-side
         combinable; the hottest gram (boilerplate) partial-aggregates
         before the exchange.
      3. left-semi join grams -> duplicated set on the 8-byte
         ``xxhash64`` of the gram, NOT the k-token string — the
         `remove_duplicate_lines` key discipline: shuffle bytes shrink
         severalfold exactly on the heavy keys, the hash never reaches
         the output, and a 64-bit collision (the only way results could
         differ from keying on the string, ~n^2/2^65) merely marks one
         extra window. Marked rows are output-proportional; AQE
         skew-splits a boilerplate heavy-hitter.
      4. one doc-keyed exchange for the island merge: lag + running sum
         share a single (id, pos) sort — Spark plans ONE Window exchange
         with two Window nodes — and every partition is DOC-BOUNDED
         (<= n_tokens - k + 1 rows), the repo's accepted bounded-window
         class; the closing (id, island) aggregate is map-side
         combinable.
    The gram table is intentionally NOT pinned: it is corpus x ~n_tokens
    rows, so re-deriving it from a column-pruned (id, text) scan on the
    dup-count branch beats storing a corpus-scale copy (the
    `win_ntile_quartiles` bare-scan opt-out, applied at step 2/3's
    shared subtree).
    """
    if k < 1 or min_occurrences < 2:
        raise ValueError("k must be >= 1 and min_occurrences >= 2")
    toks = F.split(F.col(text_col), r"\s+")
    with_toks = df.select(F.col(id_col), toks.alias("__t")).filter(
        F.size("__t") >= k
    )
    gram_hashes = F.transform(
        F.sequence(F.lit(0), F.size("__t") - k),
        lambda i: F.xxhash64(F.concat_ws("\x1f", F.slice(F.col("__t"), i + 1, k))),
    )
    grams = with_toks.select(
        F.col(id_col), F.posexplode(gram_hashes).alias("pos", "__gh")
    )
    dup = (
        grams.groupBy("__gh")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_occurrences)
        .select("__gh")
    )
    marked = grams.join(dup, on="__gh", how="left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        marked.withColumn(
            "__new",
            F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn(
            "__isl",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        islands.groupBy(id_col, "__isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(k)).cast("long").alias("span_tokens"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .drop("__isl")
    )


def remove_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Apply `duplicated_ngram_spans` removal intervals: splice the
    duplicated token ranges OUT of each document and reassemble the
    survivors — the second half of the exact-substring dedup recipe
    (detect spans, then cut them, keeping the unique remainder of the
    doc instead of dropping it).

    Contract: ``spans`` carries (id, span_start, span_end) token-index
    intervals produced against the SAME tokenization this operator uses
    (case-sensitive whitespace split) — the `duplicated_ngram_spans`
    output. Reassembly joins surviving tokens with single spaces
    (original whitespace runs are not preserved — standard for
    token-level splicing). Row-preserving: docs with no spans pass
    through with n_removed = 0; a fully-duplicated doc survives with
    empty text (the caller decides to drop it), mirroring
    `remove_duplicate_lines`.

    Plan shape: the span table is aggregated per doc (tiny,
    output-proportional) and joined back doc-keyed — ONE shuffle join;
    the splice itself is a pure array expression (transform + filter
    with index + exists over the per-doc interval list), zero
    additional shuffles, whole-stage-codegen. Interval lists are
    per-doc bounded (<= n_tokens/k spans), so the exists() probe is
    cheap; no explode of the corpus token table is ever materialized."""
    sp = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start"), F.col("span_end"))
        ).alias("__spans")
    )
    toks = F.split(F.col(text_col), r"\s+")
    joined = docs.join(sp, on=id_col, how="left").select(
        F.col(id_col), toks.alias("__t"), F.col("__spans")
    )
    # NULL __spans (no duplicated spans in this doc) => exists() is NULL
    # per-token; coalesce to FALSE so every token survives.
    def _in_span(i):
        return F.coalesce(
            F.exists(
                F.col("__spans"),
                lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
            ),
            F.lit(False),
        )

    kept = F.filter(F.col("__t"), lambda t, i: ~_in_span(i))
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias("text_spliced"),
        F.size("__t").cast("long").alias("n_tokens"),
        (F.size("__t") - F.size(kept)).cast("long").alias("n_removed"),
    )
