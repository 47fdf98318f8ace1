"""Deterministic sampling / splitting operators for training-data
pipelines (north-star; the reference has no sampling surface, SURVEY §2.B.8).

Training-data work needs *reproducible* samples: re-running the pipeline
(or re-reading the same row on another executor) must make the same
keep/drop decision, and adding documents must not reshuffle previous
assignments. Spark's ``df.sample`` is seeded per-partition — repartition
the input and the sample changes — so these operators derive every
decision from a content hash of a stable key instead:

- :func:`hash_bucket` — uniform bucket in [0, buckets) from md5(seed|key).
- :func:`hash_sample` — keep rows whose bucket < fraction·buckets.
  Scan-only: no shuffle, predicate runs inside the parquet scan's codegen
  stage, so sampling 1% of 100 TB reads 100 TB once and writes 1 TB with
  zero wide stages.
- :func:`train_val_test_split` — disjoint, exhaustive split column from
  the same bucket (test | val | train). Scan-only, stable under appends.
- :func:`stratified_sample` — exact per-stratum cap: rank rows inside
  each stratum by (hash, key) and keep the first n. One shuffle on the
  strata columns; the hash order makes the kept set a uniform random
  (but reproducible) subset of each stratum. This is the bounded
  "reservoir" for balancing a corpus across languages/sources.

All decisions are md5-based — engine-portable (DuckDB:
``('0x' || substr(md5(expr), 1, 8))::BIGINT``), so the oracle gate checks
bit-identical keep/drop decisions, not just counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 1_000_000
_HASH_SPACE = 1 << 32  # _key_hash range: first 8 md5 hex chars


def _key_hash(key: Column, seed: str) -> Column:
    """64-bit-safe integer hash of (seed, key): first 8 md5 hex chars."""
    payload = F.concat_ws("|", F.lit(seed), key.cast("string"))
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def hash_bucket(key: Column, seed: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets) for a stable key."""
    return _key_hash(key, seed) % buckets


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Reproducible ``fraction`` sample keyed on ``key_col``.

    Deterministic across runs, partitionings, and engines; stable under
    appends (new rows don't change old decisions). The filter is a pure
    column predicate — no shuffle, no RNG state."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(round(fraction * BUCKETS))
    return df.filter(hash_bucket(F.col(key_col), seed) < cut)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    val_fraction: float = 0.0,
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to 'test' / 'val' / 'train', disjoint and exhaustive,
    from the same hash bucket — the canonical leakage-safe split (a given
    document lands in the same split in every run and at every scale)."""
    if test_fraction < 0 or val_fraction < 0 or test_fraction + val_fraction > 1:
        raise ValueError("fractions must be >= 0 and sum to <= 1")
    b = hash_bucket(F.col(key_col), seed)
    test_cut = int(round(test_fraction * BUCKETS))
    val_cut = test_cut + int(round(val_fraction * BUCKETS))
    split = (
        F.when(b < test_cut, F.lit("test"))
        .when(b < val_cut, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(split_col, split)


def source_mixture_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "mix",
) -> DataFrame:
    """Per-source mixing-ratio sample: keep ``fractions[source]`` of each
    source's rows (training-data mixing — e.g. keep 100% of books, 30% of
    web, 5% of logs), deterministically and stably under appends.

    The per-source threshold joins into the predicate as a CASE over the
    (small) source domain, so the decision is still a pure scan-side
    column predicate — sampling a mixture from 100 TB is one scan with no
    shuffle, exactly like :func:`hash_sample`. Sources absent from
    ``fractions`` fall back to ``default_fraction`` (0 = drop, the usual
    curation posture for unvetted sources)."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    cut = F.lit(int(round(default_fraction * BUCKETS)))
    for s, f in sorted(fractions.items()):
        cut = F.when(F.col(source_col) == s, F.lit(int(round(f * BUCKETS)))).otherwise(cut)
    return df.filter(hash_bucket(F.col(key_col), seed) < cut)


def source_mixture_sample_by_cuts(
    df: DataFrame,
    source_col: str,
    key_col: str,
    cuts: DataFrame,
    seed: str = "mix",
) -> DataFrame:
    """Mixture sampling driven by a DATA-derived cut table instead of a
    literal fraction dict: ``cuts`` is a tiny (source, cut) DataFrame
    (cut ∈ [0, BUCKETS], typically computed from measured per-source
    quality stats — see ``pipe_mixture_from_quality``), broadcast-joined
    onto the corpus; rows keep when their hash bucket < their source's
    cut. Unlike :func:`source_mixture_sample` no value ever passes
    through the driver: stats → cuts → filter is one declarative plan,
    so the whole mixture derivation re-optimizes and scales with the
    cluster. Sources absent from ``cuts`` are dropped (inner join) —
    the unvetted-source posture."""
    tagged = df.join(F.broadcast(cuts.select(source_col, "cut")), on=source_col)
    return tagged.filter(hash_bucket(F.col(key_col), seed) < F.col("cut"))


def pack_token_windows(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    window_tokens: int = 1024,
    shards: int | None = None,
    seed: str = "pack",
) -> DataFrame:
    """Concat-and-chunk packing accounting (the GPT-pretraining data
    layout): documents are concatenated in a deterministic order and cut
    into fixed ``window_tokens`` training windows; this operator computes,
    per document, its token ``start_offset`` and the [first_window,
    last_window] span it lands in.

    Distributed shape: a global concatenation order would serialize the
    cumsum, so documents are hash-sharded (stable under partitioning;
    ``shards`` ≈ number of output packing streams) and the running token
    offset is one window cumsum per shard — shards pack independently,
    exactly how a 1000-executor job would emit 1000 packed streams.
    Zero-token documents are excluded (they occupy no window). All
    decisions are md5-hash + integer arithmetic: bit-identical in any
    engine, stable under appends within a shard's suffix.

    ``shards`` caps the job's parallelism (one cumsum stream per shard),
    so it must scale with the deployment, not be a constant: the default
    is the cluster's default parallelism — on a 1000-core cluster an
    unset ``shards`` yields 1000 independent packing streams. (Derived
    from ``defaultParallelism`` alone, NOT ``df.rdd.getNumPartitions()``:
    touching ``.rdd`` forces a full DataFrame→RDD conversion plan, a real
    cost at 100 TB, and scan-partition counts are an input-size artifact
    rather than a parallelism target.) Pin ``shards`` explicitly whenever
    the packed layout must be reproducible across differently-sized
    clusters (the registered oracle query does)."""
    if window_tokens < 1 or (shards is not None and shards < 1):
        raise ValueError("window_tokens and shards must be >= 1")
    if shards is None:
        shards = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    key, toks = F.col(key_col), F.col(tokens_col).cast("long")
    shard = hash_bucket(key, seed, shards)
    staged = df.select(
        key.alias(key_col), toks.alias("n_tokens"), shard.alias("shard")
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    out = staged.withColumn("start_offset", start)
    wt = float(window_tokens)
    return out.select(
        key_col,
        "shard",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / wt).cast("long").alias("first_window"),
        F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / wt)
        .cast("long")
        .alias("last_window"),
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    n_per_stratum: int,
    seed: str = "strat",
) -> DataFrame:
    """Exact cap of ``n_per_stratum`` rows per stratum, chosen uniformly
    (hash order) and reproducibly.

    One shuffle, on the strata columns. With few large strata (languages)
    a rank-window is the right plan because Spark pushes a partial
    WindowGroupLimit to the MAP side (verified in the executed plan):
    every input task keeps at most ``n_per_stratum`` rows per stratum
    before the exchange, so the reduce-side window partition is bounded
    by n·map_tasks, never by stratum size — a 90%-English corpus does
    not funnel 90 TB into one task. The (hash, key) order key is a
    total order, so the kept set is unique — no ties, no run-to-run
    drift.
    """
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    order = [_key_hash(F.col(key_col), seed).asc(), F.col(key_col).asc()]
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def score_weighted_sample(
    df: DataFrame, key_col: str, score_col: str, seed: str = "qw"
) -> DataFrame:
    """Keep each row with probability equal to its [0, 1] score —
    deterministic quality-weighted downsampling (the curation pattern
    where high-quality documents are kept outright and low-quality ones
    survive at a rate proportional to their score, instead of a hard
    threshold cliff).

    Same contract as every sampler here: the decision is a pure
    scan-side predicate of (seed, key, score) — no shuffle, no RNG
    state, append-stable, identical on re-runs and across engines.
    Scores ≤ 0 never keep; ≥ 1 always keep."""
    cut = F.least(
        F.floor(F.col(score_col) * BUCKETS).cast("long"), F.lit(BUCKETS).cast("long")
    )
    return df.filter(hash_bucket(F.col(key_col), seed) < cut)


def stratified_sample_by_quota(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    quotas: DataFrame,
    seed: str = "strat",
    max_quota: int | None = None,
) -> DataFrame:
    """Exact per-stratum cap driven by a DATA-derived quota table instead
    of a constant: ``quotas`` is a tiny (strata..., quota) DataFrame —
    typically :func:`allocate_budget`'s output — broadcast-joined onto
    the ranked corpus; rows keep while their in-stratum (hash, key) rank
    is within their stratum's quota. The execution half of budgeted
    sampling: allocate_budget plans the quotas, this enforces them, and
    the two compose as ONE declarative plan with no value passing
    through the driver. Same one-shuffle rank-window plan as
    :func:`stratified_sample`; strata absent from ``quotas`` are dropped
    (inner join — the unbudgeted-stratum posture).

    ``max_quota`` is the SKEW GUARD (r07, VERDICT r06 #1) and callers
    that know a plan-time bound MUST pass it: Spark's
    ``InferWindowGroupLimit`` rule only fires on ``rank <= <literal>``,
    so the exact ``__rk <= col("quota")`` filter alone plans NO map-side
    group limit — each whole stratum funnels into one reduce task (a
    90%-English corpus sorts the entire surviving English stratum in one
    task). Any upper bound on every stratum's quota (for
    :func:`allocate_budget` output the total budget B works: every
    quota ≤ B by construction) is added as a redundant conjunct
    ``__rk <= lit(max_quota)`` adjacent to the window; the rule fires on
    the literal conjunct, bounding every window partition to
    max_quota·map_tasks rows, and the exact quota filter then prunes to
    the answer — results are unchanged. Verified in the executed plan by
    ``tests/test_plans.py`` (quota path mirrors the literal-cap path's
    ``WindowGroupLimit``)."""
    if max_quota is not None and max_quota < 1:
        raise ValueError("max_quota must be >= 1 when given")
    order = [_key_hash(F.col(key_col), seed).asc(), F.col(key_col).asc()]
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    ranked = df.join(F.broadcast(quotas), on=strata_cols).withColumn(
        "__rk", F.row_number().over(w)
    )
    if max_quota is not None:
        ranked = ranked.filter(F.col("__rk") <= F.lit(max_quota))
    return ranked.filter(F.col("__rk") <= F.col("quota")).drop("__rk")


def stratified_sample_by_quota_threshold(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    quotas: DataFrame,
    seed: str = "strat",
    n_hist_buckets: int = 1024,
) -> DataFrame:
    """Window-free quota enforcement — the VERDICT r06 stretch path for
    budgets too large for a useful ``max_quota`` literal: selects exactly
    the same rows as :func:`stratified_sample_by_quota` (the quota
    smallest (hash, key) pairs per stratum) WITHOUT ranking whole strata.

    Plan (histogram threshold selection):
    1. bucket each row's hash into ``n_hist_buckets`` equi-width bins and
       count per (stratum, bin) — one map-side-combinable aggregate whose
       output is k·buckets rows, corpus-size-independent;
    2. a running sum over each stratum's ≤``n_hist_buckets``-row bin
       table (bounded window — partition size is the literal bucket
       count, never data-sized) finds the BOUNDARY bin where the
       cumulative count crosses the quota, and how many rows of that bin
       still fit (``remaining``);
    3. broadcast-join the k-row boundary table back: rows in bins below
       the boundary keep outright (pure scan-side predicate — at a 1%
       sampling rate that is ~99.9% of kept rows deciding with NO
       shuffle); only rows INSIDE each boundary bin are ranked, and that
       window's partitions hold ~stratum/n_hist_buckets rows — a
       1024-fold reduce-side bound without any literal cap (deeper
       bounds = recurse the histogram; one level is the right trade
       here). The boundary rank still pre-filters to the bin before the
       window, so the exchange carries bin rows only.

    Decision-identical to the rank formulation because the md5 hash key
    is a total order with the key tie-break: bucket = hash div width, so
    (bucket, hash, key) sorts identically to (hash, key). Exactness is
    oracle-checked (``samp_quota_threshold``); equality with the window
    sampler is property-tested."""
    if n_hist_buckets < 2:
        raise ValueError("n_hist_buckets must be >= 2")
    width = (_HASH_SPACE + n_hist_buckets - 1) // n_hist_buckets
    h = _key_hash(F.col(key_col), seed)
    tagged = (
        df.join(F.broadcast(quotas), on=strata_cols)
        .withColumn("__h", h)
        # integral `div`, not double-divide-then-cast: same exactness
        # discipline as compact_layout's file count (ADVICE r06)
        .withColumn("__bin", F.expr(f"__h div {width}"))
    )
    hist = tagged.groupBy(*strata_cols, "__bin").agg(
        F.count(F.lit(1)).alias("__c")
    )
    wcum = (
        Window.partitionBy(*strata_cols)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bins = hist.withColumn("__before", F.coalesce(F.sum("__c").over(wcum), F.lit(0)))
    # boundary = first bin where cumulative count reaches the quota;
    # join quotas onto the k·buckets table (broadcast — it is tiny)
    bq = bins.join(F.broadcast(quotas), on=strata_cols)
    boundary = (
        bq.filter(F.col("__before") + F.col("__c") >= F.col("quota"))
        .groupBy(*strata_cols)
        .agg(
            F.min("__bin").alias("__bbin"),
        )
        .join(bq, [*strata_cols])
        .filter(F.col("__bin") == F.col("__bbin"))
        .select(
            *strata_cols,
            "__bbin",
            (F.col("quota") - F.col("__before")).alias("__remaining"),
        )
    )
    joined = tagged.join(F.broadcast(boundary), on=strata_cols, how="left")
    below = joined.filter(
        F.col("__bbin").isNull() | (F.col("__bin") < F.col("__bbin"))
    )
    wb = Window.partitionBy(*strata_cols).orderBy(
        F.col("__h").asc(), F.col(key_col).asc()
    )
    at_boundary = (
        joined.filter(F.col("__bin") == F.col("__bbin"))
        .withColumn("__rk", F.row_number().over(wb))
        .filter(F.col("__rk") <= F.col("__remaining"))
        .drop("__rk")
    )
    drop_cols = ["__h", "__bin", "__bbin", "__remaining"]
    return below.drop(*drop_cols).unionByName(at_boundary.drop(*drop_cols))


def allocate_budget(
    df: DataFrame, stratum_col: str, budget: int
) -> DataFrame:
    """Largest-remainder apportionment of a global row budget across
    strata (the 'sample exactly B documents, proportionally by
    language/source' planning step ahead of :func:`stratified_sample`):
    quota_s = floor(B·n_s/N), then the leftover seats go to the largest
    remainders (B·n_s mod N, stratum as tie-break). Everything is
    integer arithmetic — quotas sum to exactly ``budget`` (when
    budget ≤ N) and are bit-identical in any engine, unlike
    float-rounded shares which can over- or under-shoot.

    Plan: one corpus aggregate to per-stratum counts, then window math
    over the k-row stratum table — nothing else touches the corpus.
    Returns (stratum, n_rows, quota)."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    # two 1-row broadcasts: N, then base-quota sum (leftover seats)
    n_total = counts.agg(F.sum("n_rows").alias("N"))
    # budget·n_rows in decimal(38,0), not long: a 10^9 budget over a
    # 10^12-row stratum is 10^21 ≫ 2^63, and non-ANSI long multiplication
    # wraps SILENTLY — flipping quotas at exactly the 100 TB scale this
    # plans for (same discipline as the volume-anomaly decision and the
    # connected-components fixpoint sum). decimal div/mod stay exact;
    # base ≤ budget fits back in a long.
    with_base = counts.crossJoin(F.broadcast(n_total)).select(
        "stratum",
        "n_rows",
        F.expr(
            f"CAST(CAST({budget} AS DECIMAL(38,0)) * n_rows div N AS BIGINT)"
        ).alias("base"),
        F.expr(f"(CAST({budget} AS DECIMAL(38,0)) * n_rows) % N").alias("rem"),
    )
    leftover = with_base.agg(
        (F.lit(budget) - F.sum("base")).cast("long").alias("leftover")
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("stratum"))
    return (
        with_base.crossJoin(F.broadcast(leftover))
        .withColumn("__rk", F.row_number().over(w))
        .select(
            "stratum",
            "n_rows",
            (F.col("base") + (F.col("__rk") <= F.col("leftover")).cast("long")).alias(
                "quota"
            ),
        )
    )


def ntile_histogram(
    df: DataFrame,
    n_tiles: int,
    score_col: str,
    id_col: str,
    strata_cols: list[str] | None = None,
    n_bins: int = 1024,
    ascending: bool = True,
    tile_col: str = "__tile",
) -> DataFrame:
    """Exact ``ntile(n_tiles) OVER (PARTITION BY strata ORDER BY score
    [ASC|DESC], id)`` WITHOUT a stratum-sized (or, unpartitioned, a
    table-sized single-task) window — the r07 second-pass window-skew
    audit's replacement for ntile over raw facts. Returns ``df`` plus an
    integer ``tile_col`` in [1, n_tiles], decision-identical to ntile
    (property-tested across tie regimes, tiny/degenerate strata, bin
    counts, and both orderings).

    Design — driver-held thresholds (the Lloyd literal-centroid
    precedent): stratum cardinality is bounded by construction for every
    caller (language codes; or ONE global stratum), so the per-stratum
    model state lives on the driver and the corpus pass carries zero
    joins and zero broadcast builds:

    1. k-row (n, min, max) stats COLLECTED (bounded read); SQL-standard
       tile boundary RANKS ``b_i = i·q + min(i, n mod n_tiles)`` (tile
       sizes q+1 for the first n mod n_tiles tiles, q after) in Python
       integers.
    2. per-(stratum, score-bin) histogram over ``n_bins`` equi-width
       bins COLLECTED (≤ k·n_bins rows; bins numbered in rank order —
       ascending scores or descending per ``ascending``); cumulative
       counts locate each boundary bin ``bb_i`` and its offset
       ``bef_i`` in Python.
    3. ONE pass over ``df``: the bin expression and the per-stratum
       boundary struct are literal CASE chains (k branches), so rows
       outside boundary bins take their tile from a scan-side bin
       comparison with NO shuffle; only boundary-bin rows
       (~stratum/n_bins) are ranked in a (stratum, bin)-partitioned —
       bounded — window, the in-bin (score, id) rank plus the bin's
       cumulative offset reproducing the global row_number exactly,
       ties included (equal scores always share a bin, so the id
       tie-break happens entirely inside the bounded window).

    Degenerate-distribution caveat: a stratum whose scores are ALL
    identical collapses to one bin and ranks in one task (recurse the
    histogram on the id if a real corpus ever looks like that); any
    spread restores the n_bins-fold bound. Callers should persist
    ``df`` when its lineage is expensive — it is read FOUR times: the
    two threshold collects, plus the plain and edge branches of the
    final union each scan it once."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    strata = list(strata_cols) if strata_cols else []
    s = F.col(score_col)

    grouped = df.groupBy(*strata) if strata else df.groupBy()
    # min/max coerced to Python float: the bin width math must divide by
    # a float bin count (Decimal/float raises in Python), and the SAME
    # literal feeds both the histogram job and the final pass, so any
    # monotone precision loss is consistent — equal scores still share a
    # bin, which is all correctness needs.
    stat_rows = grouped.agg(
        F.count(F.lit(1)).alias("__n"),
        F.count(F.when(F.col(score_col).isNull(), F.lit(1))).alias("__nnull"),
        F.min(score_col).alias("__mn"),
        F.max(score_col).alias("__mx"),
    ).collect()
    # NULL scores would sort NULLS-FIRST in Spark's ntile but NULLS-LAST
    # in other engines, and they have no bin — fail loudly rather than
    # pick an engine-specific order silently (same discipline as the
    # sketch NULL filter, ADVICE r06).
    bad = [r for r in stat_rows if r["__nnull"] > 0]
    if bad:
        raise ValueError(
            f"ntile_histogram: {score_col} contains NULLs in "
            f"{len(bad)} strata — NULL rank order is engine-specific; "
            "filter or impute before tiling"
        )
    stats = {
        tuple(r[c] for c in strata): (
            r["__n"],
            None if r["__mn"] is None else float(r["__mn"]),
            None if r["__mx"] is None else float(r["__mx"]),
        )
        for r in stat_rows
        if r["__n"] > 0
    }
    # NaN guard (same reasoning as NULL, silent instead of loud): one NaN
    # makes max() NaN, which makes the bin width NaN and every row's bin
    # clamp to n_bins-1 — collapsing the whole stratum into ONE window
    # task, exactly the skew this operator exists to remove. float('nan')
    # != itself, so any-NaN always surfaces in the collected mx (or mn
    # when all values are NaN).
    def _nonfinite(x):
        return x is not None and (x != x or x in (float("inf"), float("-inf")))

    bad_keys = [
        k for k, (_, mn, mx) in stats.items() if _nonfinite(mn) or _nonfinite(mx)
    ]
    if bad_keys:
        raise ValueError(
            f"ntile_histogram: {score_col} contains NaN/Inf in "
            f"{len(bad_keys)} strata — non-finite scores defeat equi-width "
            "binning (NaN/Inf widths mis-bin the stratum); filter or "
            "impute first"
        )
    # The literal CASE chains are linear in stratum count — the same
    # planner-side ceiling as the Lloyd literal-centroid path (routed at
    # k=100 there). Fail loudly instead of letting Catalyst analysis
    # blow up on a high-cardinality strata column; a distributed
    # formulation (the exact_percentiles shape, broadcast thresholds
    # instead of literals) is the right tool past this point.
    if len(stats) > 1024:
        raise ValueError(
            f"ntile_histogram: {len(stats)} strata — the driver-held "
            "literal-CASE design is for bounded stratum counts (≤1024); "
            "use a distributed broadcast-threshold formulation for "
            "high-cardinality strata"
        )
    if not stats:
        return df.withColumn(tile_col, F.lit(None).cast("int"))

    def _match(key):
        cond = None
        for c, v in zip(strata, key):
            eq = F.col(c).eqNullSafe(F.lit(v))
            cond = eq if cond is None else cond & eq
        return cond

    def _chain(items):
        # items: [(key, Column)]; a single global stratum needs no CASE
        if len(items) == 1 and items[0][0] == ():
            return items[0][1]
        e = None
        for key, col in items:
            e = F.when(_match(key), col) if e is None else e.when(_match(key), col)
        return e

    def _bin_for(key):
        _, mn, mx = stats[key]
        if mx == mn:
            return F.lit(0)
        width = (mx - mn) / float(n_bins)
        pos = (s - F.lit(mn)) if ascending else (F.lit(mx) - s)
        return (
            F.greatest(
                F.lit(0),
                F.least(F.lit(n_bins - 1), F.floor(pos / F.lit(width))),
            )
        ).cast("int")

    if n_tiles == 1:
        # every row is tile 1 — skip the histogram job entirely
        return df.withColumn(tile_col, F.lit(1).cast("int"))

    bin_expr = _chain([(key, _bin_for(key)) for key in stats])

    hist = (
        df.select(*strata, bin_expr.alias("__bin"))
        .groupBy(*strata, "__bin")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    per_stratum: dict[tuple, list[tuple[int, int]]] = {}
    for r in hist:
        per_stratum.setdefault(tuple(r[c] for c in strata), []).append(
            (r["__bin"], r["__c"])
        )
    bounds: dict[tuple, list[tuple[int, int, int]]] = {}
    for key, bin_counts in per_stratum.items():
        n = stats[key][0]
        q, rem = divmod(n, n_tiles)
        targets = [i * q + min(i, rem) for i in range(1, n_tiles)]
        cum = 0
        found: list[tuple[int, int, int] | None] = [None] * len(targets)
        for bn, c in sorted(bin_counts):
            for i, b in enumerate(targets):
                if found[i] is None and cum + c >= b:
                    found[i] = (bn, cum, b)
            cum += c
        # b_i can exceed later bins only if b_i > n (impossible); every
        # target <= n is reached because the cumulative total is n
        bounds[key] = [f for f in found if f is not None]

    n_b = n_tiles - 1

    def _meta_for(key):
        vals = bounds[key]
        fields = []
        for i in range(n_b):
            bb, bef, b = vals[i] if i < len(vals) else (-1, 0, 0)
            fields += [
                F.lit(bb).alias(f"bb{i}"),
                F.lit(bef).alias(f"bef{i}"),
                F.lit(b).alias(f"b{i}"),
            ]
        return F.struct(*fields)

    meta_expr = _chain([(key, _meta_for(key)) for key in bounds])
    tagged = df.withColumn("__bin", bin_expr).withColumn("__m", meta_expr)

    def m(name):
        return F.col(f"__m.{name}")

    is_boundary = None
    for i in range(n_b):
        eq = F.col("__bin") == m(f"bb{i}")
        is_boundary = eq if is_boundary is None else is_boundary | eq

    def _tile_case(value_for):
        e = None
        for i in range(n_b):
            e = (
                F.when(value_for(i), F.lit(i + 1))
                if e is None
                else e.when(value_for(i), F.lit(i + 1))
            )
        return e.otherwise(F.lit(n_tiles))

    plain = tagged.filter(~is_boundary).select(
        *df.columns,
        _tile_case(lambda i: F.col("__bin") < m(f"bb{i}"))
        .cast("int")
        .alias(tile_col),
    )
    order = s.asc() if ascending else s.desc()
    wb = Window.partitionBy(*strata, "__bin").orderBy(order, F.col(id_col).asc())
    bef = None
    for i in range(n_b):
        bef = (
            F.when(F.col("__bin") == m(f"bb{i}"), m(f"bef{i}"))
            if bef is None
            else bef.when(F.col("__bin") == m(f"bb{i}"), m(f"bef{i}"))
        )
    g = bef + F.col("__rk")
    edge = (
        tagged.filter(is_boundary)
        .withColumn("__rk", F.row_number().over(wb))
        .select(
            *df.columns,
            _tile_case(lambda i, _g=g: _g <= m(f"b{i}")).cast("int").alias(tile_col),
        )
    )
    return plain.unionByName(edge)
