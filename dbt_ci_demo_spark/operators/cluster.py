"""Multi-dimensional data clustering for scan pruning (Z-order).

A 100 TB fact table is usually partitioned by ONE key (date). Queries
filtering on a second dimension (customer, region, price band) still
read every file of the touched partitions, because row order within
them is arbitrary and per-file min/max column statistics span the whole
domain. Z-ORDER clustering (bit-interleaving the dimensions' bucket
numbers — the space-filling-curve layout popularized by lakehouse
OPTIMIZE ZORDER BY) sorts rows so that files cover compact rectangles
of the multi-dim space: per-file min/max become tight on EVERY
clustered column, and a reader's predicate-vs-footer check skips most
files on any of them.

Engine-side this is pure DataFrame algebra: one 1-row min/max aggregate
per clustering set (broadcast), a bucket + bit-interleave expression in
the scan projection, and `repartitionByRange` + `sortWithinPartitions`
on the derived key — the write itself is the only wide stage, exactly
like any clustered CTAS. Parquet then records the min/max stats per
row group; Spark's scan uses them automatically (filter pushdown), as
does any other parquet reader.

`tests/test_runner.py::test_zorder_layout_skips_files` verifies the
claim mechanically: with the fixture orders table written 16-file
Z-ordered on (date, custkey), a narrow custkey predicate intersects the
min/max of a small fraction of files, while the same data written
row-ordered intersects nearly all of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    key_col: str = "__zorder",
) -> DataFrame:
    """Append the Z-order (Morton) key over ``cols``.

    Each column is linearly bucketed into [0, 2^bits) between its global
    min and max (one 1-row aggregate, broadcast onto the scan — columns
    must be numeric; cast dates to day numbers first), then the bucket
    numbers' bits are interleaved: bit b of column i lands at position
    b*len(cols)+i. Rows close in key are close in EVERY dimension.

    Linear bucketing assumes roughly uniform value spread; for heavily
    skewed columns, pre-transform (log, rank) before clustering — the
    interleave is agnostic to how buckets were derived. NULL values in a
    clustering column land in the TOP bucket (Spark's least() skips
    nulls), so they cluster together rather than erroring; filter or
    impute first if nulls should not share a region.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if not 1 <= bits <= 20:
        raise ValueError("bits must be in [1, 20]")
    # The interleaved key lives in one signed long: the top bit position is
    # bits*len(cols)-1, which must stay < 63 — the JVM masks shift counts
    # mod 64, so an overwide key would silently scramble the layout.
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits*len(cols) = {bits * len(cols)} exceeds 63: the Morton key "
            f"must fit a signed 64-bit long; lower bits (≤ {63 // len(cols)} "
            f"for {len(cols)} columns) or cluster fewer columns"
        )
    nb = 1 << bits
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{i}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{i}"))
    rng = df.agg(*aggs)
    j = df.crossJoin(F.broadcast(rng))
    buckets: list[Column] = []
    for i, c in enumerate(cols):
        mn, mx = F.col(f"__mn_{i}"), F.col(f"__mx_{i}")
        span = mx - mn
        scaled = F.floor((F.col(c).cast("double") - mn) / span * nb)
        b = (
            F.when(span > 0, F.least(F.lit(nb - 1).cast("long"), scaled.cast("long")))
            .otherwise(F.lit(0))
            .cast("long")
        )
        buckets.append(b)
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * len(cols) + i
            )
    return j.withColumn(key_col, z).drop(
        *[f"__mn_{i}" for i in range(len(cols))],
        *[f"__mx_{i}" for i in range(len(cols))],
    )


def zorder_layout(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 8
) -> DataFrame:
    """Rows arranged for a Z-ordered ``n_files``-file write: range-
    partitioned and sorted on the Morton key (dropped again before the
    write — it is a layout artifact, not data). Write the result with
    any parquet writer; per-file min/max stats come out tight on every
    clustered column."""
    key = "__zorder"
    z = with_zorder_key(df, cols, bits=bits, key_col=key)
    return (
        z.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
    )


def compact_layout(
    df: DataFrame,
    partition_col: str,
    key_cols: list[str],
    rows_per_file: int,
) -> DataFrame:
    """Rows arranged so that a ``partitionBy(partition_col)`` parquet
    write emits ~``ceil(partition_rows / rows_per_file)`` right-sized
    files per partition value — the OPTIMIZE/compaction maintenance pass
    for the small-files problem (a streaming or per-shard ingest leaves
    hundreds of tiny files per partition; at 100 TB the scan's task
    scheduling and footer reads are then dominated by file count, not
    bytes).

    Shape: one map-side-combinable per-partition-value count (broadcast
    back — partition-cardinality rows, bounded metadata, never corpus
    data), then each row salts into ``pmod(xxhash64(key_cols), n_files)``
    and the result hash-repartitions on (partition value, salt). Every
    partition's rewrite therefore spreads over ``n_files`` tasks — NOT
    the classic ``coalesce(1)``-per-partition trap that serializes a hot
    partition's entire rewrite through one task. The join is null-safe,
    so a null partition value compacts like any other (it lands in the
    writer's default-partition directory).

    Two tasks may still merge salts of one partition (hash collision into
    the same shuffle partition), so pair the write with
    ``.option("maxRecordsPerFile", rows_per_file)`` as the hard upper
    bound on file size; the salt bounds task-level parallelism and the
    option bounds file rows. ``key_cols`` must be stable row identifiers
    (the salt — and so the layout — is then deterministic)."""
    if rows_per_file < 1:
        raise ValueError("rows_per_file must be >= 1")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    cnt = df.groupBy(partition_col).agg(F.count(F.lit(1)).alias("__n"))
    j = df.join(
        F.broadcast(cnt.withColumnRenamed(partition_col, "__pc")),
        F.col(partition_col).eqNullSafe(F.col("__pc")),
    )
    # Integral ceil — (n + r − 1) div r — not ceil(n / r): double division
    # is exact only below 2^53 per-partition rows, and the repo's r06
    # discipline is integer arithmetic wherever exactness is claimed
    # (ADVICE r06). `div` is Spark's integral division operator.
    n_files = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"(__n + {rows_per_file - 1}) div {rows_per_file}"),
    )
    salted = j.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), n_files)
    )
    return salted.repartition(F.col(partition_col), F.col("__salt")).drop(
        "__pc", "__n", "__salt"
    )
