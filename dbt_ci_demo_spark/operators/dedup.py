"""Deduplication operators for large-scale training-data pipelines.

The reference has no dedup surface (SURVEY.md §2.B.8); these extend the
engine per the driver's north star. Every operator is pure DataFrame
algebra over built-in functions — no Python UDFs — so the hot path stays
in whole-stage codegen and scales with executors.

Determinism contract: all hashing is md5-based (not hash()/xxhash64,
whose seeds/implementations differ between engines), so the DuckDB
oracles replicate signatures bit-for-bit.

Scale design:
- exact dedup: one shuffle on the content hash.
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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def minhash_signatures(
    shingles: DataFrame, id_col: str, n_hashes: int = 32
) -> DataFrame:
    """MinHash signature per document: sig_i = min over shingles of
    md5(i || ':' || shingle). One groupBy computes all N mins (one pass,
    map-side partial aggregation). md5-as-hex min == 128-bit numeric min
    because the hex rendering is fixed-width."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(n_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, n_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``n_hashes // bands`` rows, hash each band, and emit document pairs
    sharing any (band_id, band_hash) bucket. The self-join shuffles on the
    band hash — bucket sizes are the scale knob, not corpus size²."""
    rows = n_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws("|", *[F.col(f"sig_{b * rows + r}") for r in range(rows)])
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("b")
    ).select(id_col, "b.band_id", "b.band_hash")
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


def jaccard_scores(
    shingles: DataFrame, id_col: str, pairs: DataFrame
) -> DataFrame:
    """Exact Jaccard similarity for candidate pairs from their distinct
    shingle sets: |A∩B| / (|A|+|B|-|A∩B|). Joins are keyed by document id
    (candidates) and shingle (intersection) — both co-partitioned shuffles."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sh_a = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = shingles.select(F.col(id_col).alias("id_b"), "shingle")
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
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle → signature → banded
    candidates → exact-Jaccard verification ≥ threshold."""
    sh = word_shingles(df, text_col, id_col, k)
    sig = minhash_signatures(sh, id_col, n_hashes)
    cand = lsh_candidate_pairs(sig, id_col, n_hashes, bands)
    return jaccard_scores(sh, id_col, cand).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"
# popcount of a nibble value 0..15
_NIBBLE_POPCOUNT = [bin(v).count("1") for v in range(16)]


def _nibble_val(hash_col: Column, k: int) -> Column:
    """Value 0..15 of hex char k (0-based) of an md5 string — engine-portable
    via instr on the hex alphabet."""
    return F.instr(F.lit(_HEX), F.substring(hash_col, k + 1, 1)) - 1


def simhash32(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """32-bit SimHash per document over distinct lowercase word tokens.

    Bit j (= 4*k + b for hex char k, bit b) of a token's md5 contributes +1;
    the signature bit is 1 iff at least half the tokens set it. Built from
    substring/instr/floor arithmetic only, so any ANSI engine reproduces it
    exactly."""
    tokens = (
        df.select(
            F.col(id_col),
            F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .withColumn("h", F.md5("tok"))
    )
    bit_sums = tokens.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        *[
            F.sum(
                (F.floor(_nibble_val(F.col("h"), j // 4) / (2 ** (j % 4))) % 2).cast("long")
            ).alias(f"bit_{j}")
            for j in range(32)
        ],
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
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming (≤ 3).

    Candidates come from 4-block banding of the 32-bit signature: if two
    hashes differ in ≤ 3 bits, at least one 8-bit block is identical
    (pigeonhole), so banded candidate generation has *guaranteed* recall —
    the result provably equals brute force while the join stays bucketed."""
    if max_hamming > 3:
        raise ValueError("4-block banding guarantees recall only for max_hamming <= 3")
    sig = simhash32(df, text_col, id_col)
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
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
