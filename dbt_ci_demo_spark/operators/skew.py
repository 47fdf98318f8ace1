"""Skew-handling operators: explicit salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most runtime skew,
but two patterns still need explicit salting at 100 TB:

- **Join skew with a replicable build side** (:func:`salted_join`): when a
  few join keys dominate (one user = 5% of events), all their rows land on
  one reducer. Salting the probe side into S sub-keys and replicating the
  build side S× bounds any reducer at 1/S of the hot key. Deterministic:
  the salt is derived from a hash of a probe-side column, not rand(), so
  results are reproducible and oracle-checkable.

- **Exact distinct-count under key skew** (:func:`salted_count_distinct`):
  count(distinct v) per hot key funnels every (key, v) pair through the
  key's reducer. Salting by hash(v) % S makes the per-(key, salt) distinct
  sets *disjoint*, so partial distinct counts sum to the exact global
  count — two balanced shuffles instead of one hot one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted into ``n_salts`` sub-keys and
    the build side replicated once per salt. Result is identical to
    ``probe.join(build, key, how)``; the shuffle key becomes (key, salt),
    so a hot key spreads over ``n_salts`` reducers.

    ``salt_from`` is REQUIRED: a probe-side column whose hash varies
    *within* a join key (e.g. an event id). Hashing the key itself would
    give every row of a hot key the same salt — no skew mitigation while
    still paying the ``n_salts``× build-side replication — so that is
    rejected rather than silently accepted.

    ``how`` must be probe-preserving (inner / left / left_semi /
    left_anti): the build side is REPLICATED once per salt, so a right or
    full outer join would emit every unmatched build row ``n_salts``
    times — not the unsalted join's result. Those join types are
    rejected loudly (r11 review); salt the other side by swapping the
    arguments instead."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi",
        "left_anti", "leftanti", "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not probe-preserving — the "
            f"replicated build side would duplicate unmatched build rows "
            f"{n_salts}x under a right/full outer join; swap the sides "
            "or use a plain join"
        )
    if salt_from is None or salt_from == key:
        raise ValueError(
            "salted_join: pass salt_from= a probe-side column that varies "
            f"within a join key (got {salt_from!r}); hash({key!r}) is "
            "constant per key and cannot spread a hot key across reducers"
        )
    salt_col = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    p = probe.withColumn("__salt", salt_col.cast("int"))
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return p.join(b, on=[key, "__salt"], how=how).drop("__salt")


def salted_count_distinct(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """Exact count(distinct value) per key via disjoint salt partitions:
    salt = hash(value) % S ⇒ each distinct value belongs to exactly one
    (key, salt) group ⇒ the partial distinct counts are disjoint and sum
    to the exact answer. Output: (key, n_distinct)."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    salt = F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).cast("int")
    partial = (
        df.select(F.col(key), F.col(value), salt.alias("__salt"))
        .groupBy(key, "__salt")
        .agg(F.count_distinct(F.col(value)).alias("__n"))
    )
    return partial.groupBy(key).agg(F.sum("__n").alias("n_distinct"))
