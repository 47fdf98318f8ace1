"""Local mirror of the driver's correctness gate: run each registered query
on Spark and its oracle on DuckDB over the same parquet fixtures, and
compare row count + column names + order-insensitive values.

Usable as a pytest helper and as a CLI:

    python -m dbt_ci_demo_spark.oracle_check --sf /root/testdata/sf0.001
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd


def duckdb_connection(sf_dir: str, tables: list[str] | None = None) -> duckdb.DuckDBPyConnection:
    from dbt_ci_demo_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for name in tables or TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    out = df.reindex(sorted(df.columns), axis=1).copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            out[c] = s.map(lambda v: float(v) if hasattr(v, "as_tuple") else v)
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort", na_position="last")
    return out.reset_index(drop=True)


def _value_kind(series: pd.Series) -> str:
    """Classify a column by its first non-null cell, the way a strict
    value-hasher sees it (int vs float vs str ...). DuckDB HUGEINT surfaces
    as float64 while Spark LONG stays int64 — value-equality hides that,
    the driver's hash does not, so the local gate must flag it too."""
    import numpy as np

    for v in series:
        if v is None or v is pd.NaT:
            continue
        if isinstance(v, float) and math.isnan(v):
            continue
        if isinstance(v, (list, dict, np.ndarray)):
            return "unhashable"
        if isinstance(v, (bool, np.bool_)):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, (pd.Timestamp,)) or hasattr(v, "tzinfo"):
            return "datetime"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        return type(v).__name__
    return "all-null"


def _values_equal(a, b, float_tol: float = 0.0) -> bool:
    if a is None and b is None:
        return True
    if (a is None) != (b is None):
        return False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        if float_tol == 0.0:
            return fa == fb
        return abs(fa - fb) <= float_tol * max(1.0, abs(fa), abs(fb))
    return a == b


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""
    mismatches: list = field(default_factory=list)


def compare_frames(
    name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, float_tol: float = 0.0
) -> CompareResult:
    s, o = _normalize(spark_pdf), _normalize(oracle_pdf)
    if list(s.columns) != list(o.columns):
        return CompareResult(
            name, False, len(s), len(o), f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}"
        )
    if len(s) != len(o):
        return CompareResult(name, False, len(s), len(o), "row count differs")
    for col in s.columns:
        ks, ko = _value_kind(s[col]), _value_kind(o[col])
        if "unhashable" in (ks, ko):
            return CompareResult(
                name, False, len(s), len(o),
                f"column {col!r} holds list/array cells — the driver's hasher rejects these",
            )
        if ks != ko and "all-null" not in (ks, ko):
            return CompareResult(
                name, False, len(s), len(o),
                f"dtype kind mismatch on {col!r}: spark={ks} oracle={ko} (driver hash would fail)",
            )
    mism = []
    sv, ov = s.to_numpy(dtype=object), o.to_numpy(dtype=object)
    for i in range(len(s)):
        for j, col in enumerate(s.columns):
            a, b = sv[i][j], ov[i][j]
            a = None if (a is pd.NaT or (isinstance(a, float) and math.isnan(a)) or a is None) else a
            b = None if (b is pd.NaT or (isinstance(b, float) and math.isnan(b)) or b is None) else b
            if isinstance(a, pd.Timestamp):
                a = a.to_pydatetime()
            if isinstance(b, pd.Timestamp):
                b = b.to_pydatetime()
            if not _values_equal(a, b, float_tol):
                mism.append((i, col, a, b))
                if len(mism) >= 5:
                    return CompareResult(name, False, len(s), len(o), "value mismatch", mism)
    if mism:
        return CompareResult(name, False, len(s), len(o), "value mismatch", mism)
    return CompareResult(name, True, len(s), len(o))


def check_query(spark, con, name: str, sf_dir: str, float_tol: float = 0.0) -> CompareResult:
    from dbt_ci_demo_spark.queries import registry_oracles, registry_queries

    fn = registry_queries()[name]
    sql = registry_oracles().get(name)
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        return CompareResult(name, True, len(sdf), -1, "rows-only (no oracle)")
    odf = con.execute(sql).fetchdf()
    return compare_frames(name, sdf, odf, float_tol)


def main() -> int:
    import argparse

    from dbt_ci_demo_spark.queries import registry_queries
    from dbt_ci_demo_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--float-tol", type=float, default=0.0)
    args = ap.parse_args()

    spark = get_spark("oracle-check")
    con = duckdb_connection(args.sf)
    names = args.only or list(registry_queries())
    failed = 0
    for name in names:
        try:
            r = check_query(spark, con, name, args.sf, args.float_tol)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: EXCEPTION {type(e).__name__}: {e}")
            failed += 1
            continue
        status = "ok" if r.ok else "FAIL"
        print(f"{status:5} {name}: spark={r.spark_rows} oracle={r.oracle_rows} {r.detail}")
        for m in r.mismatches[:5]:
            print(f"        row {m[0]} col {m[1]}: spark={m[2]!r} oracle={m[3]!r}")
        failed += 0 if r.ok else 1
    print(f"{len(names) - failed}/{len(names)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
