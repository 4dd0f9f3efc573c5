"""Local replica of the driver's correctness gate.

Runs every declared query on Spark and its oracle SQL on DuckDB at the
given scale factor, then compares row count, column names, and
order-insensitive values (exact for non-floats, reporting max abs diff
for floats). Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.sources.tables import TABLES  # noqa: E402
from __spark_entry__ import oracle_sql, queries  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df


def compare(name: str, spark_df, oracle_df) -> tuple[bool, str]:
    s, o = normalize(spark_df), normalize(oracle_df)
    if len(s) != len(o):
        return False, f"row count {len(s)} vs {len(o)}"
    if list(s.columns) != list(o.columns):
        return False, f"columns {list(s.columns)} vs {list(o.columns)}"
    issues = []
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sv = pd.to_numeric(sv, errors="coerce")
            ov = pd.to_numeric(ov, errors="coerce")
            both = sv.notna() & ov.notna()
            if (sv.isna() != ov.isna()).any():
                issues.append(f"{c}: null mismatch")
                continue
            diff = (sv[both] - ov[both]).abs()
            if len(diff) and diff.max() > 0:
                issues.append(f"{c}: max float diff {diff.max():.3e}")
        else:
            if not sv.astype(str).equals(ov.astype(str)):
                n_bad = int((sv.astype(str) != ov.astype(str)).sum())
                issues.append(f"{c}: {n_bad} value mismatches")
    return (not issues), "; ".join(issues) or "ok"


def main() -> int:
    args = sys.argv[1:]
    tz = None
    if "--tz" in args:  # adversarial session timezone, e.g. --tz America/New_York
        i = args.index("--tz")
        tz = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("oracle-check")
    if tz:
        spark.conf.set("spark.sql.session.timeZone", tz)
        print(f"session timezone: {tz}")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = queries(), oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        ok, msg = compare(name, sdf, odf)
        status = "PASS" if ok else "FAIL"
        print(f"{status}  {name}: {len(sdf)} rows, {msg} [{time.time()-t0:.1f}s]")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
