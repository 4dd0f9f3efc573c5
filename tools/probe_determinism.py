"""Partition-invariance sweep: every declared query, two cluster shapes.

A 100 TB deployment never runs at local[32]'s parallelism: shuffle
partition counts, AQE coalescing, and partial-aggregation order all
change with cluster size. A query whose OUTPUT changes with them is a
latent correctness bug — float folds whose order leaks into the result,
limits without total order, per-partition state that should be global.
This probe runs every declared query twice in the same JVM —

  shape A: the engine defaults (shuffle.partitions=32, AQE on)
  shape B: shuffle.partitions=7, AQE off (odd partition count forces
           different fold groupings; no AQE coalescing/skew rewrites)

— and compares the results exactly like the oracle gate (sorted rows,
exact for non-floats, max abs diff for floats). PASS means the result
is bit-stable across cluster shapes; FLOAT reports the max float
divergence (any nonzero diff is worth a look: it means the value
depends on aggregation order and only rounding discipline is containing
it); FAIL means values or row counts genuinely differ.

Usage:
    python tools/probe_determinism.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import pandas as pd

sys.path.insert(0, "/root/repo")

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.caching import cache_scope  # noqa: E402
from tools.check_oracle import normalize  # noqa: E402
from __spark_entry__ import queries  # noqa: E402

SHAPE_B = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.adaptive.enabled": "false",
}


def _run(spark, fn, sf_dir: str) -> pd.DataFrame:
    with cache_scope():
        return fn(spark, sf_dir).toPandas()


def compare_runs(a: pd.DataFrame, b: pd.DataFrame) -> tuple[str, str]:
    a, b = normalize(a), normalize(b)
    if len(a) != len(b):
        return "FAIL", f"row count {len(a)} vs {len(b)}"
    if list(a.columns) != list(b.columns):
        return "FAIL", f"columns {list(a.columns)} vs {list(b.columns)}"
    worst = 0.0
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            if (av.isna() != bv.isna()).any():
                return "FAIL", f"{c}: null pattern differs"
            both = av.notna() & bv.notna()
            diff = (av[both] - bv[both]).abs()
            if len(diff):
                worst = max(worst, float(diff.max()))
        else:
            if not av.astype(str).equals(bv.astype(str)):
                n_bad = int((av.astype(str) != bv.astype(str)).sum())
                return "FAIL", f"{c}: {n_bad} value mismatches"
    if worst > 0:
        return "FLOAT", f"max float diff {worst:.3e}"
    return "PASS", "bit-stable"


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_spark("determinism-probe")
    defaults = {k: spark.conf.get(k) for k in SHAPE_B}

    qs = queries()
    names = [n for n in qs if not only or n in only]
    results: dict[str, pd.DataFrame | None] = {}
    for name in names:  # shape A: engine defaults
        try:
            results[name] = _run(spark, qs[name], sf_dir)
        except Exception:
            print(f"FAIL  {name}: shape-A error\n{traceback.format_exc()}")
            results[name] = None

    for k, v in SHAPE_B.items():
        spark.conf.set(k, v)
    n_pass = n_float = n_fail = 0
    try:
        for name in names:
            if results[name] is None:
                n_fail += 1
                continue
            t0 = time.time()
            try:
                bdf = _run(spark, qs[name], sf_dir)
            except Exception:
                print(f"FAIL  {name}: shape-B error\n{traceback.format_exc()}")
                n_fail += 1
                continue
            status, msg = compare_runs(results[name], bdf)
            print(
                f"{status:5s} {name}: {len(bdf)} rows, {msg} "
                f"[{time.time() - t0:.1f}s]"
            )
            n_pass += status == "PASS"
            n_float += status == "FLOAT"
            n_fail += status == "FAIL"
    finally:
        for k, v in defaults.items():
            spark.conf.set(k, v)
    print(f"\n{n_pass} bit-stable, {n_float} float-divergent, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
