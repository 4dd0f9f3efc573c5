"""A/B: CPU-heavy aggregate over a single-row-group parquet scan, with
and without a post-scan spread repartition.

Context (OPTIMIZATION r16): every testdata parquet file is ONE row
group, and parquet scans cannot split inside a row group — so the
openCostInBytes floor VERDICT r15 #1 ordered can only manufacture EMPTY
tasks (3 splits = 1 working + 2 empty). The only way to parallelize the
decode + partial-agg work on this layout is to move the rows once after
the scan. That is a plan change (one extra Exchange), so it must win
the measured A/B and be gated to the small-input regime (at 100 TB the
scan has thousands of row groups and the branch must never fire).

Usage: python tools/probe_spread_ab.py [--sf DIR] [--repeats N]
Child:  PROBE_SPREAD_CHILD=<key>:<spread|base>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

KEYS = ["q21c_percentiles", "q_stats_corr", "q_percentile_accuracy_audit"]


def child(spec: str) -> int:
    from pyspark.sql import functions as F

    from biodata_pipeline_spark import get_spark
    from biodata_pipeline_spark.registry import SPARK_QUERIES
    from biodata_pipeline_spark.sources import tables as T

    key, mode = spec.rsplit(":", 1)
    sf_dir = os.environ["PROBE_SPREAD_SF"]
    spark = get_spark("spread-ab")

    if mode == "spread":
        # monkey-patch load_table to spread the lineitem scan — probe
        # only; the shipped form would live in the three queries
        orig = T.load_table

        def patched(spark_, sf, name, **kw):
            df = orig(spark_, sf, name, **kw)
            if name == "lineitem":
                df = df.repartition(
                    spark_.sparkContext.defaultParallelism
                )
            return df

        T.load_table = patched
        # registry modules hold their own reference
        import biodata_pipeline_spark.registry.relational as R
        import biodata_pipeline_spark.registry.analytic as A

        R.load_table = patched
        if hasattr(A, "load_table"):
            A.load_table = patched

    def run() -> float:
        t0 = time.time()
        SPARK_QUERIES[key](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    run()
    walls = [run() for _ in range(2)]
    print("CHILD_RESULT " + json.dumps({"spec": spec, "min": min(walls)}))
    return 0


def main() -> int:
    spec = os.environ.get("PROBE_SPREAD_CHILD")
    if spec:
        return child(spec)
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    repeats = 2
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--repeats":
            repeats = int(args[i + 1]); i += 2
        else:
            i += 1

    def arm(spec: str) -> float:
        env = dict(os.environ)
        env["PROBE_SPREAD_CHILD"] = spec
        env["PROBE_SPREAD_SF"] = sf_dir
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env,
        )
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("CHILD_RESULT ")), None)
        if line is None:
            raise RuntimeError(f"child {spec} failed: {p.stderr[-1500:]}")
        return json.loads(line[len("CHILD_RESULT "):])["min"]

    for key in KEYS:
        a_best, b_best = [], []
        for r in range(repeats):
            a_best.append(arm(f"{key}:base"))
            b_best.append(arm(f"{key}:spread"))
            print(f"  rep{r+1} {key}: base={a_best[-1]:.3f} "
                  f"spread={b_best[-1]:.3f}", flush=True)
        ta, tb = min(a_best), min(b_best)
        print(f"{key:32s} base={ta:6.3f} spread={tb:6.3f} ratio={tb/ta:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
