"""q26b bistability probe (VERDICT r10 #3).

q26b_retrieval_rank_summary swung 3.06 s <-> 23.6/39.5 s across idle
fresh JVMs (r10 review; the driver saw 12.9/5.2) — sticky per JVM,
identical code and data. Suspects: AQE broadcast->SMJ flip, codegen
compile cliff, GC. This probe runs the key in N consecutive fresh JVMs
(the bench batch discipline) and records, per JVM:

- cold + warm wall for the DETAIL (q26) and the SUMMARY-on-top (q26b),
  separately — localizes whether the swing lives in the scored-stream
  pipeline or the dual aggregate;
- a plan fingerprint: md5 of the executed (post-AQE) plan tree with
  expression ids stripped — a fast/slow run pair with DIFFERENT
  fingerprints means a plan flip, identical fingerprints mean a
  runtime effect (JIT/GC/scheduling);
- total JVM GC milliseconds across each timed step (GarbageCollector
  MXBeans), and whole-JVM peak heap;
- 1-min loadavg at JVM start (contention witness).

Usage: python tools/probe_q26b_bistability.py [n_jvms]  (default 5)
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_fingerprint(df) -> str:
    """md5 of the executed plan with ALL naming counters normalized —
    stable across JVMs iff the physical strategy is the same.

    r11 finding: expr-ids alone are not enough. Catalyst's lambda
    variables (``lambda x_9``), whole-stage-codegen ids (``*(7)``),
    query-stage numbers (``ShuffleQueryStage 9``) and RDD ids all come
    from per-session counters whose values depend on how many plans ran
    before this one — the first fingerprint version flagged
    structurally IDENTICAL q26b plans as different (verified by
    normalized unified diff: every diff line was a counter)."""
    txt = df._jdf.queryExecution().executedPlan().toString()
    txt = re.sub(r"#\d+[L]?", "#x", txt)
    txt = re.sub(r"lambda [a-z]+_\d+", "lambda v", txt)
    txt = re.sub(r"\*\(\d+\)", "*(n)", txt)
    txt = re.sub(r"(ShuffleQueryStage|BroadcastQueryStage|TableCacheQueryStage) \d+", r"\1 n", txt)
    txt = re.sub(r"\[\d+\]", "[n]", txt)
    txt = re.sub(r"\[plan_id=\d+\]", "", txt)
    txt = re.sub(r"id=#?\d+", "id=x", txt)
    return hashlib.md5(txt.encode()).hexdigest()[:12]


def gc_ms(spark) -> int:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(b.getCollectionTime() for b in beans)


def child() -> None:
    from biodata_pipeline_spark import get_spark
    from biodata_pipeline_spark.operators.caching import cache_scope
    from biodata_pipeline_spark.registry import SPARK_QUERIES

    spark = get_spark("probe-q26b")
    out: dict = {"loadavg_start": round(os.getloadavg()[0], 2)}

    def timed(key: str):
        with cache_scope():
            g0, t0 = gc_ms(spark), time.time()
            df = SPARK_QUERIES[key](spark, SF_DIR)
            rows = df.collect()
            wall = round(time.time() - t0, 2)
            fp = plan_fingerprint(df)
        return wall, gc_ms(spark) - g0, fp, len(rows)

    runs = []
    for i in range(2):  # cold, then warm
        d_wall, d_gc, d_fp, _ = timed("q26_retrieval_rank_detail")
        s_wall, s_gc, s_fp, _ = timed("q26b_retrieval_rank_summary")
        runs.append(
            {
                "pass": "cold" if i == 0 else "warm",
                "detail_wall": d_wall,
                "detail_gc_ms": d_gc,
                "detail_plan": d_fp,
                "summary_wall": s_wall,
                "summary_gc_ms": s_gc,
                "summary_plan": s_fp,
            }
        )
    out["runs"] = runs
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    out["heap_used_gb"] = round(
        (rt.totalMemory() - rt.freeMemory()) / 1e9, 2
    )
    print("PROBE_JSON " + json.dumps(out), flush=True)


def main() -> None:
    if os.environ.get("PROBE_Q26B_CHILD") == "1":
        child()
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    results = []
    for i in range(n):
        env = dict(os.environ)
        env["PROBE_Q26B_CHILD"] = "1"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True,
            text=True,
            env=env,
        )
        line = next(
            (
                ln[len("PROBE_JSON "):]
                for ln in proc.stdout.splitlines()
                if ln.startswith("PROBE_JSON ")
            ),
            None,
        )
        if line is None:
            print(json.dumps({"jvm": i, "error": proc.stderr[-500:]}))
            continue
        doc = json.loads(line)
        doc["jvm"] = i
        results.append(doc)
        print(json.dumps(doc), flush=True)
    # cross-JVM summary: plan-fingerprint agreement + wall spread
    walls = [r["runs"][1]["summary_wall"] for r in results if "runs" in r]
    fps = {
        (r["runs"][0]["summary_plan"], r["runs"][1]["summary_plan"])
        for r in results
    }
    print(
        json.dumps(
            {
                "probe": "q26b_bistability",
                "n_jvms": len(results),
                "warm_summary_walls": walls,
                "max_over_min": round(max(walls) / min(walls), 2) if walls else None,
                "distinct_plan_fingerprints": len(fps),
            }
        )
    )


if __name__ == "__main__":
    main()
