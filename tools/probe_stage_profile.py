"""Stage-level wall/compute decomposition for headline queries.

For each named query: one warm-up pass, one timed pass, then the
per-stage metrics of the timed pass from the local UI REST API
(http://localhost:4040) — stage wall span, executor run time (summed
task compute), shuffle read/write bytes, task count. The decomposition
answers the guide-§1 question the bare bench wall cannot: is this key
compute-bound (executorRunTime ≈ wall × slots), barrier-bound (many
stages, short tasks), or driver-bound (wall ≫ sum of stage spans)?

Usage:
    python tools/probe_stage_profile.py [sf_dir] key [key ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.caching import cache_scope  # noqa: E402
from biodata_pipeline_spark.registry import SPARK_QUERIES  # noqa: E402

UI = "http://localhost:4040/api/v1"


def api(path: str):
    with urllib.request.urlopen(f"{UI}{path}") as r:
        return json.load(r)


def run_key(spark, name: str, sf_dir: str) -> float:
    with cache_scope():
        t0 = time.time()
        df = SPARK_QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]
    keys = args or ["q_simhash_recall_audit"]

    spark = get_spark(
        "stage-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    app_id = spark.sparkContext.applicationId

    for name in keys:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        run_key(spark, name, sf_dir)
        spark.catalog.clearCache()

        jobs_before = {j["jobId"] for j in api(f"/applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"timed:{name}")
        wall = run_key(spark, name, sf_dir)
        spark.catalog.clearCache()

        jobs = [
            j
            for j in api(f"/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in api(f"/applications/{app_id}/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        tot_run = sum(s.get("executorRunTime", 0) for s in stages)
        tot_cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e6
        tot_sr = sum(s.get("shuffleReadBytes", 0) for s in stages)
        tot_sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        tot_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
        print(
            f"\n=== {name}: wall {wall:.2f}s | jobs {len(jobs)} | "
            f"stages {len(stages)} | tasks {tot_tasks} | "
            f"execRun {tot_run/1000:.2f}s | execCpu {tot_cpu/1000:.2f}s | "
            f"shufR {tot_sr/1e6:.1f}MB shufW {tot_sw/1e6:.1f}MB"
        )
        for s in sorted(
            stages, key=lambda s: -s.get("executorRunTime", 0)
        )[:8]:
            print(
                f"  stage {s['stageId']:4d} tasks={s.get('numCompleteTasks', 0):4d} "
                f"run={s.get('executorRunTime', 0)/1000:6.2f}s "
                f"cpu={s.get('executorCpuTime', 0)/1e9:6.2f}s "
                f"sr={s.get('shuffleReadBytes', 0)/1e6:7.2f}MB "
                f"sw={s.get('shuffleWriteBytes', 0)/1e6:7.2f}MB  "
                f"{s.get('name', '')[:90]}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
