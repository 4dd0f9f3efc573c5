"""A/B a Spark conf override set against the baseline session config.

Guide §1 discipline for configuration changes: each (config, repeat)
runs in a FRESH python+JVM subprocess under the bench's exact per-key
methodology (1 warm-up pass, min-of-2 timed, noop sink, cache_scope),
and the A/B runs INTERLEAVE (A B A B ...) so slow-host drift lands on
both arms. Output: per-key and total seconds per arm, ratio B/A.

Usage:
    python tools/probe_conf_ab.py '{"spark.sql.join.preferSortMergeJoin": "false"}' \
        [--repeats 2] [--sf /root/testdata/sf0.1] key [key ...]

Child mode (internal): PROBE_CONF_AB_CHILD=1 with PROBE_CONF_AB_CONF /
PROBE_CONF_AB_KEYS / PROBE_CONF_AB_SF set; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT_KEYS = [
    # a cross-section of the expensive families: audits (SMJ-heavy),
    # flagship retrieval, BPE pipeline, percentiles, dedup CC
    "q_simhash_recall_audit",
    "q_sq8_recall_audit",
    "q_bpe_pack_ids",
    "q26b_retrieval_rank_summary",
    "q_lsh_recall_audit",
    "q_dedup_survivors_best",
    "q_unigram_logprob",
    "q21c_percentiles",
]


def child() -> int:
    from biodata_pipeline_spark import get_spark
    from biodata_pipeline_spark.operators.caching import cache_scope
    from biodata_pipeline_spark.registry import SPARK_QUERIES

    conf = json.loads(os.environ["PROBE_CONF_AB_CONF"])
    keys = os.environ["PROBE_CONF_AB_KEYS"].split(",")
    sf_dir = os.environ["PROBE_CONF_AB_SF"]
    spark = get_spark("conf-ab", extra_conf=conf)

    def run(name: str) -> float:
        with cache_scope():
            t0 = time.time()
            df = SPARK_QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return time.time() - t0

    for name in keys:
        try:
            run(name)
        except Exception:
            pass
        spark.catalog.clearCache()
    timings = {}
    for name in keys:
        timings[name] = round(min(run(name) for _ in range(2)), 3)
        spark.catalog.clearCache()
    print("CHILD_RESULT " + json.dumps(timings))
    return 0


def main() -> int:
    if os.environ.get("PROBE_CONF_AB_CHILD") == "1":
        return child()

    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    override = args.pop(0)
    json.loads(override)  # validate early
    repeats = 2
    sf_dir = "/root/testdata/sf0.1"
    keys: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            keys.append(args[i])
            i += 1
    keys = keys or DEFAULT_KEYS

    def run_arm(conf_json: str) -> dict[str, float]:
        env = dict(os.environ)
        env["PROBE_CONF_AB_CHILD"] = "1"
        env["PROBE_CONF_AB_CONF"] = conf_json
        env["PROBE_CONF_AB_KEYS"] = ",".join(keys)
        env["PROBE_CONF_AB_SF"] = sf_dir
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True,
            text=True,
            env=env,
        )
        line = next(
            (
                ln
                for ln in p.stdout.splitlines()
                if ln.startswith("CHILD_RESULT ")
            ),
            None,
        )
        if line is None:
            raise RuntimeError(f"child failed: {p.stderr[-2000:]}")
        return json.loads(line[len("CHILD_RESULT "):])

    arms: dict[str, list[dict[str, float]]] = {"A": [], "B": []}
    for r in range(repeats):
        print(f"-- repeat {r + 1}/{repeats}: baseline (A)...", flush=True)
        arms["A"].append(run_arm("{}"))
        print(f"-- repeat {r + 1}/{repeats}: override (B)...", flush=True)
        arms["B"].append(run_arm(override))

    best = {
        arm: {k: min(run[k] for run in runs) for k in keys}
        for arm, runs in arms.items()
    }
    print(f"\n{'key':36s} {'A(base)':>8s} {'B(over)':>8s} {'B/A':>6s}")
    for k in keys:
        a, b = best["A"][k], best["B"][k]
        print(f"{k:36s} {a:8.3f} {b:8.3f} {b / a:6.3f}")
    ta, tb = sum(best["A"].values()), sum(best["B"].values())
    print(f"{'TOTAL':36s} {ta:8.3f} {tb:8.3f} {tb / ta:6.3f}")
    print(f"override: {override}")
    print(f"raw: {json.dumps(arms)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
