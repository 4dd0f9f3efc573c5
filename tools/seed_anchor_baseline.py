"""Seed BENCH_ANCHOR_FRESH.json — the fresh-JVM anchor baseline
(VERDICT r14 #2, shipped r15).

The anchor compares this run's fresh-JVM walls fresh-to-fresh against
each key's last clean-host fresh-JVM wall; without a seeded file the
first drifted round falls back to the warm-baseline arm whose blind
spot (the per-JVM warm-up constant) produced two consecutive false
"regression" verdicts. This script measures every anchorable headline
key (prev wall > 0.3 s — sub-noise keys can't anchor) under the
anchor's EXACT regime — chunks of ANCHOR_N keys per fresh JVM, one
warm-up + min-of-2 — and folds the walls into the baseline file via
the same clean-host-gated update the anchor itself uses: a contended
chunk is discarded and retried once, then skipped (a loaded host must
never poison the baseline).

Usage: python tools/seed_anchor_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def measure_chunk(keys: list[str], sf_dir: str) -> dict[str, float] | None:
    """One fresh-JVM batch child over ``keys`` (the anchor's regime).
    Returns per-key steady seconds, or None when the child failed."""
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_KEYS"] = ",".join(keys)
    env["SPARK_GRAFT_BENCH_CHILD"] = "1"
    env["SPARK_GRAFT_BENCH_WARMUPS"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__), "bench.py")],
        capture_output=True,
        text=True,
        env=env,
    )
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith('{"metric"')),
        None,
    )
    if line is None:
        print(f"  chunk FAILED: {proc.stderr[-300:]}", file=sys.stderr)
        return None
    return json.loads(line)["queries"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    prev = bench.prev_bench()
    prev_queries = prev[1] if prev else {}
    # anchorable = headline keys whose recorded wall clears the anchor's
    # own sub-noise gate; fall back to "all headline" with no record
    keys = [
        k for k in bench.HEADLINE
        if prev_queries.get(k, 1.0) > 0.3
    ]
    ncpu = os.cpu_count() or 1
    chunks = [
        keys[i : i + bench.ANCHOR_N]
        for i in range(0, len(keys), bench.ANCHOR_N)
    ]
    print(f"seeding {len(keys)} keys in {len(chunks)} fresh-JVM chunks")
    n_ok = n_skip = 0
    for ci, chunk in enumerate(chunks):
        for attempt in (1, 2):
            bench.wait_for_idle(ncpu)
            load1 = os.getloadavg()[0] / ncpu
            cal = bench.calibrate_host()
            cal_mt = bench.calibrate_host_mt()
            walls = measure_chunk(chunk, sf_dir)
            cal_after = bench.calibrate_host()
            cal_mt_after = bench.calibrate_host_mt()
            cal_factor = round(
                max(
                    max(cal, cal_after) / bench.CAL_IDLE_SEC,
                    max(cal_mt, cal_mt_after) / bench.CAL_MT_IDLE_SEC,
                ),
                2,
            )
            if walls is None:
                continue
            if bench.update_anchor_fresh_baseline(
                walls, cal_factor, round(load1, 3)
            ):
                n_ok += 1
                print(
                    f"  [{ci + 1}/{len(chunks)}] ok cal={cal_factor} "
                    + " ".join(f"{k}={walls[k]:.2f}" for k in chunk)
                )
                break
            print(
                f"  [{ci + 1}/{len(chunks)}] contended "
                f"(cal={cal_factor}, load1/cpu={load1:.2f}) "
                f"attempt {attempt}"
            )
        else:
            n_skip += 1
    print(f"done: {n_ok} chunks folded, {n_skip} skipped (contended)")
    return 0 if n_skip == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
