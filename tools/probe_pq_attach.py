"""Localize the enable_pq attach-wall variance at the 1M rung
(VERDICT r14 #6: the r14 ladder probe read 62-181 s across repeats —
a 3x spread attributed to the noisy host but never decomposed).

Protocol: settle-before discipline (wait_for_idle + calibration spin
bracketing every timing), then at the rung

  1. ``enable_pq`` wall, repeated ``--repeats`` times on the same
     built store (idempotent retrain — the production re-attach path);
  2. a stage decomposition replicating enable_pq's exact sequence on
     the same inputs: live-union read, md5_top_n sample + persist,
     structure probe, pq_fit (the m x (1+iters) Lloyd chains), encode
     kernel + localCheckpoint, and the store mutation (retire + write)
     measured as total-minus-stages.

If the repeat spread collapses on an idle host, the r14 spread was
contention; if it persists, the dominant stage names the next fix.

Usage: python tools/probe_pq_attach.py [--n N] [--repeats R]
       (default n=1000000, repeats=3)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.ann_store import (  # noqa: E402
    VectorIndexStore,
    _index_component_frames,
    _structure_ratio,
)
from biodata_pipeline_spark.operators.pq import (  # noqa: E402
    pq_encode_kernel,
    pq_fit,
    recommended_k_sub,
)
from biodata_pipeline_spark.operators.sampling import md5_top_n  # noqa: E402
from tools.probe_ann_store import synth_vecs  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

K_CELLS = 64
TRAIN_SAMPLE = 100_000


def _settle() -> dict:
    ncpu = os.cpu_count() or 1
    settled = bench.wait_for_idle(ncpu)
    return {
        "settled": settled,
        "load1_per_cpu": round(os.getloadavg()[0] / ncpu, 3),
        "cal_factor": round(bench.calibrate_host() / bench.CAL_IDLE_SEC, 2),
    }


def main() -> int:
    n = 1_000_000
    repeats = 3
    args = sys.argv[1:]
    if "--n" in args:
        n = int(args[args.index("--n") + 1])
    if "--repeats" in args:
        repeats = int(args[args.index("--repeats") + 1])

    spark = get_spark("probe-pq-attach")
    base = synth_vecs(spark, n).localCheckpoint()
    path = tempfile.mkdtemp(prefix=f"pqattach_{n}_")
    shutil.rmtree(path)
    store = VectorIndexStore(path)
    t0 = time.time()
    store.build(base, k=K_CELLS, iters=2, train_sample=25_000)
    out = {"n": n, "build_secs": round(time.time() - t0, 2), "attach": []}

    # 1. repeated idempotent attach walls, contention-bracketed
    for i in range(repeats):
        pre = _settle()
        t0 = time.time()
        store.enable_pq(spark, train_sample=TRAIN_SAMPLE)
        wall = round(time.time() - t0, 2)
        post = {
            "load1_per_cpu": round(
                os.getloadavg()[0] / (os.cpu_count() or 1), 3
            ),
            "cal_factor": round(
                bench.calibrate_host() / bench.CAL_IDLE_SEC, 2
            ),
        }
        out["attach"].append({"wall": wall, "pre": pre, "post": post})
        print(json.dumps(out["attach"][-1]))

    # 2. stage decomposition on the same inputs (enable_pq's sequence)
    stages = {}
    pre = _settle()
    cents = store.centroids(spark)
    parts = _index_component_frames(spark, store.path, "assignments")
    full = parts[0].select("id", "emb", "cell")
    for p in parts[1:]:
        full = full.unionByName(p.select("id", "emb", "cell"))
    live = store._minus_tombstones(spark, full.dropDuplicates(["id"]))

    t0 = time.time()
    n_live = live.count()
    stages["live_count"] = round(time.time() - t0, 2)
    k_sub = recommended_k_sub(n_live)

    t0 = time.time()
    sample = md5_top_n(live, TRAIN_SAMPLE, "id").persist()
    sample.count()  # materialize the persist like the Lloyd pass would
    stages["sample_select_persist"] = round(time.time() - t0, 2)

    t0 = time.time()
    _structure_ratio(sample, cents)
    stages["structure_probe"] = round(time.time() - t0, 2)

    t0 = time.time()
    books = pq_fit(
        sample.select(
            F.col("id").alias("vec_id"), F.col("emb").alias("embedding")
        ),
        k_sub=k_sub,
        train_sample=None,
    )
    stages["pq_fit_lloyd"] = round(time.time() - t0, 2)
    sample.unpersist()

    t0 = time.time()
    coded = pq_encode_kernel(live, books, emb_col="emb").select(
        "id", "cell", "codes"
    ).localCheckpoint()
    n_coded = coded.count()
    stages["encode_checkpoint"] = round(time.time() - t0, 2)

    out["stages"] = stages
    out["stages_pre"] = pre
    out["k_sub"] = k_sub
    out["n_coded"] = n_coded
    out["stage_total"] = round(sum(stages.values()), 2)
    # store mutation cost ~= attach wall minus the replicated stages
    walls = [a["wall"] for a in out["attach"]]
    out["attach_spread"] = round(max(walls) / min(walls), 2)
    print(json.dumps(out))
    shutil.rmtree(path, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
