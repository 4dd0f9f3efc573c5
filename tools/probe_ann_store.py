"""Scale probe for the persistent IVF index (VectorIndexStore): add and
query cost as the enrolled corpus grows.

The store's scale claims: ``add`` is a broadcast-assignment map over
the NEW batch only (flat in index size); ``query`` scans ~n_probe/k of
the corpus via the cell equi-join (grows with per-cell occupancy, i.e.
linearly in corpus size at fixed k — the IVF trade; raise k to hold
per-cell size). This probe enrolls deterministic synthetic vectors at
three sizes, then times: adding the SAME 1k-vector batch, and a
20-query top-10 search at n_probe=4/k=64, on both the parquet-append
and compacted layouts (results asserted identical).

Round 9 adds the sample-trained build comparison: quantizer trained on
the md5-top-25k deterministic sample vs the full corpus (same k/iters),
reporting both build times and recall@10 of each against the exact
brute-force top-10 — the claim under test is that build cost stops
growing with corpus size while recall holds.

Round 10 adds the operating-curve sweep (VERDICT r9 #3): at one corpus
rung, recall@10 and query wall for n_probe x k_cells grid points —
the table that backs ``recommended_n_probe``'s calibration (the
reference retrieves with k = corpus size, i.e. implicit recall 1.0
[RAG-eval-test_model.py:247-248]; the sweep finds the cheapest probe
setting that approximates it at >= 0.9).

Usage: python tools/probe_ann_store.py [sizes ...]
       (default: 20000 200000 1000000)
       python tools/probe_ann_store.py --sweep [n]      (default 200000)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.ann_store import (  # noqa: E402
    VectorIndexStore,
)

DIM = 64
K_CELLS = 64
N_PROBE = 4
BATCH = 1000
N_QUERIES = 20


def synth_vecs(spark, n: int, id_base: int = 0):
    """Deterministic dense vectors: component j of vector i =
    (xxhash64(i, j) % 1000) / 500 - 1 — cheap, reproducible, spread."""
    vid = (F.col("id") + id_base).alias("vec_id")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)).cast("double")
            / 500.0
            - 1.0
        ).cast("float"),
    ).alias("embedding")
    return spark.range(n).select(vid, emb).repartition(32)


def sweep(n: int = 200_000) -> None:
    """recall@10 / query-wall operating curve: k_cells x n_probe grid
    at one corpus rung. One sample-trained build per k_cells; exact
    brute-force top-10 computed ONCE for the corpus; per grid point a
    20-query top-10 probe (min of 2, same discipline as bench.py)."""
    from biodata_pipeline_spark.operators.similarity import brute_force_ann

    spark = get_spark("probe-ann-sweep")
    base = synth_vecs(spark, n).localCheckpoint()
    q = synth_vecs(spark, N_QUERIES, id_base=20_000_000).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
    ).localCheckpoint()
    exact = {
        (r.query_id, r.vec_id) for r in brute_force_ann(q, base, 10).collect()
    }
    rows = []
    for k_cells in (16, 64, 256):
        path = tempfile.mkdtemp(prefix=f"annsweep_{k_cells}_")
        shutil.rmtree(path)
        store = VectorIndexStore(path)
        t0 = time.time()
        store.build(base, k=k_cells, iters=2, train_sample=25_000)
        build_secs = round(time.time() - t0, 2)
        for n_probe in (1, 2, 4, 8, 16, 32):
            if n_probe > k_cells:
                continue
            walls, got = [], None
            for _ in range(2):
                t0 = time.time()
                got = {
                    (r.query_id, r.vec_id)
                    for r in store.query(q, k=10, n_probe=n_probe).collect()
                }
                walls.append(time.time() - t0)
            rec = round(len(got & exact) / len(exact), 4)
            row = {
                "k_cells": k_cells,
                "n_probe": n_probe,
                "recall_at_10": rec,
                "query_secs": round(min(walls), 2),
                "build_secs": build_secs,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({"probe": "ann_sweep", "n": n, "rows": rows}))


def calibrate(n: int = 1_000_000, target: float = 0.9) -> None:
    """measured_n_probe on the ladder corpus (VERDICT r11 #6): the
    setting a user would actually ship. Builds the n-vector store
    (k=64, sample-trained), runs the measured calibration at the
    target, and reports the returned n_probe, the measured walk (each
    power-of-two step's recall), the conservative recommended_n_probe
    bound it must sit at-or-under, and the store's recall@10 at the
    returned setting against exact brute force on the SAME query set
    the calibration saw."""
    from biodata_pipeline_spark.operators.ann_store import (
        measured_n_probe,
        recommended_n_probe,
    )
    from biodata_pipeline_spark.operators.similarity import brute_force_ann

    spark = get_spark("probe-ann-calibrate")
    base = synth_vecs(spark, n).localCheckpoint()
    q = synth_vecs(spark, 32, id_base=20_000_000).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
    ).localCheckpoint()
    path = tempfile.mkdtemp(prefix="anncal_")
    shutil.rmtree(path)
    store = VectorIndexStore(path)
    t0 = time.time()
    store.build(base, k=K_CELLS, iters=2, train_sample=25_000)
    build_secs = round(time.time() - t0, 2)

    t0 = time.time()
    n_probe = measured_n_probe(store, q, target_recall=target, k=10)
    cal_secs = round(time.time() - t0, 2)
    bound = recommended_n_probe(K_CELLS, target)

    # independent recall check at the returned setting: IVF hits vs
    # exact brute force (measured_n_probe's own truth is the n_probe =
    # n_cells exhaustive ranking, identical by the exhaustive-exact
    # contract — this re-derives it from the other implementation)
    exact = {
        (r.query_id, r.vec_id) for r in brute_force_ann(q, base, 10).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in store.query(q, k=10, n_probe=n_probe).collect()
    }
    recall = round(len(got & exact) / len(exact), 4)
    print(
        json.dumps(
            {
                "probe": "ann_calibrate",
                "n": n,
                "k_cells": K_CELLS,
                "target_recall": target,
                "measured_n_probe": n_probe,
                "recommended_bound": bound,
                "recall_at_returned_setting": recall,
                "build_secs": build_secs,
                "calibrate_secs": cal_secs,
            }
        )
    )
    shutil.rmtree(path, ignore_errors=True)


def main() -> None:
    if sys.argv[1:2] == ["--sweep"]:
        sweep(int(sys.argv[2]) if len(sys.argv) > 2 else 200_000)
        return
    if sys.argv[1:2] == ["--calibrate"]:
        calibrate(
            int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000,
            float(sys.argv[3]) if len(sys.argv) > 3 else 0.9,
        )
        return
    sizes = [int(s) for s in sys.argv[1:]] or [20_000, 200_000, 1_000_000]
    spark = get_spark("probe-ann-store")
    results = {}
    for n in sizes:
        path = tempfile.mkdtemp(prefix="annprobe_")
        shutil.rmtree(path)
        store = VectorIndexStore(path)
        base = synth_vecs(spark, n).localCheckpoint()
        t0 = time.time()
        store.build(base, k=K_CELLS, iters=2)
        build_secs = round(time.time() - t0, 2)

        # the sample-trained build: quantizer from the md5-top-25k
        # sample (FAISS-style bounded training set), full corpus only
        # assigned once — the cost that should stop growing with n
        spath = tempfile.mkdtemp(prefix="annprobe_s_")
        shutil.rmtree(spath)
        sstore = VectorIndexStore(spath)
        t0 = time.time()
        sstore.build(base, k=K_CELLS, iters=2, train_sample=25_000)
        build_secs_sampled = round(time.time() - t0, 2)

        batch = synth_vecs(spark, BATCH, id_base=10_000_000).localCheckpoint()
        t0 = time.time()
        store.add(batch, batch_id="b1")
        add_secs = round(time.time() - t0, 2)
        sstore.add(batch, batch_id="b1")  # same corpus in both stores

        q = synth_vecs(spark, N_QUERIES, id_base=20_000_000).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_emb"),
        ).localCheckpoint()
        t0 = time.time()
        plain = sorted(
            (r.query_id, r.vec_id, r.rank)
            for r in store.query(q, k=10, n_probe=N_PROBE).collect()
        )
        query_secs = round(time.time() - t0, 2)

        # recall of each quantizer at the probe setting vs exact top-10
        # (brute force over the enrolled corpus) — the number that tells
        # whether the bounded training set cost any result quality
        from biodata_pipeline_spark.operators.similarity import (
            brute_force_ann,
        )

        enrolled = base.unionByName(batch)
        exact = {
            (r.query_id, r.vec_id)
            for r in brute_force_ann(q, enrolled, 10).collect()
        }
        sampled = sorted(
            (r.query_id, r.vec_id, r.rank)
            for r in sstore.query(q, k=10, n_probe=N_PROBE).collect()
        )
        recall_full = round(
            len({(a, b) for a, b, _ in plain} & exact) / len(exact), 4
        )
        recall_sampled = round(
            len({(a, b) for a, b, _ in sampled} & exact) / len(exact), 4
        )
        shutil.rmtree(spath, ignore_errors=True)

        t0 = time.time()
        store.compact(spark, n_buckets=16)
        compact_secs = round(time.time() - t0, 2)
        t0 = time.time()
        compacted = sorted(
            (r.query_id, r.vec_id, r.rank)
            for r in store.query(q, k=10, n_probe=N_PROBE).collect()
        )
        query_secs_c = round(time.time() - t0, 2)
        assert compacted == plain, "compacted query results diverged"

        results[n] = {
            "build_secs": build_secs,
            "build_secs_sampled": build_secs_sampled,
            "recall_at_10_full_train": recall_full,
            "recall_at_10_sample_train": recall_sampled,
            "add_1k_secs": add_secs,
            "query_20x10_secs": query_secs,
            "query_20x10_secs_compacted": query_secs_c,
            "compact_secs": compact_secs,
        }
        print(json.dumps({n: results[n]}), flush=True)
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({"probe": "ann_store", "k_cells": K_CELLS,
                      "n_probe": N_PROBE, "results": results}))


if __name__ == "__main__":
    main()
