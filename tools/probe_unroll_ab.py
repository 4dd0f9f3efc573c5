"""A/B: interpreted HOF fold vs unrolled fixed-dim codegen expression
for the pairwise scoring streams (guide §4.1 "prefer built-ins inside
codegen"; Spark's higher-order functions are CodegenFallback —
evaluated interpreted, per element, inside the codegen stage).

Two experiments, each timed as the scored-stream noop (the exact stage
the audits pay, isolated from the rank phases):

  cosine:  dot(q,c)/(nq*nc) over |Q|x|C| pairs — HOF aggregate/zip_with
           vs sum_i get(q,i)*get(c,i) built left-associative ascending
           (bit-identical float64 fold; 0.0 + first term reproduces the
           fold's zero start exactly, including the -0.0 edge).
  hamming: sum_w bit_count(xor(a_w,b_w)) over packed words — HOF fold
           vs unrolled 2-word sum (integer math, trivially exact).

Fresh JVM per (variant, repeat), interleaved A B A B, 1 warm + min-of-2
per arm — the probe_conf_ab discipline.

Usage: python tools/probe_unroll_ab.py [--sf DIR] [--repeats N]
Child:  PROBE_UNROLL_CHILD=<cosine_hof|cosine_unroll|ham_hof|ham_unroll>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

N_QUERIES = 100  # the audits' sample size


def _unrolled_dot(a, b, dim):
    from pyspark.sql import functions as F

    s = F.lit(0.0)
    for i in range(dim):
        s = s + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return s


def _unrolled_norm(a, dim):
    from pyspark.sql import functions as F

    s = F.lit(0.0)
    for i in range(dim):
        s = s + F.get(a, i).cast("double") * F.get(a, i).cast("double")
    return F.sqrt(s)


def child(which: str) -> int:
    from pyspark.sql import functions as F

    from biodata_pipeline_spark import get_spark
    from biodata_pipeline_spark.functions.vector import dot, l2_norm
    from biodata_pipeline_spark.registry.vector import (
        EMB_DIM,
        _bq_corpus,
        _bq_thr_for,
        _pq_corpus,
    )

    sf_dir = os.environ["PROBE_UNROLL_SF"]
    spark = get_spark("unroll-ab")
    nparts = spark.sparkContext.defaultParallelism

    def scored_cosine(unroll: bool):
        emb = _pq_corpus(spark, sf_dir)
        queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_emb"),
        )
        if unroll:
            nq = _unrolled_norm(F.col("query_emb"), EMB_DIM)
            ncol = _unrolled_norm(F.col("embedding"), EMB_DIM)
            d = _unrolled_dot(F.col("query_emb"), F.col("embedding"), EMB_DIM)
        else:
            nq = l2_norm(F.col("query_emb"))
            ncol = l2_norm(F.col("embedding"))
            d = dot(F.col("query_emb"), F.col("embedding"))
        corpus = emb.withColumn("__nc", ncol).repartition(nparts)
        qs = queries.withColumn("__nq", nq)
        return corpus.crossJoin(F.broadcast(qs)).select(
            "query_id",
            "vec_id",
            F.round(d / (F.col("__nq") * F.col("__nc")), 9).alias("sim"),
        )

    def scored_hamming(unroll: bool):
        from biodata_pipeline_spark.operators.bq import (
            bq_encode,
            bq_encode_kernel,
            hamming,
        )

        emb = _bq_corpus(spark, sf_dir)
        thr = _bq_thr_for(spark, sf_dir)
        codes = bq_encode_kernel(emb, thr)
        queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_emb"),
        )
        q = (
            bq_encode(
                queries.select("query_id", F.col("query_emb").alias("__qe")),
                thr, emb_col="__qe", words_col="__qw",
            )
            .filter(F.col("__qw").isNotNull())
            .dropDuplicates(["query_id"])
        )
        pairs = q.crossJoin(codes.filter(F.col("bq_words").isNotNull()))
        if unroll:
            n_words = len(thr["thr"]) // 32
            h = F.lit(0).cast("long")
            for w in range(n_words):
                h = h + F.bit_count(
                    F.get("__qw", w).bitwiseXOR(F.get("bq_words", w))
                ).cast("long")
            ham = h.cast("int")
        else:
            ham = hamming("__qw", "bq_words")
        return pairs.select("query_id", "vec_id", ham.alias("hamming"))

    build = {
        "cosine_hof": lambda: scored_cosine(False),
        "cosine_unroll": lambda: scored_cosine(True),
        "ham_hof": lambda: scored_hamming(False),
        "ham_unroll": lambda: scored_hamming(True),
    }[which]

    def run() -> float:
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run()  # warm
    walls = [run() for _ in range(2)]
    print("CHILD_RESULT " + json.dumps({"which": which, "min": min(walls),
                                        "runs": walls}))
    return 0


def main() -> int:
    w = os.environ.get("PROBE_UNROLL_CHILD")
    if w:
        return child(w)
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    repeats = 2
    pairs = [("cosine_hof", "cosine_unroll"), ("ham_hof", "ham_unroll")]
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--repeats":
            repeats = int(args[i + 1]); i += 2
        elif args[i] == "--only":
            pairs = [p for p in pairs if p[0].startswith(args[i + 1])]
            i += 2
        else:
            i += 1

    def arm(which: str) -> float:
        env = dict(os.environ)
        env["PROBE_UNROLL_CHILD"] = which
        env["PROBE_UNROLL_SF"] = sf_dir
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env,
        )
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("CHILD_RESULT ")), None)
        if line is None:
            raise RuntimeError(f"child {which} failed: {p.stderr[-1500:]}")
        return json.loads(line[len("CHILD_RESULT "):])["min"]

    for a, b in pairs:
        best_a, best_b = [], []
        for r in range(repeats):
            best_a.append(arm(a))
            best_b.append(arm(b))
            print(f"  rep{r + 1}: {a}={best_a[-1]:.3f} {b}={best_b[-1]:.3f}",
                  flush=True)
        ta, tb = min(best_a), min(best_b)
        print(f"{a:16s} {ta:7.3f}  vs  {b:16s} {tb:7.3f}  B/A={tb / ta:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
