"""Training-export layout: distributed prefix sum, shard planning,
corpus shuffle, and the temperature-interleave schedule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biodata_pipeline_spark.operators.sampling import interleave_schedule
from biodata_pipeline_spark.operators.sharding import (
    assign_shards_mod,
    ordered_prefix_sum,
    shard_plan,
    shuffle_hash,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_ordered_prefix_sum_matches_serial(spark):
    """The two-phase distributed prefix sum must equal the serial cumsum
    over the same total order — for every row, at several partition
    counts (the result is invariant to where the range partitioner
    cuts)."""
    df = spark.read.parquet(DOCS).select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    )
    rows = sorted(df.collect(), key=lambda r: r.doc_id)
    expect, run = {}, 0
    for r in rows:
        expect[r.doc_id] = run
        run += r.w
    for parts in (1, 3, 16):
        got = {
            r.doc_id: r.running_total
            for r in ordered_prefix_sum(
                df, ["doc_id"], "w", num_partitions=parts
            ).collect()
        }
        assert got == expect, f"parts={parts}"


def test_ordered_prefix_sum_rejects_runaway_partitions(spark):
    df = spark.range(10).withColumn("w", F.lit(1))
    with pytest.raises(ValueError, match="PREFIX_SUM_MAX_PARTS"):
        ordered_prefix_sum(df, ["id"], "w", num_partitions=100_000)


def test_shard_plan_budget_invariants(spark):
    """Shards are contiguous in shuffle order, each starts below a budget
    boundary, never splits a document, and token totals reconcile."""
    budget = 500
    df = spark.read.parquet(DOCS).select(
        "doc_id", F.col("n_chars").cast("long").alias("n_tokens")
    )
    plan = shard_plan(df, "doc_id", "n_tokens", budget, num_partitions=4)
    rows = sorted(plan.collect(), key=lambda r: r.token_offset)
    assert len(rows) == df.count()
    total = 0
    prev_shard = 0
    for r in rows:
        assert r.token_offset == total  # contiguous exclusive offsets
        assert r.shard_id == r.token_offset // budget
        assert r.shard_id >= prev_shard  # nondecreasing along the order
        prev_shard = r.shard_id
        total += r.n_tokens
    # a doc longer than the budget legitimately skips shard ids (it owns
    # the windows it spans), so ids need not be contiguous — but the
    # distinct count is bounded by the budget arithmetic
    distinct = len({r.shard_id for r in rows})
    assert distinct <= -(-total // budget)  # ceil(total/budget)


def test_shard_plan_deterministic_across_runs(spark):
    df = spark.read.parquet(DOCS).select(
        "doc_id", F.col("n_chars").cast("long").alias("n_tokens")
    )
    a = {
        r.doc_id: (r.shard_id, r.token_offset)
        for r in shard_plan(df, "doc_id", "n_tokens", 500).collect()
    }
    b = {
        r.doc_id: (r.shard_id, r.token_offset)
        for r in shard_plan(
            df.repartition(7), "doc_id", "n_tokens", 500, num_partitions=2
        ).collect()
    }
    assert a == b


def test_shard_plan_rejects_bad_budget(spark):
    df = spark.range(5).withColumn("w", F.lit(1))
    with pytest.raises(ValueError, match="budget"):
        shard_plan(df, "id", "w", 0)


def test_assign_shards_mod_balanced_and_pure(spark):
    df = spark.range(2000).select(
        F.col("id"), assign_shards_mod("id", 8).alias("s")
    )
    counts = {r.s: r.c for r in df.groupBy("s").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == set(range(8))
    assert max(counts.values()) < 2 * min(counts.values())
    # salt independence: different salt ⇒ different permutation
    other = spark.range(2000).select(
        assign_shards_mod("id", 8, salt="other").alias("s")
    )
    assert df.select("s").collect() != other.collect()


def test_interleave_schedule_rates_follow_sqrt(spark):
    """A group 4× larger must appear ~2× as often in a long prefix
    (rate ∝ √n), and positions must be 1..k with exact integer vtimes."""
    rows = [(i, "big") for i in range(400)] + [(10_000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    sched = interleave_schedule(df, "doc_id", "source", k=300).collect()
    assert [r.position for r in sched] == list(range(1, 301))
    big = sum(1 for r in sched if r.source == "big")
    small = 300 - big
    assert 1.6 <= big / small <= 2.5  # √(400/100) = 2
    # vtime is nondecreasing along the schedule
    vts = [r.vtime for r in sched]
    assert vts == sorted(vts)


def test_interleave_schedule_k_validation(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"), F.lit("s").alias("source"))
    with pytest.raises(ValueError, match="positive"):
        interleave_schedule(df, "doc_id", "source", 0)
    with pytest.raises(ValueError, match="3000"):
        interleave_schedule(df, "doc_id", "source", 5000)


def test_shuffle_hash_salt_independence(spark):
    df = spark.range(100)
    a = [r[0] for r in df.select(shuffle_hash("id", "a")).collect()]
    b = [r[0] for r in df.select(shuffle_hash("id", "b")).collect()]
    assert a != b and len(set(a)) == 100


def test_pack_sequences_global_matches_windowed(spark):
    """The distributed global packer must agree row-for-row with the
    single-group window packer (the semantics it scales out)."""
    from biodata_pipeline_spark.operators.packing import (
        pack_sequences,
        pack_sequences_global,
    )

    df = spark.read.parquet(DOCS).select(
        "doc_id", F.col("n_chars").cast("long").alias("n_tokens")
    )
    ref = {
        r.doc_id: (r.token_offset, r.seq_id)
        for r in pack_sequences(df, "n_tokens", budget=700).collect()
    }
    got = {
        r.doc_id: (r.token_offset, r.seq_id)
        for r in pack_sequences_global(
            df, "n_tokens", budget=700, num_partitions=5
        ).collect()
    }
    assert got == ref


def test_incremental_shard_plan_continues_after_manifest(spark):
    """Batch-append semantics: old shards untouched, new docs begin in
    the last shard's budget window iff it has room, combined token
    accounting reconciles, and batch 1's plan equals the standalone
    plan of its docs."""
    from biodata_pipeline_spark.operators.sharding import incremental_shard_plan

    budget = 1000
    b1 = spark.createDataFrame(
        [(i, 300) for i in range(10)], "doc_id long, n_tokens long"
    )
    b2 = spark.createDataFrame(
        [(100 + i, 300) for i in range(10)], "doc_id long, n_tokens long"
    )
    p1 = incremental_shard_plan(b1, None, "doc_id", "n_tokens", budget)
    assert {r.doc_id: r.shard_id for r in p1.collect()} == {
        r.doc_id: r.shard_id
        for r in shard_plan(b1, "doc_id", "n_tokens", budget).collect()
    }
    man1 = p1.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("shard_tokens"),
    )
    p2 = incremental_shard_plan(b2, man1, "doc_id", "n_tokens", budget)
    rows1 = sorted(p1.collect(), key=lambda r: r.token_offset)
    rows2 = sorted(p2.collect(), key=lambda r: r.token_offset)
    total1 = sum(r.n_tokens for r in rows1)
    # batch 2 offsets continue exactly where batch 1 ended
    assert rows2[0].token_offset == total1
    offs = total1
    for r in rows2:
        assert r.token_offset == offs
        assert r.shard_id == r.token_offset // budget
        offs += r.n_tokens
    # first new shard id >= last old shard id (reuse iff room)
    assert rows2[0].shard_id >= rows1[-1].shard_id


def test_incremental_shard_plan_empty_manifest_frame(spark):
    from biodata_pipeline_spark.operators.sharding import incremental_shard_plan

    docs = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    empty_man = spark.createDataFrame(
        [], "shard_id long, n_docs long, shard_tokens long"
    )
    got = incremental_shard_plan(docs, empty_man, "doc_id", "n_tokens", 100)
    assert got.first().token_offset == 0


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_prefix_sum_property_random_weights(spark, data):
    """Property: for random non-negative weights (zeros included) and a
    random partition count, the distributed prefix sum equals the serial
    cumsum — on both bucketing strategies."""
    from biodata_pipeline_spark.operators.sharding import hex_prefix_bucket

    n = data.draw(st.integers(1, 40))
    weights = [data.draw(st.integers(0, 1000)) for _ in range(n)]
    parts = data.draw(st.sampled_from([1, 2, 7]))
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long").withColumn(
        "h", shuffle_hash("doc_id", "prop")
    )
    # serial truth over the md5-hash order
    hashed = sorted(
        df.select("doc_id", "h", "w").collect(), key=lambda r: (r.h, r.doc_id)
    )
    expect, run = {}, 0
    for r in hashed:
        expect[r.doc_id] = run
        run += r.w
    for bucket in (None, hex_prefix_bucket("h", parts)):
        got = {
            r.doc_id: r.running_total
            for r in ordered_prefix_sum(
                df, ["h", "doc_id"], "w",
                num_partitions=parts, bucket_of=bucket,
            ).collect()
        }
        assert got == expect
