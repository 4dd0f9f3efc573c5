"""Training-export queries: deterministic corpus shuffle, token-budgeted
shard manifests, and the temperature-interleaved training schedule.

The reference hands a directory of per-genome text files to its training
script in whatever order the filesystem lists them
(data_generation/generate_narratives_from_data.py:63-72,
train_adapters/RAG-eval-create_model.py:96-117). At 100 TB the export
layer needs three guarantees that directory order cannot give: a
reproducible global shuffle, shards cut by TOKEN budget (what a loader
maps to one worker), and a cross-source interleave that realizes the
mixture weights as an actual reading order. All three are pure
hash/integer arithmetic, so every row is oracle-checkable.

Determinism: md5 order keys (engine-portable), integer `div` for every
derived key (Spark ``div`` ≡ DuckDB ``//`` — exact BIGINT floor
division, no float in any sort key), row_number ties broken by doc_id.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biodata_pipeline_spark.functions import textfn
from biodata_pipeline_spark.operators.sampling import (
    VTIME_SCALE,
    interleave_schedule,
)
from biodata_pipeline_spark.operators.sharding import (
    assign_shards_mod,
    shard_plan,
    shuffle_hash,
)
from biodata_pipeline_spark.sources.tables import load_table

N_SHARDS = 8
SHARD_TOKEN_BUDGET = 4096
SCHEDULE_K = 200

# DuckDB equivalents of the Spark-side hash keys (same md5 contract as
# operators/sampling.py; the 0x-cast idiom is the q_weighted_sample
# precedent)
_ORD = "md5(concat('shuffle', CAST(doc_id AS VARCHAR)))"
_SHARD = (
    "CAST(concat('0x', substr(md5(concat('export', CAST(doc_id AS VARCHAR)"
    f")), 1, 8)) AS BIGINT) % {N_SHARDS}"
)
_TOKS = (
    r"CASE WHEN trim(text) = '' THEN [] "
    r"ELSE string_split_regex(trim(text), '\s+') END"
)


def q_corpus_shuffle(spark, sf_dir):
    """Deterministic corpus shuffle into count-balanced shards: shard by
    salted-md5 mod, position within shard by an independently salted md5
    order. Both keys are pure map expressions; the only shuffle is the
    per-shard rank window (partitioned by shard — bounded state at any
    corpus size). This is the export layout a training reader consumes:
    shard files are written once, workers stream them sequentially, and
    re-running the export reproduces byte-identical assignments."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        assign_shards_mod("doc_id", N_SHARDS, salt="export").alias("shard_id"),
        shuffle_hash("doc_id", "shuffle").alias("__ord"),
    )
    w = Window.partitionBy("shard_id").orderBy("__ord", "doc_id")
    return keyed.withColumn("pos", F.row_number().over(w)).select(
        "doc_id", "shard_id", "pos"
    )


def q_shard_manifest(spark, sf_dir):
    """Token-budgeted shard manifest over the shuffled order: exact
    global running token totals via the two-phase distributed prefix sum
    (operators/sharding.py::ordered_prefix_sum — range-partition, pinned
    partitioning, broadcast partition offsets, per-partition window; no
    global single-partition window), then ``shard_id = offset div
    budget``. Shards are contiguous in shuffle order, within one
    document of the budget, and never split a document — the manifest a
    loader uses to map shards to workers by token count, not file
    count."""
    docs = load_table(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id", textfn.token_count("text").cast("long").alias("n_tokens")
    )
    plan = shard_plan(
        weighted, "doc_id", "n_tokens", budget=SHARD_TOKEN_BUDGET,
        salt="shuffle",
    )
    return plan.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("shard_tokens"),
        F.min("token_offset").cast("long").alias("shard_offset"),
    )


def q_mixture_schedule(spark, sf_dir):
    """First 200 positions of the √-temperature interleaved training
    schedule (operators/sampling.py::interleave_schedule): each source
    emits its docs in shuffle order at rate ∝ √(source size) — the
    reading order that REALIZES q_mixture_allocation's √-weighted rates
    instead of just reporting them. Integer-exact virtual-time keys."""
    docs = load_table(spark, sf_dir, "documents")
    return interleave_schedule(
        docs, "doc_id", "source", k=SCHEDULE_K, salt="interleave"
    )


SPARK = {
    "q_corpus_shuffle": q_corpus_shuffle,
    "q_shard_manifest": q_shard_manifest,
    "q_mixture_schedule": q_mixture_schedule,
}

ORACLE = {
    "q_corpus_shuffle": f"""
        WITH keyed AS (
            SELECT doc_id, {_SHARD} AS shard_id, {_ORD} AS ord
            FROM documents
        )
        SELECT doc_id, shard_id,
               row_number() OVER (
                   PARTITION BY shard_id ORDER BY ord, doc_id
               ) AS pos
        FROM keyed
    """,
    "q_shard_manifest": f"""
        WITH weighted AS (
            SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                   {_ORD} AS ord
            FROM documents
        ),
        offs AS (
            SELECT doc_id, n_tokens,
                   CAST(coalesce(sum(n_tokens) OVER (
                       ORDER BY ord, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS token_offset
            FROM weighted
        )
        SELECT token_offset // {SHARD_TOKEN_BUDGET} AS shard_id,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
               CAST(min(token_offset) AS BIGINT) AS shard_offset
        FROM offs GROUP BY 1
    """,
    "q_mixture_schedule": f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(concat('interleave',
                                           CAST(doc_id AS VARCHAR))), doc_id
                   ) AS rank_in_group,
                   count(*) OVER (PARTITION BY source) AS n
            FROM documents
        ),
        keyed AS (
            SELECT doc_id, source, rank_in_group,
                   CAST(rank_in_group AS BIGINT) * rank_in_group
                       * {VTIME_SCALE} // n AS vtime
            FROM ranked WHERE rank_in_group <= {SCHEDULE_K}
        ),
        top AS (
            SELECT * FROM keyed
            ORDER BY vtime, source NULLS FIRST, rank_in_group
            LIMIT {SCHEDULE_K}
        )
        SELECT row_number() OVER (
                   ORDER BY vtime, source NULLS FIRST, rank_in_group
               ) AS position,
               doc_id, source, rank_in_group, vtime
        FROM top
    """,
}
