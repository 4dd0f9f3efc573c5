"""Round-2 surface: multidimensional aggregates (cube / grouping sets /
pivot / distribution windows), repetition + PII corpus filters, and
embedding-cosine dedup survivors — semantics and plan-shape checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodata_pipeline_spark.functions import textfn
from biodata_pipeline_spark.operators.dedup import embedding_dedup_survivors
from biodata_pipeline_spark.plans.inspect import count_shuffles, formatted_plan
from biodata_pipeline_spark.registry import SPARK_QUERIES


def test_cube_is_one_expand_one_shuffle(spark, sf_dir):
    df = SPARK_QUERIES["q_cube_pricing"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Expand" in plan
    # one exchange for the aggregate, regardless of how many levels CUBE adds
    assert count_shuffles(df) == 1


def test_grouping_sets_levels(spark, sf_dir):
    rows = SPARK_QUERIES["q_grouping_sets_revenue"](spark, sf_dir).collect()
    grand = [r for r in rows if r.n_name is None and r.o_orderpriority is None]
    per_nation = [r for r in rows if r.n_name is not None and r.o_orderpriority is None]
    assert len(grand) == 1
    assert grand[0].n_orders == sum(r.n_orders for r in per_nation)
    plan = formatted_plan(SPARK_QUERIES["q_grouping_sets_revenue"](spark, sf_dir))
    assert "Expand" in plan


def test_pivot_matrix_counts_match_groupby(spark, sf_dir):
    wide = SPARK_QUERIES["q_pivot_priority_matrix"](spark, sf_dir).collect()
    total = sum(
        r.urgent + r.high + r.medium + r.not_specified + r.low for r in wide
    )
    from biodata_pipeline_spark.sources.tables import load_table

    assert total == load_table(spark, sf_dir, "orders").count()


def test_ntile_is_partitioned_not_global(spark, sf_dir):
    plan = formatted_plan(SPARK_QUERIES["q_ntile_distribution"](spark, sf_dir))
    # a global (unpartitioned) window would single-task the whole table
    assert "SinglePartition" not in plan


def test_repetition_stats_zero_shuffle(spark, sf_dir):
    df = SPARK_QUERIES["q_repetition_stats"](spark, sf_dir)
    assert count_shuffles(df) == 0


def test_pii_scrub_zero_shuffle(spark, sf_dir):
    df = SPARK_QUERIES["q_pii_scrub"](spark, sf_dir)
    assert count_shuffles(df) == 0


def test_repetition_metrics_on_known_text(spark):
    df = spark.createDataFrame(
        [(0, "a b a b a"), (1, "x y z w"), (2, "solo"), (3, "")],
        ["doc_id", "text"],
    )
    bg = textfn.bigram_array("text")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            F.size(bg).alias("n"),
            textfn.dup_bigram_fraction(bg).alias("dup"),
            textfn.top_bigram_fraction(bg).alias("top"),
        ).collect()
    }
    # "a b a b a": bigrams [a b, b a, a b, b a] -> 4 total, 2 distinct
    assert out[0].n == 4 and out[0].dup == 0.5 and out[0].top == 0.5
    assert out[1].n == 3 and out[1].dup == 0.0
    assert out[2].n == 0 and out[2].dup == 0.0 and out[2].top == 0.0
    assert out[3].n == 0


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@lab.example.org or +1-555-0199-1234"),
            (1, "call +9-123-4567 twice: +9-123-4567"),
            (2, "clean text, no contacts"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            textfn.pii_count("text").alias("n"),
            textfn.scrub_pii("text").alias("s"),
        ).collect()
    }
    assert out[0].n == 2 and "<EMAIL>" in out[0].s and "jane" not in out[0].s
    assert out[1].n == 2 and out[1].s.count("<PHONE>") == 2
    assert out[2].n == 0 and out[2].s == "clean text, no contacts"


def _vec_df(spark):
    # 0 and 1 are identical; 2 is a scaled copy of 0 (cosine 1); 3 orthogonal
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_embedding_dedup_survivors_exact(spark):
    out = embedding_dedup_survivors(_vec_df(spark), threshold=0.99)
    assert sorted(r.vec_id for r in out.collect()) == [0, 3]


def test_embedding_dedup_survivors_approximate_superset(spark):
    # LSH recall < 1: the approximate path may keep extra rows but must
    # never drop a row the exact path keeps
    exact = {r.vec_id for r in embedding_dedup_survivors(_vec_df(spark), 0.99).collect()}
    approx = {
        r.vec_id
        for r in embedding_dedup_survivors(
            _vec_df(spark), 0.99, approximate=True
        ).collect()
    }
    assert exact <= approx


def test_let_binding_preserves_semantics(spark):
    df = spark.createDataFrame([(5,)], ["x"])
    out = df.select(
        textfn._let(F.col("x") * 2, lambda v: v + v).alias("y")
    ).collect()
    assert out[0].y == 20


def test_vectorized_similarity_join_bit_parity(spark, sf_dir):
    """The numpy kernel must reproduce the HOF join exactly — same pairs,
    same 9dp sims, bit-for-bit (in-order fold contract)."""
    from biodata_pipeline_spark.operators.similarity import (
        similarity_join,
        similarity_join_vectorized,
    )
    from biodata_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    hof = similarity_join(emb, 0.25).orderBy("id_a", "id_b").collect()
    vec = similarity_join_vectorized(emb, 0.25).orderBy("id_a", "id_b").collect()
    assert hof == vec and len(hof) > 0


def test_vectorized_similarity_join_enforces_bound(spark, sf_dir):
    """An over-bound frame must never reach the driver collect: the
    default raises naming the bound; on_overflow='lsh' switches to the
    banded equi-join plan instead."""
    import pytest

    from biodata_pipeline_spark.operators.similarity import (
        similarity_join_vectorized,
    )
    from biodata_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    with pytest.raises(ValueError, match="bounded to 10 vectors"):
        similarity_join_vectorized(emb, 0.25, max_vectors=10)
    fallback = similarity_join_vectorized(
        emb, 0.25, max_vectors=10, on_overflow="lsh"
    )
    # the fallback is the LSH plan: a banded equi-join with no cross
    # product and no driver-side collect (its verify kernel is a
    # partition-parallel mapInPandas, unlike the bounded path's
    # broadcast-matrix collect)
    plan = fallback._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert fallback.count() >= 0


def test_stats_corr_close_to_native(spark, sf_dir):
    """The decimal-grid formulation must agree with the native estimators
    to float tolerance (it differs only in accumulation exactness)."""
    from biodata_pipeline_spark.sources.tables import load_table

    out = {
        r.l_returnflag: r
        for r in SPARK_QUERIES["q_stats_corr"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    native = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("l_extendedprice", "l_discount").alias("c"),
            F.stddev("l_extendedprice").alias("s"),
        )
        .collect()
    }
    for k, r in out.items():
        assert abs(r.corr_price_discount - native[k].c) < 1e-6
        assert abs(r.stddev_price - native[k].s) < 0.01


def test_upsert_merge_semantics(spark):
    from biodata_pipeline_spark.operators.upsert import upsert

    existing = spark.createDataFrame(
        [(1, 10, "old-a"), (2, 20, "old-b")], ["key", "version", "val"]
    )
    updates = spark.createDataFrame(
        [(2, 30, "new-b"), (2, 15, "stale-b"), (3, 5, "new-c")],
        ["key", "version", "val"],
    )
    out = {
        r.key: r
        for r in upsert(existing, updates, ["key"], "version", "val").collect()
    }
    assert out[1].val == "old-a"      # untouched key survives
    assert out[2].val == "new-b"      # highest version wins (stale ignored)
    assert out[3].val == "new-c"      # new key inserts
    assert len(out) == 3


def test_sql_entry_point_broadcasts_dims(spark, sf_dir):
    df = SPARK_QUERIES["q_sql_region_revenue"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_upsert_is_single_key_shuffle(spark, sf_dir):
    df = SPARK_QUERIES["q_upsert_latest"](spark, sf_dir)
    # union + window: both sides flow into ONE hash partitioning on the key
    assert count_shuffles(df) == 1


def test_pack_sequences_offsets_and_budget(spark):
    from biodata_pipeline_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(0, "en", 300), (1, "en", 300), (2, "en", 300), (3, "de", 600)],
        ["doc_id", "lang", "n_tokens"],
    )
    out = {
        r.doc_id: r
        for r in pack_sequences(df, "n_tokens", 512, ("lang",)).collect()
    }
    assert out[0].token_offset == 0 and out[0].seq_id == 0
    assert out[1].token_offset == 300 and out[1].seq_id == 0   # straddles 512
    assert out[2].token_offset == 600 and out[2].seq_id == 1
    assert out[3].token_offset == 0 and out[3].seq_id == 0     # separate group


def test_matrix_literal_bit_identical_to_flit(spark):
    """The SQL-parsed plane/centroid matrix must be bit-identical to the
    py4j F.lit conversion it replaces (repr round-trips float64 exactly)."""
    import math

    from biodata_pipeline_spark.operators.similarity import matrix_literal

    mat = [[math.sin(s * 7919 + i * 104729) for i in range(8)] for s in range(3)]
    row = spark.range(1).select(
        matrix_literal(mat).alias("a"), F.lit(mat).alias("b")
    ).collect()[0]
    assert row.a == row.b


def test_mixture_allocation_weights_and_budget(spark, sf_dir):
    from biodata_pipeline_spark.registry.textops import MIX_TOKEN_BUDGET

    rows = SPARK_QUERIES["q_mixture_allocation"](spark, sf_dir).collect()
    assert rows, "expected at least one source"
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    assert all(0.0 < r.sampling_rate <= 1.0 for r in rows)
    # uncapped rates hit the budget in expectation
    if all(r.sampling_rate < 1.0 for r in rows):
        expected = sum(r.sampling_rate * r.n_tokens for r in rows)
        assert abs(expected - MIX_TOKEN_BUDGET) / MIX_TOKEN_BUDGET < 1e-3
    # temperature upsamples small sources: rate ordering is inverse to size
    by_size = sorted(rows, key=lambda r: r.n_tokens)
    rates = [r.sampling_rate for r in by_size]
    assert rates == sorted(rates, reverse=True)


def test_stratified_split_partitions_every_stratum(spark, sf_dir):
    from biodata_pipeline_spark.sources.tables import load_table

    rows = SPARK_QUERIES["q_stratified_split"](spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_total  # exhaustive, disjoint
    assert {r.split for r in rows} <= {"train", "val"}
    # ntile balance: within a lang, quartile sizes differ by at most 1
    per_lang_q = {}
    for r in rows:
        per_lang_q.setdefault(r.lang, {}).setdefault(r.len_quartile, 0)
        per_lang_q[r.lang][r.len_quartile] += r.n_docs
    for lang, qs in per_lang_q.items():
        sizes = list(qs.values())
        assert max(sizes) - min(sizes) <= 1, (lang, qs)


def test_unigram_logprob_semantics(spark, sf_dir):
    from biodata_pipeline_spark.functions.textfn import token_count
    from biodata_pipeline_spark.sources.tables import load_table

    out = SPARK_QUERIES["q_unigram_logprob"](spark, sf_dir)
    rows = out.collect()
    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.count()
    assert len(rows) == n_total
    assert all(r.avg_logprob < 0 for r in rows if r.n_tokens > 0)
    # n_tokens agrees with the tokenizer
    expect = {
        r.doc_id: r.n
        for r in docs.select("doc_id", token_count("text").alias("n")).collect()
    }
    assert all(r.n_tokens == expect[r.doc_id] for r in rows)
    # identical text ⇒ identical score
    by_text = docs.select("doc_id", "text").collect()
    text_of = {r.doc_id: r.text for r in by_text}
    score_of = {}
    for r in rows:
        key = text_of[r.doc_id]
        if key in score_of:
            assert score_of[key] == r.avg_logprob
        else:
            score_of[key] = r.avg_logprob


def test_embed_quantize_invariants(spark, sf_dir):
    rows = SPARK_QUERIES["q_embed_quantize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.q_max <= 127
        assert r.q_l1 >= abs(r.q_sum)
        assert r.scale > 0
    # symmetric quantization saturates at the max-|x| lane: some vector
    # must hit 127 unless every component rounded down
    assert any(r.q_max == 127 for r in rows)


def test_token_entropy_bounds(spark, sf_dir):
    import math

    rows = SPARK_QUERIES["q_token_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_tokens > 0:
            # 0 <= H <= ln(n_tokens) (±5e-7: the 6dp output rounding can
            # round an all-distinct doc's H = ln(n) upward past the bound)
            assert -5e-7 <= r.entropy <= math.log(r.n_tokens) + 5e-7, r


def test_tfidf_df_counts_duplicate_copies(spark, tmp_path):
    """Document frequency must count copies: a term appearing only in
    two identical docs has df=2 (idf ln(3/2)), not df=1, and both
    copies carry identical top-3 rows."""
    import math

    docs = spark.createDataFrame(
        [(1, "zzz aaa"), (2, "zzz aaa"), (3, "bbb ccc ddd")],
        ["doc_id", "text"],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from biodata_pipeline_spark.registry.textops import q_tfidf_top_terms

    out = q_tfidf_top_terms(spark, str(tmp_path))
    rows = {(r.doc_id, r.word): r for r in out.collect()}
    expected = round(1 * math.log(3 / 2), 6)
    assert rows[(1, "zzz")].tfidf == expected
    assert rows[(2, "zzz")].tfidf == expected
    assert rows[(1, "zzz")].rn == rows[(2, "zzz")].rn
    # doc 3's unique terms: df=1 → idf ln(3)
    assert rows[(3, "bbb")].tfidf == round(math.log(3.0), 6)
