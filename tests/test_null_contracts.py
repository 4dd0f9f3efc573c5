"""Null-handling contracts (round-6 null probe, tools/probe_nulls.py).

The synthetic testdata has no NULLs; a 100 TB corpus does. The probe
found 14 declared queries that crashed or diverged from the oracle on a
null-injected replica; these tests pin the root-cause fixes so they
cannot silently regress. The probe itself remains the full-surface
sweep (all declared queries vs DuckDB on the corrupted tables).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def null_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, None),
            (3, "the quick brown fox jumps over the lazy dog again"),
            (4, None),
        ],
        "doc_id long, text string",
    )


def test_token_shingles_null_text_is_empty_not_phantom(spark, null_docs):
    """token_shingles(NULL) must be [], not [NULL]: the phantom shingle
    gave every null doc the SAME lane hashes (concat_ws skips nulls), so
    15 null docs banded into one fake duplicate cluster."""
    from biodata_pipeline_spark.operators.dedup import token_shingles

    out = null_docs.select(
        "doc_id", token_shingles(F.col("text"), 3).alias("sh")
    ).collect()
    by_id = {r.doc_id: r.sh for r in out}
    assert by_id[2] == [] and by_id[4] == []
    assert len(by_id[1]) > 0


def test_minhash_md5_banding_ignores_null_docs(spark, null_docs):
    from biodata_pipeline_spark.operators.audit import (
        minhash_candidate_pairs_md5,
    )

    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs_md5(
            null_docs, id_col="doc_id"
        ).collect()
    }
    assert (1, 3) in pairs  # the real duplicate pair survives
    assert not any(2 in p or 4 in p for p in pairs)


def test_embedding_ops_exclude_null_vectors(spark):
    from biodata_pipeline_spark.operators.dedup import (
        embedding_dedup_survivors,
    )
    from biodata_pipeline_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )
    from biodata_pipeline_spark.operators.similarity import (
        similarity_join_vectorized,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(8)] + [(8, None), (9, None)],
        "vec_id long, embedding array<double>",
    )
    # exact pair join: no crash on ragged input, no null ids in pairs
    pairs = similarity_join_vectorized(emb, 0.99).collect()
    assert all(r.id_a < 8 and r.id_b < 8 for r in pairs)
    # survivors: null vectors neither match nor survive
    surv = {r.vec_id for r in embedding_dedup_survivors(emb, 0.999).collect()}
    assert surv and 8 not in surv and 9 not in surv
    # kmeans: fit + assignment skip geometry-less rows instead of
    # crashing the centroid update
    cents = kmeans_fit(emb, k=2, iters=1)
    assigned = assign_clusters(emb, cents)
    ids = {r.vec_id for r in assigned.collect()}
    assert 8 not in ids and 9 not in ids


def test_lang_guess_null_in_null_out(spark, null_docs):
    from biodata_pipeline_spark.functions.textfn import lang_guess

    out = {
        r.doc_id: r.g
        for r in null_docs.select(
            "doc_id", lang_guess("text").alias("g")
        ).collect()
    }
    assert out[2] is None and out[4] is None
    assert out[1] is not None


def test_decode_image_meta_null_payload_is_null_metadata(spark):
    """A NULL payload is a missing asset: row preserved, metadata NULL —
    not a fake 1x1 zero-byte image with a real checksum."""
    from biodata_pipeline_spark.operators.multimodal import (
        decode_image_meta,
        documents_as_media,
    )

    docs = spark.createDataFrame(
        [(1, "some text"), (2, None)], "doc_id long, text string"
    )
    out = {
        r.media_id: r
        for r in decode_image_meta(
            documents_as_media(docs), fake=True
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[2].n_bytes is None and out[2].checksum is None
    assert out[2].width is None and out[2].n_frames is None
    assert out[1].n_bytes == 9 and out[1].checksum is not None


def test_embedding_defect_classifies_every_class(spark):
    from biodata_pipeline_spark.functions.vector import embedding_defect

    rows = [
        (1, None),
        (2, [1.0] * 32),
        (3, [float("nan")] + [1.0] * 63),
        (4, [0.0] * 64),
        (5, [0.5] * 64),
        (6, [float("inf")] + [1.0] * 63),
        (7, [0.5] * 63 + [None]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<float>")
    got = {
        r.vec_id: r.d
        for r in df.select(
            "vec_id", embedding_defect("emb", 64).alias("d")
        ).collect()
    }
    assert got == {
        1: "null",
        2: "wrong_dim",
        3: "non_finite",
        4: "zero_norm",
        5: "ok",
        6: "non_finite",
        # the cross-engine trap (ADVICE r6): a NULL element used to fall
        # through every three-valued branch to 'ok' in Spark while
        # DuckDB's NULL-skipping list folds could class it 'zero_norm'
        7: "null_element",
    }


def test_tokenizer_unicode_whitespace_parity_with_oracle(spark):
    """Cross-engine tokenizer boundary, verified: Spark's Java-regex
    \\s+ (no UNICODE_CHARACTER_CLASS) and DuckDB's RE2 \\s+ both treat
    ONLY ASCII whitespace as separators — NBSP / U+3000 / zero-width
    space stay inside tokens, identically. A multilingual corpus that
    wants those split must add an upstream NFKC/whitespace
    normalization pass; the engines' agreement is what this test pins."""
    import duckdb

    from biodata_pipeline_spark.functions.textfn import tokens

    samples = [
        "plain ascii text",
        "nbsp\xa0separated\xa0words",
        "ideographic　space",
        "tab\tand\nnewline",
        "emoji \U0001f642 in text",
        "zero​width",
        "combining \xe9 accent",
    ]
    con = duckdb.connect()
    expected = [
        con.sql(
            "SELECT string_split_regex(trim(?), '\\s+')", params=[s]
        ).fetchone()[0]
        for s in samples
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, text string"
    )
    got = {
        r.i: r.t
        for r in df.select(
            "i", tokens(F.col("text")).alias("t")
        ).collect()
    }
    for i, exp in enumerate(expected):
        assert got[i] == exp, (samples[i], got[i], exp)
