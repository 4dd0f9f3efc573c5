"""Deduplication operators for LLM training corpora.

The reference dedups *work units* by file existence
(generate_narratives_from_data.py:63-65); a training-data engine needs
content dedup too. Five strategies, all shuffle-conscious:

 - exact: hash group-by on normalized text (one shuffle on the hash).
 - n-gram Jaccard: exact set similarity over token shingles via
   explode + equi-join on shingle — deterministic, oracle-checkable.
 - MinHash + LSH banding: signature → band buckets → equi-join; near-dup
   pairs verified with the true Jaccard. The only shuffles are on band
   buckets and the candidate verification.
 - SimHash: 64-bit sign-of-weighted-sum fingerprint; near-dups = small
   Hamming distance within band buckets.
 - embedding cosine: delegates to the similarity-join operators.

Everything is built on xxhash64 (JVM-side, codegen'd) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biodata_pipeline_spark.functions.textfn import tokens


def normalized(col) -> F.Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per distinct normalized text.

    groupBy on the normalized text hash → single shuffle with map-side
    partial aggregation; survivors joined back by id.
    """
    keyed = df.withColumn("__h", F.xxhash64(normalized(F.col(text_col))))
    keepers = keyed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return keyed.join(keepers, [ "__h", id_col]).drop("__h")


def token_shingles(text_col, n: int = 3) -> F.Column:
    """Distinct n-token shingles (joined with a separator) of a text column."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingle = lambda i: F.array_join(F.slice(toks, i + 1, n), " ")  # noqa: E731
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(idx, shingle))
    )


def _exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(token_shingles(F.col(text_col), n)).alias("sh"),
    )


def ngram_jaccard_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact Jaccard similarity over n-token shingle sets.

    |A∩B| comes from an equi-join on the shingle (co-partitioned shuffle, no
    cross product); |A∪B| = |A|+|B|−|A∩B|. Output: id_a, id_b, jaccard.
    """
    sh = _exploded_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                9,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _seeded_hash(seed: int):
    return lambda s: F.xxhash64(F.concat(F.lit(f"{seed}:"), s))


def minhash_signature_from(shingles_col, num_hashes: int = 32) -> F.Column:
    """MinHash signature over an already-materialized shingle-array column:
    per hash function i, the min over shingles of xxhash64(i ⊕ shingle).

    Takes a *column reference*, not the shingling expression — inlining
    ``token_shingles`` here would make Catalyst recompute the shingling
    ``num_hashes`` times per row (measured 40× slowdown)."""
    sh = F.col(shingles_col) if isinstance(shingles_col, str) else shingles_col
    return F.array(
        *[F.array_min(F.transform(sh, _seeded_hash(i))) for i in range(num_hashes)]
    )


def minhash_signature(text_col, n: int = 3, num_hashes: int = 32) -> F.Column:
    """MinHash signature straight from text (convenience; for bulk use,
    materialize the shingles first and call ``minhash_signature_from``)."""
    return minhash_signature_from(token_shingles(text_col, n), num_hashes)


def minhash_lsh_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    n_bands: int = 8,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with the exact Jaccard.

    Banding: signature split into ``n_bands`` bands of ``num_hashes/n_bands``
    rows; docs sharing any full band collide. Collision probability for
    similarity s is 1-(1-s^r)^b — with (32, 8) the curve's knee sits near
    s≈0.6. Candidates are verified exactly, so precision is 1.0 and the
    only approximation is recall below the knee.
    """
    if num_hashes % n_bands:
        raise ValueError("num_hashes must divide evenly into n_bands")
    r = num_hashes // n_bands
    # Materialize shingles once; every downstream expression references the
    # column instead of re-deriving it (signature, banding, verification).
    base = df.select(
        F.col(id_col).alias("id"),
        token_shingles(F.col(text_col), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    sig = base.withColumn("sig", minhash_signature_from("sh", num_hashes))
    bands = sig.select(
        "id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * r + j + 1).cast("string")
                                for j in range(r)
                            ],
                        )
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    cands = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("__sa"),
            F.col("b.sh").alias("__sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # Exact verification of candidates only (shingle sets carried along).
    sa, sb = F.col("__sa"), F.col("__sb")
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return (
        cands.withColumn(
            "jaccard", F.round(inter / F.greatest(union, F.lit(1)).cast("double"), 9)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64_from(hashed_col) -> F.Column:
    """63-bit SimHash over a materialized token-hash array column: for each
    bit i, sum over tokens of ±1 by token-hash bit i; fingerprint bit =
    sign. Tokens weighted by frequency (duplicates kept)."""
    hashed = F.col(hashed_col) if isinstance(hashed_col, str) else hashed_col

    def bit_vote(bit: int):
        mask = F.lit(1 << bit).cast("long")
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(mask) != 0, 1
        ).otherwise(-1)

    bit_votes = [F.aggregate(hashed, F.lit(0), bit_vote(i)) for i in range(63)]
    out = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        out = out + F.when(v > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash64(text_col) -> F.Column:
    """SimHash straight from text (convenience; bulk callers materialize the
    token-hash array first — see simhash_dup_pairs)."""
    return simhash64_from(F.transform(tokens(text_col), lambda t: F.xxhash64(t)))


def hamming64(a, b) -> F.Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: fingerprints bucketed by band (a pair within
    Hamming distance d < n_bands must agree on ≥1 of n_bands bit-slices —
    the classic pigeonhole trick), then verified by exact Hamming distance.
    """
    bits_per_band = 63 // n_bands + 1
    fp = df.select(
        F.col(id_col).alias("id"),
        F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t)).alias("__h"),
    ).select("id", simhash64_from("__h").alias("fp"))
    bands = fp.select(
        "id",
        "fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("fp"), b * bits_per_band).bitwiseAND(
                        F.lit((1 << bits_per_band) - 1)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    return (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.fp"), F.col("b.fp")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    approximate: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity."""
    from biodata_pipeline_spark.operators.similarity import (
        lsh_similarity_join,
        similarity_join,
    )

    if approximate:
        return lsh_similarity_join(df, threshold, id_col=id_col, emb_col=emb_col)
    return similarity_join(df, threshold, id_col=id_col, emb_col=emb_col)
