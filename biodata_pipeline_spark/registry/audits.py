"""Recall audits for the approximate operator families — declared,
oracle-checked queries.

Round-4 state: the engine's approximate operators (MinHash-LSH, SimHash,
near-dup connected components, bucketed ANN) were rows-only driver
checks; their recall against exact ground truth lived only in pytest.
These queries promote recall to the hash-checked tier by re-running the
same algorithms with cross-engine-reproducible hashing (md5-derived, see
``operators/audit.py``) and joining candidates against exact ground
truth that is itself plain ANSI SQL.

Reference anchor: the reference evaluates its one approximate component
(Chroma retrieval) by exact string containment of the expected answer
(rag_evaluation/RAG-eval-test_model.py:233-248) — the same
"exact signal audits the approximation" pattern, formalized per family:

 - q_lsh_recall_audit      MinHash-LSH candidates vs exact Jaccard pairs
                           (per-threshold found/missed/recall counts)
 - q_simhash_recall_audit  pigeonhole-regime band join vs exact Hamming
                           scan (per-pair found flag; recall must be 1)
 - q_dedup_cc_audit        star-contraction connected components vs a
                           recursive-CTE reachability oracle
 - q_ann_bucket_recall     deterministic sign-bit bucket quantizer vs
                           exact top-1 cosine neighbor

Plus the curation decisions built on the audited clusters:

 - q_dedup_survivors_best  one survivor per cluster (longest member)
 - q_dup_source_matrix     near-dup pair counts by source pair
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biodata_pipeline_spark.operators.audit import (
    AUDIT_MAX_DOC,
    AUDIT_MAX_VEC,
    PAIR_AUDIT_MAX_VEC,
    ann_bucket_recall_audit,
    leakage_recall_audit,
    lsh_pair_recall_audit,
    minhash_precision_audit,
    minhash_recall_audit,
    simhash_recall_audit,
)
from biodata_pipeline_spark.operators.clusters import connected_components
from biodata_pipeline_spark.operators.dedup import ngram_jaccard_dup_pairs
from biodata_pipeline_spark.sources.tables import load_table

CC_THRESHOLD = 0.5
ANN_QUERIES = 100
ANN_SIGN_DIMS = 8


def _audit_docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < AUDIT_MAX_DOC
    )


def q_lsh_recall_audit(spark, sf_dir):
    """Per-threshold recall of md5-family MinHash-LSH (32 lanes, 8 bands
    x 4 rows — the production geometry) against exact shingle-Jaccard
    ground truth."""
    return minhash_recall_audit(_audit_docs(spark, sf_dir))


def q_lsh_precision_audit(spark, sf_dir):
    """Per-threshold precision of md5-family MinHash-LSH candidates —
    the false-positive twin of q_lsh_recall_audit (VERDICT r5 #5): of
    the pairs the banding emits, how many survive exact-Jaccard
    verification at each threshold. The number that prices the verify
    stage's wasted compute at 100 TB."""
    return minhash_precision_audit(_audit_docs(spark, sf_dir))


def q_simhash_recall_audit(spark, sf_dir):
    """SimHash pigeonhole audit: every exact pair at Hamming <= 3 must be
    found by the 4-band join (recall exactly 1 — an equality the driver
    hash-checks pair by pair)."""
    return simhash_recall_audit(_audit_docs(spark, sf_dir))


def q_dedup_cc_audit(spark, sf_dir):
    """Connected components over exact Jaccard >= 0.5 edges. The Spark
    side is the iterative star-contraction operator (Kiveris et al.) the
    production dedup uses; the oracle re-derives components via recursive
    reachability + min label — so the iterative algorithm itself gets a
    value-hash-checked row, not a rows-only one."""
    edges = ngram_jaccard_dup_pairs(_audit_docs(spark, sf_dir), CC_THRESHOLD)
    comp = connected_components(edges)
    return comp.select(F.col("id").alias("doc_id"), "component")


def q_dedup_survivors_best(spark, sf_dir):
    """The end-user dedup decision, hash-checked: one survivor per
    near-dup cluster, keeping the LONGEST member (ties -> smallest id)
    instead of the reference's implicit keep-first
    (generate_narratives_from_data.py:55-60 skip-if-exists). Clusters
    are star-contraction CC over exact Jaccard >= 0.5 edges; singletons
    survive as their own component. Output: (component, survivor_id,
    survivor_tokens, n_members)."""
    from pyspark.sql import Window

    from biodata_pipeline_spark.functions.textfn import token_count

    docs = _audit_docs(spark, sf_dir)
    edges = ngram_jaccard_dup_pairs(docs, CC_THRESHOLD)
    comp = connected_components(edges).withColumnRenamed("id", "doc_id")
    labeled = (
        docs.select("doc_id", token_count("text").cast("long").alias("n_tokens"))
        .join(comp, "doc_id", "left")
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    sizes = labeled.groupBy("component").agg(F.count("*").alias("n_members"))
    survivors = (
        labeled.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("survivor_id"),
            F.col("n_tokens").alias("survivor_tokens"),
        )
    )
    return survivors.join(sizes, "component")


def q_dup_source_matrix(spark, sf_dir):
    """Cross-source duplication matrix: near-dup pair counts by
    (source, source) — which ingest sources duplicate each other, the
    provenance signal corpus curation uses to drop or down-weight a
    crawl. Pairs from the exact-Jaccard machinery (bounded audit slice);
    the source pair is orientation-normalized (least/greatest) so the
    matrix is upper-triangular."""
    docs = _audit_docs(spark, sf_dir)
    edges = ngram_jaccard_dup_pairs(docs, CC_THRESHOLD)
    src = docs.select("doc_id", "source")
    labeled = edges.join(
        src.withColumnsRenamed({"doc_id": "id_a", "source": "src_a"}), "id_a"
    ).join(src.withColumnsRenamed({"doc_id": "id_b", "source": "src_b"}), "id_b")
    return (
        labeled.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
    )


def q_ann_bucket_recall(spark, sf_dir):
    """Single-probe bucket recall of a deterministic sign-bit quantizer
    against the exact top-1 cosine neighbor, per query vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_bucket_recall_audit(
        emb, n_queries=ANN_QUERIES, sign_dims=ANN_SIGN_DIMS
    )


def q_leakage_recall_audit(spark, sf_dir):
    """Cross-split recall of md5-family MinHash banding vs ALL exact
    cross-split Jaccard pairs under the production md5 split predicate —
    the hash-checked twin of q_split_leakage_lsh's candidate stage
    (VERDICT r6 #4). Per-threshold found/missed/recall counts."""
    return leakage_recall_audit(_audit_docs(spark, sf_dir))


def q_lsh_pair_recall_audit(spark, sf_dir):
    """Pair recall of sign-bit banded LSH (the deterministic twin of
    q_lsh_similarity_join's 4-band hyperplane geometry) vs exact cosine
    pairs — per-threshold found/missed/recall counts."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_pair_recall_audit(emb)


SPARK = {
    "q_lsh_recall_audit": q_lsh_recall_audit,
    "q_lsh_precision_audit": q_lsh_precision_audit,
    "q_simhash_recall_audit": q_simhash_recall_audit,
    "q_dedup_cc_audit": q_dedup_cc_audit,
    "q_dedup_survivors_best": q_dedup_survivors_best,
    "q_dup_source_matrix": q_dup_source_matrix,
    "q_ann_bucket_recall": q_ann_bucket_recall,
    "q_lsh_pair_recall_audit": q_lsh_pair_recall_audit,
    "q_leakage_recall_audit": q_leakage_recall_audit,
}


# ---------------------------------------------------------------------------
# Oracles. Shared fragments: the tokenizer CASE matches textops._TOKS; the
# shingle/Jaccard CTEs are the (hash-green) q_ngram_jaccard_dedup machinery
# re-bounded to AUDIT_MAX_DOC; md5-int60 parsing is
# CAST('0x' || substring(md5(x), 1, 15) AS BIGINT) in DuckDB ==
# conv(substring(md5(x), 1, 15), 16, 10) :: long in Spark.
# ---------------------------------------------------------------------------

_TOKS = (
    r"CASE WHEN trim(text) = '' THEN [] "
    r"ELSE string_split_regex(trim(text), '\s+') END"
)

_SHINGLES = f"""
    toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id < {AUDIT_MAX_DOC}
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM toks, generate_series(1, 8192) AS g(i)
        WHERE len(t) >= 3 AND i <= len(t) - 2
    )
"""

_JACCARD = """
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jac AS (
        SELECT id_a, id_b,
               round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 9) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 9) >= {threshold}
    )
"""

_MD5_60 = "CAST('0x' || substring(md5({x}), 1, 15) AS BIGINT)"

_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)

_ANN_BUCKET = " + ".join(
    f"CASE WHEN embedding[{j + 1}] > 0 THEN {1 << j} ELSE 0 END"
    for j in range(ANN_SIGN_DIMS)
)


def _sign_band_key_sql(b: int, rows: int = 4) -> str:
    return "CAST(" + " + ".join(
        f"CASE WHEN embedding[{b * rows + j + 1}] > 0 THEN {1 << j} ELSE 0 END"
        for j in range(rows)
    ) + " AS BIGINT)"

# md5-affine MinHash banding (32 lanes / 8 bands x 4 rows — the
# production geometry) as a reusable CTE chain ending in cand(id_a, id_b);
# shared by the recall audit, the precision audit, and the promoted
# q_dedup_clusters oracle. Lane hashes mirror operators/audit.py's
# Carter-Wegman family over the WIDE base hash (r10):
# (a[lane]*h1 + b[lane]*h2 + c[lane]) mod 2^31-1 where h1/h2 are the
# two 60-bit halves of ONE md5 per shingle, each reduced mod p and the
# two products reduced mod p BEFORE summing (keeps every intermediate
# in int64). The a/b/c literals below are generated from the same
# minhash_affine_params derivation.
from biodata_pipeline_spark.operators.audit import (  # noqa: E402
    MINHASH_P as _MH_P,
    minhash_affine_params as _mh_params,
)

_MH_A, _MH_B, _MH_C = _mh_params(32)
_MD5_60B = "CAST('0x' || substring(md5({x}), 16, 15) AS BIGINT)"
_MINHASH_CAND = f"""
    hs AS (
        SELECT doc_id,
               {_MD5_60.format(x="s")} % {_MH_P} AS h1,
               {_MD5_60B.format(x="s")} % {_MH_P} AS h2
        FROM sh
    ),
    lanes AS (
        SELECT doc_id, lane,
               min(((CAST(list_value({", ".join(map(str, _MH_A))})[lane + 1]
                          AS BIGINT) * h1) % {_MH_P}
                    + (CAST(list_value({", ".join(map(str, _MH_B))})[lane + 1]
                            AS BIGINT) * h2) % {_MH_P}
                    + list_value({", ".join(map(str, _MH_C))})[lane + 1])
                   % {_MH_P}) AS m
        FROM hs, generate_series(0, 31) AS l(lane)
        GROUP BY 1, 2
    ),
    bands AS (
        SELECT doc_id, lane // 4 AS band,
               string_agg(
                   lpad(CAST(lane AS VARCHAR), 2, '0') || ':' || CAST(m AS VARCHAR),
                   ',' ORDER BY lane) AS key
        FROM lanes GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
"""

ORACLE = {
    "q_leakage_recall_audit": f"""
        WITH toks AS (
            SELECT doc_id,
                   md5('split' || CAST(doc_id AS VARCHAR))
                       < '19999999000000000000000000000000' AS is_test,
                   {_TOKS} AS t
            FROM documents WHERE doc_id < {AUDIT_MAX_DOC}
        ),
        sh AS (
            SELECT DISTINCT doc_id, is_test, array_to_string(t[i:i+2], ' ') AS s
            FROM toks, generate_series(1, 8192) AS g(i)
            WHERE len(t) >= 3 AND i <= len(t) - 2
        ),
        {_MINHASH_CAND},
        flags AS (SELECT DISTINCT doc_id, is_test FROM sh),
        crossc AS (
            SELECT DISTINCT
                   CASE WHEN NOT fa.is_test THEN c.id_a ELSE c.id_b END
                       AS train_id,
                   CASE WHEN fa.is_test THEN c.id_a ELSE c.id_b END
                       AS test_id
            FROM cand c
            JOIN flags fa ON fa.doc_id = c.id_a
            JOIN flags fb ON fb.doc_id = c.id_b
            WHERE fa.is_test != fb.is_test
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS train_id, b.doc_id AS test_id, count(*) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND NOT a.is_test AND b.is_test
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT train_id, test_id,
                   round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 9) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = train_id
            JOIN sizes sb ON sb.doc_id = test_id
            WHERE round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 9) >= 0.2
        ),
        th AS (SELECT CAST(unnest([0.2, 0.5, 0.7, 0.9]) AS DOUBLE)
                   AS threshold),
        hits AS (
            SELECT s.jaccard,
                   CASE WHEN c.train_id IS NOT NULL THEN 1 ELSE 0 END AS found
            FROM scored s LEFT JOIN crossc c
              ON c.train_id = s.train_id AND c.test_id = s.test_id
        ),
        agg AS (
            SELECT t.threshold,
                   count(h.jaccard) AS n_true,
                   CAST(coalesce(sum(h.found), 0) AS BIGINT) AS n_found
            FROM th t LEFT JOIN hits h ON h.jaccard >= t.threshold
            GROUP BY 1
        )
        SELECT threshold,
               n_true AS n_true_pairs,
               n_found,
               n_true - n_found AS n_missed,
               CASE WHEN n_true = 0 THEN CAST(1.0 AS DOUBLE)
                    ELSE round(n_found / CAST(n_true AS DOUBLE), 4) END
                   AS recall
        FROM agg
    """,
    "q_lsh_recall_audit": f"""
        WITH {_SHINGLES},
        {_JACCARD.format(threshold=0.5)},
        {_MINHASH_CAND},
        th AS (SELECT CAST(unnest([0.5, 0.7, 0.8, 0.9]) AS DOUBLE) AS threshold),
        hits AS (
            SELECT j.jaccard,
                   CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS found
            FROM jac j LEFT JOIN cand c
              ON c.id_a = j.id_a AND c.id_b = j.id_b
        ),
        agg AS (
            SELECT t.threshold,
                   count(h.jaccard) AS n_true,
                   CAST(coalesce(sum(h.found), 0) AS BIGINT) AS n_found
            FROM th t LEFT JOIN hits h ON h.jaccard >= t.threshold
            GROUP BY 1
        )
        SELECT threshold,
               n_true AS n_true_pairs,
               n_found,
               n_true - n_found AS n_missed,
               CASE WHEN n_true = 0 THEN CAST(1.0 AS DOUBLE)
                    ELSE round(n_found / CAST(n_true AS DOUBLE), 4) END AS recall
        FROM agg
    """,
    "q_lsh_precision_audit": f"""
        WITH {_SHINGLES},
        {_JACCARD.format(threshold=0.0)},
        {_MINHASH_CAND},
        scored AS (
            SELECT round(coalesce(i.i, 0)
                         / CAST(sa.sz + sb.sz - coalesce(i.i, 0) AS DOUBLE),
                         9) AS jaccard
            FROM cand c
            JOIN sizes sa ON sa.doc_id = c.id_a
            JOIN sizes sb ON sb.doc_id = c.id_b
            LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        ),
        th AS (SELECT CAST(unnest([0.5, 0.7, 0.8, 0.9]) AS DOUBLE) AS threshold),
        agg AS (
            SELECT t.threshold,
                   count(s.jaccard) AS n_cand,
                   CAST(coalesce(sum(CASE WHEN s.jaccard >= t.threshold
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_ver
            FROM th t LEFT JOIN scored s ON TRUE
            GROUP BY 1
        )
        SELECT threshold,
               n_cand AS n_candidates,
               n_ver AS n_verified,
               n_cand - n_ver AS n_false_pos,
               CASE WHEN n_cand = 0 THEN CAST(1.0 AS DOUBLE)
                    ELSE round(n_ver / CAST(n_cand AS DOUBLE), 4) END AS prec
        FROM agg
    """,
    "q_simhash_recall_audit": f"""
        WITH toksm AS (
            SELECT doc_id, unnest({_TOKS}) AS tok
            FROM documents WHERE doc_id < {AUDIT_MAX_DOC}
        ),
        tf AS (SELECT doc_id, tok, count(*) AS cnt FROM toksm GROUP BY 1, 2),
        tfh AS (
            SELECT doc_id, cnt, {_MD5_60.format(x="tok")} AS h FROM tf
        ),
        votes AS (
            SELECT doc_id, bit,
                   sum(cnt * (((h >> CAST(bit AS INTEGER)) & 1) * 2 - 1)) AS s
            FROM tfh, generate_series(0, 59) AS b(bit)
            GROUP BY 1, 2
        ),
        fp AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0
                                 THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
                                 ELSE 0 END) AS BIGINT) AS fp
            FROM votes GROUP BY 1
        ),
        truth AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.fp, b.fp)) AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.fp, b.fp)) <= 3
        ),
        banded AS (
            SELECT doc_id, band, (fp >> CAST(band * 15 AS INTEGER)) & 32767 AS key
            FROM fp, generate_series(0, 3) AS g(band)
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        )
        SELECT t.id_a, t.id_b,
               CAST(t.hamming AS INTEGER) AS hamming,
               CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS found
        FROM truth t LEFT JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
    """,
    "q_dedup_cc_audit": f"""
        WITH RECURSIVE {_SHINGLES},
        {_JACCARD.format(threshold=CC_THRESHOLD)},
        e AS (
            SELECT id_a AS a, id_b AS b FROM jac
            UNION
            SELECT id_b, id_a FROM jac
        ),
        nodes AS (SELECT DISTINCT a FROM e),
        reach(a, b) AS (
            SELECT a, a FROM nodes
            UNION
            SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
        )
        SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a
    """,
    "q_dup_source_matrix": f"""
        WITH {_SHINGLES},
        {_JACCARD.format(threshold=CC_THRESHOLD)}
        SELECT least(sa.source, sb.source) AS source_a,
               greatest(sa.source, sb.source) AS source_b,
               count(*) AS n_pairs
        FROM jac j
        JOIN documents sa ON sa.doc_id = j.id_a
        JOIN documents sb ON sb.doc_id = j.id_b
        GROUP BY 1, 2
    """,
    "q_lsh_pair_recall_audit": f"""
        WITH base AS (
            SELECT vec_id AS id, embedding,
                   sqrt({_DOT.format(a="embedding", b="embedding")}) AS nrm,
                   {_sign_band_key_sql(0)} AS bk0,
                   {_sign_band_key_sql(1)} AS bk1,
                   {_sign_band_key_sql(2)} AS bk2,
                   {_sign_band_key_sql(3)} AS bk3
            FROM embeddings WHERE vec_id < {PAIR_AUDIT_MAX_VEC}
        ),
        banded AS (
            SELECT id, 0 AS band, bk0 AS key FROM base
            UNION ALL SELECT id, 1, bk1 FROM base
            UNION ALL SELECT id, 2, bk2 FROM base
            UNION ALL SELECT id, 3, bk3 FROM base
        ),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.key = b.key AND a.id < b.id
        ),
        exact AS (
            SELECT a.id AS id_a, b.id AS id_b,
                   round({_DOT.format(a="a.embedding", b="b.embedding")}
                         / (a.nrm * b.nrm), 9) AS sim
            FROM base a JOIN base b ON a.id < b.id
            WHERE round({_DOT.format(a="a.embedding", b="b.embedding")}
                        / (a.nrm * b.nrm), 9) >= 0.25
        ),
        th AS (SELECT CAST(unnest([0.25, 0.5, 0.75]) AS DOUBLE) AS threshold),
        hits AS (
            SELECT e.sim,
                   CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS found
            FROM exact e LEFT JOIN cand c
              ON c.id_a = e.id_a AND c.id_b = e.id_b
        ),
        agg AS (
            SELECT t.threshold,
                   count(h.sim) AS n_true,
                   CAST(coalesce(sum(h.found), 0) AS BIGINT) AS n_found
            FROM th t LEFT JOIN hits h ON h.sim >= t.threshold
            GROUP BY 1
        )
        SELECT threshold,
               n_true AS n_true_pairs,
               n_found,
               n_true - n_found AS n_missed,
               CASE WHEN n_true = 0 THEN CAST(1.0 AS DOUBLE)
                    ELSE round(n_found / CAST(n_true AS DOUBLE), 4) END AS recall
        FROM agg
    """,
    "q_dedup_survivors_best": f"""
        WITH RECURSIVE {_SHINGLES},
        {_JACCARD.format(threshold=CC_THRESHOLD)},
        e AS (
            SELECT id_a AS a, id_b AS b FROM jac
            UNION
            SELECT id_b, id_a FROM jac
        ),
        nodes AS (SELECT DISTINCT a FROM e),
        reach(a, b) AS (
            SELECT a, a FROM nodes
            UNION
            SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
        ),
        comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a),
        labeled AS (
            SELECT d.doc_id,
                   coalesce(c.component, d.doc_id) AS component,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents d LEFT JOIN comp c USING (doc_id)
            WHERE d.doc_id < {AUDIT_MAX_DOC}
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY component
                       ORDER BY n_tokens DESC, doc_id ASC) AS rn
            FROM labeled
        ),
        csizes AS (SELECT component, count(*) AS n_members FROM labeled GROUP BY 1)
        SELECT r.component, r.doc_id AS survivor_id,
               r.n_tokens AS survivor_tokens, s.n_members
        FROM ranked r JOIN csizes s USING (component)
        WHERE r.rn = 1
    """,
    "q_ann_bucket_recall": f"""
        WITH base AS (
            SELECT vec_id AS id, embedding,
                   CAST({_ANN_BUCKET} AS BIGINT) AS bucket,
                   sqrt({_DOT.format(a="embedding", b="embedding")}) AS nrm
            FROM embeddings WHERE vec_id < {AUDIT_MAX_VEC}
        ),
        sims AS (
            SELECT q.id AS query_id, c.id,
                   c.bucket, q.bucket AS qbucket,
                   round({_DOT.format(a="q.embedding", b="c.embedding")}
                         / (q.nrm * c.nrm), 9) AS sim
            FROM base q JOIN base c ON c.id <> q.id
            WHERE q.id < {ANN_QUERIES}
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, id ASC) AS rn
            FROM sims
        )
        SELECT query_id, id AS top1_id, sim,
               CASE WHEN bucket = qbucket THEN 1 ELSE 0 END AS same_bucket
        FROM ranked WHERE rn = 1
    """,
}
