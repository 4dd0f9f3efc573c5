"""Template byte-fidelity and text-analysis functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodata_pipeline_spark.functions import textfn


def one(spark, col):
    return (
        spark.createDataFrame([("x",)], ["t"]).select(col.alias("v")).collect()[0].v
    )


def test_alpaca_template_byte_fidelity(spark):
    """FIXTURES.md B3: exact spacing incl. '### Response :' must match
    train_adapters/RAG-eval-create_model.py:55-67."""
    df = spark.createDataFrame([("hello biology",)], ["text"])
    got = df.select(textfn.alpaca_format("text").alias("a")).collect()[0].a
    assert got == (
        "### Instruction: \n"
        "Learn this biology information. \n"
        "### Input: \n"
        "hello biology"
        "### Response :\n"
        "hello biology"
    )


def test_suffix_marker_gate_window(spark):
    df = spark.createDataFrame(
        [("ends with ###",), ("### only at start",), ("marker ### then ten+ chars",)],
        ["text"],
    )
    got = [
        r.v
        for r in df.select(textfn.has_suffix_marker("text").alias("v")).collect()
    ]
    assert got == [True, False, False]


def test_strip_suffix_marker(spark):
    df = spark.createDataFrame([("body ###",), ("body ###  ",), ("body",)], ["text"])
    got = [r.v for r in df.select(textfn.strip_suffix_marker("text").alias("v")).collect()]
    assert got == ["body ", "body ", "body"]


def test_boundary_pattern_traps(spark):
    df = spark.createDataFrame(
        [("the atpA gene",), ("the atpAB operon",), ("atpA",), ("xatpA",)], ["text"]
    )
    got = [
        r.v
        for r in df.select(textfn.boundary_match("text", "atpA").alias("v")).collect()
    ]
    assert got == [True, False, True, False]


def test_boundary_pattern_escapes_regex_metachars(spark):
    df = spark.createDataFrame([("cost is $5.00 here",), ("cost is $5x00 here",)], ["text"])
    got = [
        r.v
        for r in df.select(textfn.boundary_match("text", "$5.00").alias("v")).collect()
    ]
    assert got == [True, False]


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([("  a  b   c ",), ("",), ("   ",)], ["text"])
    got = [r.v for r in df.select(textfn.token_count("text").alias("v")).collect()]
    assert got == [3, 0, 0]


def test_lang_guess_markers(spark):
    rows = [
        ("the cat and a dog of note", "en"),
        ("el gato la casa los que", "es"),
        ("der hund und die das katze", "de"),
        ("le chat les et la maison", "fr"),
        ("这是中文文本", "zh"),
        ("no markers here xyzzy", "de"),  # all-zero tie → alphabetical first
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    got = [r.v for r in df.select(textfn.lang_guess("text").alias("v")).collect()]
    assert got == [lang for _, lang in rows]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("  hello world ",), ("hello worlds",)], ["text"]
    )
    fps = [r.v for r in df.select(textfn.fingerprint("text").alias("v")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]
    assert len(fps[0]) == 16


def test_analysis_functions_survive_degenerate_text(spark):
    """Empty / whitespace / punctuation-only / CJK text must not throw
    (ANSI mode: division and element_at are the usual traps)."""
    from biodata_pipeline_spark.functions import textfn

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "!!! ... ???"), (4, "深度学习模型训练"), (5, "a")],
        ["id", "text"],
    )
    out = df.select(
        "id",
        textfn.token_count("text").alias("ws"),
        textfn.bpe_token_count("text").alias("bpe"),
        textfn.quality_score("text").alias("q"),
        textfn.lang_guess("text").alias("lang"),
        textfn.fingerprint("text").alias("fp"),
    ).collect()
    by_id = {r.id: r for r in out}
    assert by_id[1].ws == 0 and by_id[2].ws == 0
    assert by_id[3].bpe >= 3  # punctuation runs are tokens
    assert by_id[4].lang == "zh"
    assert all(0.0 <= r.q <= 1.0 for r in out)
    assert len({r.fp for r in out}) == 4  # empty and whitespace normalize equal


def test_oracle_tokenizer_parity_on_empty_docs(spark):
    """The DuckDB oracle's _TOKS guard must agree with Spark's tokens()
    on empty / whitespace-only text (unguarded string_split_regex returns
    [''] — a spurious token the testdata can never catch because it ships
    no empty documents)."""
    import duckdb

    from biodata_pipeline_spark.functions import textfn
    from biodata_pipeline_spark.registry.textops import _TOKS

    texts = ["", "   ", "a b", " one  two "]
    spark_counts = [
        r[0]
        for r in spark.createDataFrame([(t,) for t in texts], ["text"])
        .select(F.size(textfn.tokens("text")))
        .collect()
    ]
    con = duckdb.connect()
    values = ", ".join(f"('{t}')" for t in texts)
    duck_counts = [
        r[0]
        for r in con.sql(
            f"SELECT len({_TOKS}) FROM (VALUES {values}) AS v(text)"
        ).fetchall()
    ]
    assert spark_counts == duck_counts == [0, 0, 2, 2]


def test_contamination_counts_shared_distinct_shingles(spark):
    """A training doc sharing a 3-token window with the benchmark slice is
    reported with the exact distinct-shingle overlap; clean docs are not."""
    from biodata_pipeline_spark.operators.dedup import _exploded_shingles

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),          # doc_id % 97 == 0 → benchmark
            (1, "alpha beta gamma epsilon"),        # shares 'alpha beta gamma'
            (2, "zeta eta theta iota"),             # clean
            (3, "alpha beta gamma delta trailing"), # shares 2 shingles
        ],
        ["doc_id", "text"],
    )
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench_sh = _exploded_shingles(bench, "doc_id", "text", 3).select("sh").distinct()
    out = {
        r.doc_id: r.n
        for r in _exploded_shingles(corpus, "doc_id", "text", 3)
        .join(F.broadcast(bench_sh), "sh")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert out == {1: 1, 3: 2}


def test_oov_rate_against_known_vocab(spark):
    """OOV accounting: tokens outside the top-k vocabulary counted per doc."""
    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "a b rare"), (2, "unseen words only")],
        ["doc_id", "text"],
    )
    words = docs.select("doc_id", F.explode(textfn.tokens("text")).alias("word"))
    vocab = (
        words.groupBy("word").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word")).limit(2).select("word")
    )  # vocab = {a, b}
    per_doc = (
        words.join(F.broadcast(vocab.withColumn("__v", F.lit(1))), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("__v").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    out = {r.doc_id: (r.n_tokens, r.n_oov) for r in per_doc.collect()}
    assert out == {0: (4, 0), 1: (3, 1), 2: (3, 3)}


def test_winnow_guarantee_shared_substring_shares_fingerprint(spark):
    """Winnowing's core guarantee: any shared substring of length >=
    k + w - 1 produces at least one shared fingerprint; and a short doc
    (< k + w - 1 chars) yields the empty set."""
    from pyspark.sql import functions as F

    from biodata_pipeline_spark.functions.textfn import winnow_fingerprints

    shared = "the quick brown fox jumps"  # 25 chars >= 8 + 4 - 1
    df = spark.createDataFrame(
        [
            (1, f"AAAA {shared} BBBB ending one"),
            (2, f"ZZZZZZZ different prefix {shared}"),
            (3, "completely unrelated content with no overlap at all"),
            (4, "tiny"),
        ],
        ["doc_id", "text"],
    )
    out = df.select(
        "doc_id", winnow_fingerprints("text").alias("fps")
    ).collect()
    fps = {r.doc_id: set(r.fps) for r in out}
    assert fps[1] & fps[2], "shared 25-char substring must share a fingerprint"
    assert not (fps[1] & fps[3] & fps[2])
    assert fps[4] == set()
    # deterministic across runs
    again = {
        r.doc_id: set(r.fps)
        for r in df.select(
            "doc_id", winnow_fingerprints("text").alias("fps")
        ).collect()
    }
    assert fps == again


def test_winnow_poly_kernel_bit_parity(spark):
    """The Arrow winnowing kernel must produce the exact (doc_id, fp)
    multiset of the winnow_fingerprints_poly expression — same Horner
    integers, same window minima, same distinct/sort — across ASCII,
    Latin-1, CJK, astral codepoints, the k+w-1 length boundary, NULL
    text, and gram-collapsing repeats."""
    from biodata_pipeline_spark.functions.textfn import (
        winnow_fingerprints_poly,
    )
    from biodata_pipeline_spark.operators.fingerprint import (
        winnow_fingerprint_rows,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "tiny"),
            (3, None),
            (4, "exactly11ch"),  # len == k + w - 1: smallest non-empty
            (5, "unicode: é€中𝕏 mixed with ascii text here"),
            (6, "aaaaaaaaaaaaaaaaaaaaaaaa"),  # identical grams collapse
            (7, "ten chars!"),  # one short of the boundary -> no rows
        ],
        ["doc_id", "text"],
    )
    exp = df.select(
        "doc_id", F.explode(winnow_fingerprints_poly("text", 8, 4)).alias("fp")
    )
    ker = winnow_fingerprint_rows(df, "text", "doc_id", 8, 4)
    assert sorted(map(tuple, exp.collect())) == sorted(
        map(tuple, ker.collect())
    )
    # doc 7 (10 chars) and NULL produce nothing on either path
    ids = {r.doc_id for r in ker.collect()}
    assert 3 not in ids and 7 not in ids and 2 not in ids

    # string doc ids are a valid caller choice (r9 ADVICE: the empty-
    # batch fallback must not hardcode int64 ids) — parity holds with
    # a string id column, including across empty partitions
    sdf = df.withColumn(
        "doc_id", F.concat(F.lit("d"), F.col("doc_id").cast("string"))
    ).repartition(8)
    exp_s = sorted(
        map(
            tuple,
            sdf.select(
                "doc_id",
                F.explode(winnow_fingerprints_poly("text", 8, 4)).alias("fp"),
            ).collect(),
        )
    )
    ker_s = sorted(
        map(tuple, winnow_fingerprint_rows(sdf, "text", "doc_id", 8, 4).collect())
    )
    assert exp_s == ker_s and ker_s[0][0].startswith("d")


def test_winnow_poly_hash_matches_python_reference(spark):
    """Pin the polynomial gram hash itself (not just cross-path parity):
    h = fold(h*31 + codepoint) mod 2^31-1 over each 8-gram, window-4
    minima, distinct+sorted — computed independently in plain Python."""
    from biodata_pipeline_spark.functions.textfn import (
        POLY_BASE,
        POLY_MOD,
        winnow_fingerprints_poly,
    )
    from biodata_pipeline_spark.operators.fingerprint import (
        winnow_fingerprint_rows,
    )

    text, k, w = "winnowing parity: é€中𝕏 fingerprints!", 8, 4
    grams = []
    for i in range(len(text) - k + 1):
        h = 0
        for ch in text[i : i + k]:
            h = (h * POLY_BASE + ord(ch)) % POLY_MOD
        grams.append(h)
    want = sorted(
        {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got_expr = df.select(
        winnow_fingerprints_poly("text", k, w).alias("fps")
    ).collect()[0].fps
    got_kernel = sorted(
        r.fp for r in winnow_fingerprint_rows(df, "text", "doc_id", k, w).collect()
    )
    assert got_expr == want
    assert got_kernel == want
