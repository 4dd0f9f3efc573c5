"""Sweep grids + work-remaining semantics, and the multimodal binary
plumbing (decode stub, frame sampling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biodata_pipeline_spark.operators.grid import (
    grid_output_key,
    runnable_work,
    sweep_grid,
    work_remaining,
)
from biodata_pipeline_spark.operators.multimodal import (
    decode_image_meta,
    documents_as_media,
    frame_sample,
)
from biodata_pipeline_spark.sources.tables import load_table


def test_sweep_grid_cardinality_and_key(spark):
    grid = sweep_grid(
        spark,
        {"adapter_type": ["a", "b"], "epoch": [0.5, 1.0, 1.5], "task": ["t1"]},
    ).withColumn("key", grid_output_key(["adapter_type", "epoch", "task"]))
    rows = grid.collect()
    assert len(rows) == 6
    keys = {r.key for r in rows}
    assert "a_0.5_t1" in keys and "b_1.5_t1" in keys


def test_work_remaining_and_runnable(spark):
    grid = sweep_grid(spark, {"t": ["x", "y"], "e": [1, 2]})
    done = spark.createDataFrame([("x", 1)], ["t", "e"])
    avail = spark.createDataFrame([("x",), ("y",)], ["t"])
    remaining = work_remaining(grid, done, ["t", "e"])
    assert remaining.count() == 3
    # nothing runnable once availability is empty
    none_avail = spark.createDataFrame([], "t string")
    assert runnable_work(grid, none_avail, ["t"]).count() == 0
    assert runnable_work(grid, avail, ["t"]).count() == 4


def test_decode_stub_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = documents_as_media(docs)
    decoded = decode_image_meta(media).cache()
    rows = decoded.collect()
    assert len(rows) == 50
    assert all(r.n_bytes > 0 and len(r.checksum) == 16 for r in rows)
    # deterministic: second run identical
    again = {r.media_id: r.checksum for r in decode_image_meta(media).collect()}
    assert again == {r.media_id: r.checksum for r in rows}


def test_decode_real_path_raises_clearly_without_pil(spark, sf_dir):
    """fake=False resolves the environment default codec: with no Pillow
    installed it must fail at plan-build time with a clear ImportError,
    not mid-job on an executor. (With Pillow present it would decode for
    real — same Spark plumbing, interface-tested below.)"""
    from biodata_pipeline_spark.operators.multimodal import PilImageCodec

    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = documents_as_media(docs)
    try:
        import PIL  # noqa: F401

        pil_present = True
    except ImportError:
        pil_present = False
    if pil_present:
        decode_image_meta(media, fake=False)  # plan builds with real codec
    else:
        with pytest.raises(ImportError, match="Pillow"):
            PilImageCodec()
        # the default falls back to the fake codec rather than failing
        assert decode_image_meta(media).count() == 1


def test_custom_codec_flows_through_spark_plumbing(spark, sf_dir):
    """The integration contract: ANY ImageCodec implementation drives the
    distributed decode/resize without Spark-side changes. The marker codec
    returns a recognizable geometry, proving per-row dispatch through the
    Arrow workers."""
    from biodata_pipeline_spark.operators.multimodal import (
        ImageCodec,
        resize_images,
    )

    class MarkerCodec(ImageCodec):
        def decode(self, payload):
            return 7, 11, 2

        def resize(self, payload, w, h):
            return b"M" * 3

    docs = load_table(spark, sf_dir, "documents").limit(5)
    media = documents_as_media(docs)
    decoded = decode_image_meta(media, codec=MarkerCodec()).collect()
    assert all(r.width == 7 and r.height == 11 and r.n_frames == 2 for r in decoded)
    resized = resize_images(media, codec=MarkerCodec()).collect()
    assert all(bytes(r.payload) == b"MMM" for r in resized)


def test_frame_sample_every_nth(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    decoded = decode_image_meta(documents_as_media(docs))
    frames = frame_sample(decoded, every_nth=8).collect()
    by_media = {}
    for f in frames:
        by_media.setdefault(f.media_id, []).append(f.frame_idx)
    meta = {r.media_id: r.n_frames for r in decoded.collect()}
    for mid, idxs in by_media.items():
        assert idxs == list(range(0, meta[mid], 8))


def test_grid_apply_runs_once_per_cell(spark):
    import pandas as pd

    from biodata_pipeline_spark.operators.grid import expand_grid_over, grid_apply

    data = spark.createDataFrame(
        [(i, f"line {i}") for i in range(30)], ["line_id", "text"]
    )
    grid = sweep_grid(spark, {"domain": ["ppi", "pathway"], "epoch": [0.5, 1.0]})
    cells = expand_grid_over(data, grid)

    def fake_train(pdf: pd.DataFrame) -> pd.DataFrame:
        # one "training run" per cell: emit a metrics row (deterministic)
        return pd.DataFrame(
            {
                "domain": [pdf["domain"].iloc[0]],
                "epoch": [pdf["epoch"].iloc[0]],
                "n_examples": [len(pdf)],
                "loss": [round(1.0 / (1.0 + pdf["epoch"].iloc[0]), 6)],
            }
        )

    metrics = grid_apply(
        cells,
        ["domain", "epoch"],
        fake_train,
        "domain string, epoch double, n_examples long, loss double",
    )
    rows = {(r.domain, r.epoch): r for r in metrics.collect()}
    assert len(rows) == 4  # one metrics row per grid cell
    assert all(r.n_examples == 30 for r in rows.values())
    assert rows[("ppi", 1.0)].loss == 0.5


def test_length_batched_orders_within_partitions(spark):
    from pyspark.sql import functions as F

    from biodata_pipeline_spark.operators.layout import length_batched

    df = spark.createDataFrame(
        [(i, "x" * ((i * 37) % 100 + 1)) for i in range(200)], ["id", "text"]
    )
    out = length_batched(df, num_partitions=4)
    assert out.count() == 200  # rows unchanged

    def check(it):
        for pdf in it:
            lengths = pdf["text"].str.len().tolist()
            assert lengths == sorted(lengths)
            yield pdf[["id"]]

    out.mapInPandas(check, "id long").count()


def test_resize_images_fixed_geometry(spark, sf_dir):
    from biodata_pipeline_spark.operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents").limit(10)
    out = resize_images(documents_as_media(docs), 224, 224).collect()
    assert len(out) == 10
    budget = 224 * 224 // 64
    assert all(r.width == 224 and len(r.payload) == budget for r in out)


def test_audio_features_deterministic(spark, sf_dir):
    from biodata_pipeline_spark.operators.multimodal import audio_features

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = documents_as_media(docs)
    a = {r.media_id: (r.rms, r.zero_crossings) for r in audio_features(media).collect()}
    b = {r.media_id: (r.rms, r.zero_crossings) for r in audio_features(media).collect()}
    assert a == b and len(a) == 10
    assert all(rms >= 0 for rms, _ in a.values())


def test_compact_parquet_consolidates_fragments(spark, tmp_path):
    """50 fragment files -> few files sized by the byte target; rows
    unchanged; sort_cols variant orders rows for row-group pruning."""
    from biodata_pipeline_spark.operators.layout import compact_parquet

    src, dst, dst2 = (
        str(tmp_path / "frag"),
        str(tmp_path / "compact"),
        str(tmp_path / "sorted"),
    )
    spark.range(5000).withColumn("v", F.col("id") * 2).repartition(
        50
    ).write.parquet(src)
    stats = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert stats["files_in"] >= 50
    assert stats["files_out"] == 1
    import glob

    assert len(glob.glob(f"{dst}/part-*.parquet")) == 1
    got = spark.read.parquet(dst)
    assert got.count() == 5000
    assert got.agg(F.sum("v")).first()[0] == 5000 * 4999

    stats2 = compact_parquet(
        spark, src, dst2, target_file_bytes=1 << 30, sort_cols=["id"]
    )
    assert stats2["files_out"] == 1
    first_rows = [
        r.id for r in spark.read.parquet(dst2).limit(10).collect()
    ]
    assert first_rows == sorted(first_rows)


def test_z_value_interleaves_bits(spark):
    from biodata_pipeline_spark.operators.layout import z_value

    rows = spark.createDataFrame(
        [(0b101, 0b011)], "a long, b long"
    ).select(z_value("a", "b", bits=3).alias("z"))
    # a bits -> positions 0,2,4 ; b bits -> 1,3,5:
    # a=101 -> 1<<0 | 0<<2 | 1<<4 = 17 ; b=011 -> 1<<1 | 1<<3 | 0<<5 = 10
    assert rows.first().z == 27


def test_z_order_layout_clusters_both_dims(spark):
    """Rows in the same partition must be close in BOTH dimensions more
    often than a single-axis sort achieves for the off-axis column."""
    from biodata_pipeline_spark.operators.layout import z_order_layout

    import itertools

    grid = spark.createDataFrame(
        [(x, y) for x, y in itertools.product(range(32), range(32))],
        "x long, y long",
    )
    parts = (
        z_order_layout(grid, "x", "y", num_partitions=16, bits=5)
        .rdd.glom()
        .collect()
    )
    parts = [p for p in parts if p]
    assert sum(len(p) for p in parts) == 1024
    # per-partition bounding boxes must cover far less than the full
    # [0,31]x[0,31] square in BOTH dims (single-axis sort gives span 31
    # on the unsorted dim)
    for p in parts:
        xs = [r.x for r in p]
        ys = [r.y for r in p]
        assert (max(xs) - min(xs)) <= 16
        assert (max(ys) - min(ys)) <= 16


def test_compact_parquet_zorder_path(spark, tmp_path):
    from biodata_pipeline_spark.operators.layout import compact_parquet

    import itertools
    import pytest

    src, dst = str(tmp_path / "zf"), str(tmp_path / "zc")
    spark.createDataFrame(
        [(x, y) for x, y in itertools.product(range(20), range(20))],
        "x long, y long",
    ).repartition(20).write.parquet(src)
    stats = compact_parquet(
        spark, src, dst, target_file_bytes=1 << 30,
        sort_cols=["x", "y"], zorder=True,
    )
    assert stats["files_out"] == 1
    got = spark.read.parquet(dst)
    assert got.count() == 400 and set(got.columns) == {"x", "y"}
    with pytest.raises(ValueError, match="exactly two"):
        compact_parquet(spark, src, str(tmp_path / "zz"), zorder=True)


def test_compact_parquet_reports_actual_files_and_grows(spark, tmp_path):
    """ADVICE r5: the no-sort path must repartition (not coalesce) when
    asked for MORE files than the scan yields, and files_out must be the
    count actually written."""
    from biodata_pipeline_spark.operators.layout import compact_parquet

    import glob

    src, dst = str(tmp_path / "one"), str(tmp_path / "grown")
    spark.range(20000).coalesce(1).write.parquet(src)
    one_file_bytes = sum(
        __import__("os").path.getsize(p)
        for p in glob.glob(f"{src}/part-*.parquet")
    )
    # target a quarter of the input size -> n_out >= 4 > 1 read partition
    stats = compact_parquet(
        spark, src, dst, target_file_bytes=max(1, one_file_bytes // 4)
    )
    written = len(glob.glob(f"{dst}/part-*.parquet"))
    assert stats["files_out"] == written
    assert written >= 2  # coalesce alone could never grow past 1
    assert spark.read.parquet(dst).count() == 20000


def test_zorder_layout_content_invariant(spark, tmp_path):
    """VERDICT r5 #4: the z-ordered rewrite must carry EXACTLY the source
    rows — same multiset, any placement — including under a two-column
    box predicate (the read path the layout exists to accelerate).
    Measured pruning numbers live in SCALING.md (tools/probe_zorder.py)."""
    from biodata_pipeline_spark.operators.layout import compact_parquet

    import pyspark.sql.functions as F

    src, dst = str(tmp_path / "zsrc"), str(tmp_path / "zdst")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(8).write.parquet(src)
    compact_parquet(
        spark, src, dst, target_file_bytes=64 << 10,
        sort_cols=["doc_id", "n_chars"], zorder=True,
    )

    def content_hash(df):
        return df.select(
            F.sum(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", "doc_id", "text", "lang",
                                          "source", "n_chars")), 1, 15),
                    16, 10,
                ).cast("decimal(20)")
            ).alias("h"),
            F.count("*").alias("c"),
        ).first()

    assert content_hash(spark.read.parquet(dst)) == content_hash(docs)
    box = "doc_id BETWEEN 100 AND 300 AND n_chars BETWEEN 100 AND 400"
    assert content_hash(
        spark.read.parquet(dst).where(box)
    ) == content_hash(docs.where(box))
