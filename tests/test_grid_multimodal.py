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


def test_decode_real_path_is_marked_unimplemented(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = documents_as_media(docs)
    with pytest.raises(Exception, match="NotImplementedError|not in this environment"):
        decode_image_meta(media, fake=False).collect()


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
