"""Measure Z-order row-group pruning (VERDICT r5 #4).

Rewrites the scaled ``documents`` table three ways with
``compact_parquet`` — unsorted, single-axis sort on doc_id, and Z-order
on (doc_id, n_chars) — then runs three predicates over each layout:

    box     doc_id BETWEEN lo AND hi AND n_chars BETWEEN clo AND chi
    axis_a  doc_id BETWEEN lo AND hi            (the sorted axis)
    axis_b  n_chars BETWEEN clo AND chi         (the OFF-axis column)

and reports, per (layout, predicate): row groups / rows whose parquet
min-max footer stats overlap the predicate (the exact set a
stats-pruning reader must touch, via pyarrow — independent of Spark
scheduling noise) and Spark wall time for a count+sum over the filtered
scan (min of 2). The expected shape — and why Z-order exists: a
single-axis sort is unbeatable on its own axis but prunes NOTHING on
the off-axis column; Z-order is slightly worse on each single axis but
prunes BOTH, so mixed workloads touch far less data.

An order-insensitive content hash of each filtered result is asserted
identical across layouts (layout moves placement, never rows).

Bounds come from quantiles, not linear min/max interpolation —
replicated doc_ids cluster near multiples of the shift stride, so a
linear box can land in an empty gap.

Usage: python tools/probe_zorder.py [scale_dir] [target_file_kb]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.layout import compact_parquet  # noqa: E402


def footer_overlap(path: str, box: dict[str, tuple[int, int]]) -> dict:
    """Count files/row groups/rows whose min-max stats overlap the box."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    total_rg = hit_rg = hit_files = 0
    total_rows = hit_rows = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        file_hit = False
        for rg_i in range(md.num_row_groups):
            rg = md.row_group(rg_i)
            total_rg += 1
            total_rows += rg.num_rows
            overlap = True
            for col, (lo, hi) in box.items():
                st = rg.column(names[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> reader must touch it
                if st.min > hi or st.max < lo:
                    overlap = False
                    break
            if overlap:
                hit_rg += 1
                hit_rows += rg.num_rows
                file_hit = True
        hit_files += file_hit
    return {
        "files": len(files),
        "files_hit": hit_files,
        "row_groups": total_rg,
        "rg_hit": hit_rg,
        "rows": total_rows,
        "rows_hit": hit_rows,
    }


def main() -> None:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale_test100"
    target_kb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    scratch = ".zorder_probe"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)

    spark = get_spark()
    src = os.path.join(src_dir, "documents.parquet")

    qs = spark.read.parquet(src).approxQuantile(
        ["doc_id", "n_chars"], [0.45, 0.55], 0.001
    )
    lo, hi = int(qs[0][0]), int(qs[0][1])
    clo, chi = int(qs[1][0]), int(qs[1][1])
    preds = {
        "box": (
            f"doc_id BETWEEN {lo} AND {hi} AND n_chars BETWEEN {clo} AND {chi}",
            {"doc_id": (lo, hi), "n_chars": (clo, chi)},
        ),
        "axis_a": (f"doc_id BETWEEN {lo} AND {hi}", {"doc_id": (lo, hi)}),
        "axis_b": (f"n_chars BETWEEN {clo} AND {chi}", {"n_chars": (clo, chi)}),
    }
    for p, (sql, _) in preds.items():
        print(f"{p}: {sql}")

    layouts = {
        "unsorted": dict(sort_cols=None),
        "sort_doc_id": dict(sort_cols=["doc_id"]),
        "zorder": dict(sort_cols=["doc_id", "n_chars"], zorder=True),
    }
    hashes = {p: {} for p in preds}
    print(
        f"{'layout':<12} {'pred':<7} {'rgs':>4} {'rg_hit':>6} {'rg%':>4} "
        f"{'rows_hit':>9} {'row%':>5} {'scan_s':>7}"
    )
    for name, kw in layouts.items():
        dst = os.path.join(scratch, name)
        compact_parquet(spark, src, dst, target_file_bytes=target_kb << 10, **kw)
        for p, (sql, pbox) in preds.items():
            ov = footer_overlap(dst, pbox)
            times = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                spark.read.parquet(dst).where(sql).selectExpr(
                    "count(*) c", "sum(n_chars) s"
                ).first()
                times.append(time.time() - t0)
            hashes[p][name] = (
                spark.read.parquet(dst)
                .where(sql)
                .selectExpr(
                    "count(*) c",
                    "sum(cast(conv(substr(md5(concat_ws('|', doc_id, text, "
                    "lang, source, n_chars)), 1, 15), 16, 10) as decimal(20))) h",
                )
                .first()
            )
            print(
                f"{name:<12} {p:<7} {ov['row_groups']:>4} {ov['rg_hit']:>6} "
                f"{100 * ov['rg_hit'] // max(ov['row_groups'], 1):>3}% "
                f"{ov['rows_hit']:>9} "
                f"{100 * ov['rows_hit'] // max(ov['rows'], 1):>4}% "
                f"{min(times):>7.2f}"
            )

    for p in preds:
        vals = {(r.c, r.h) for r in hashes[p].values()}
        assert len(vals) == 1, f"content drift on {p}: {hashes[p]}"
        print(f"{p}: content-hash equal across layouts (rows={vals.pop()[0]})")
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
