"""Z-order layout quality. Tiling a rectangle is area-invariant, so the
meaningful metric is per-dimension file spans: under a single-column
sort every file spans (nearly) the FULL range of the second column;
under Z-order every file is bounded in BOTH dimensions, so a rectangle
predicate skips files on either column's min/max stats.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ds_mapreduce_spark.plans.format_queries import zorder_write
from ds_mapreduce_spark.sources.catalog import load_table


def _file_boxes(path_glob: str, xcol: str, ycol: str):
    boxes = []
    for f in sorted(glob.glob(path_glob)):
        t = pq.read_table(f, columns=[xcol, ycol])
        xs, ys = t.column(xcol).to_pylist(), t.column(ycol).to_pylist()
        if xs:
            boxes.append((min(xs), max(xs), min(ys), max(ys)))
    return boxes


def _overlaps(box, x_lo, x_hi, y_lo, y_hi):
    xmin, xmax, ymin, ymax = box
    return not (xmax < x_lo or xmin > x_hi or ymax < y_lo or ymin > y_hi)


def test_zorder_bounds_both_dimensions(spark, sf_dir, tmp_path):
    out = zorder_write(spark, sf_dir)
    z_boxes = _file_boxes(f"{out}/*.parquet", "l_orderkey", "l_partkey")
    assert len(z_boxes) >= 4  # actually fragmented into multiple files

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_returnflag"
    )
    single = str(tmp_path / "single_sort")
    (
        li.repartitionByRange(8, F.col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(single)
    )
    s_boxes = _file_boxes(f"{single}/*.parquet", "l_orderkey", "l_partkey")

    # the second dimension: single-sort files span (nearly) the full
    # partkey range; z-order files must be substantially tighter
    z_yspan = sum(b[3] - b[2] + 1 for b in z_boxes) / len(z_boxes)
    s_yspan = sum(b[3] - b[2] + 1 for b in s_boxes) / len(s_boxes)
    assert z_yspan < 0.6 * s_yspan, (z_boxes, s_boxes)

    # file-level pruning for the graded query's rectangle: z-order must
    # skip files (and never touch more than the single-sort layout)
    rect = (100, 500, 20, 80)
    z_hits = sum(_overlaps(b, *rect) for b in z_boxes)
    s_hits = sum(_overlaps(b, *rect) for b in s_boxes)
    assert z_hits < len(z_boxes), "rectangle must skip at least one z-ordered file"
    assert z_hits <= s_hits, (z_boxes, s_boxes)
