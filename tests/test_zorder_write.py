"""write_zordered: each output file must hold a contiguous, disjoint
Z-order curve segment with tight per-file x/y statistics — the property
that makes parquet row-group min/max pruning fire on coordinate
predicates at scale."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from geostatstransforms_jl_spark.core.cells import CellGrid
from geostatstransforms_jl_spark.sources import write_zordered


@pytest.fixture()
def points(spark):
    rng = np.random.default_rng(7)
    n = 40_000
    rows = [(int(i), float(x), float(y)) for i, (x, y) in
            enumerate(zip(rng.random(n), rng.random(n)))]
    return spark.createDataFrame(rows, "row_id long, x double, y double")


def _file_stats(path):
    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        t = pq.read_table(f, columns=["zkey", "x", "y"])
        if t.num_rows == 0:
            continue
        zk = t["zkey"].to_numpy()
        x, y = t["x"].to_numpy(), t["y"].to_numpy()
        out.append({
            "rows": t.num_rows,
            "zmin": int(zk.min()), "zmax": int(zk.max()),
            "area": float((x.max() - x.min()) * (y.max() - y.min())),
        })
    return out


def test_files_are_disjoint_curve_segments_with_tight_stats(spark, points, tmp_path):
    grid = CellGrid.box2d(0.0, 0.0, 1.0, 1.0, 8)
    dest = str(tmp_path / "zordered")
    write_zordered(points, dest, grid, num_files=8)

    stats = _file_stats(dest)
    assert sum(s["rows"] for s in stats) == 40_000
    assert len(stats) >= 4  # range partitioner actually split the curve
    # disjoint, ordered key ranges: file i's zmax < file i+1's zmin
    ordered = sorted(stats, key=lambda s: s["zmin"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["zmax"] < b["zmin"]
    # spatial tightness: mean per-file bbox area well under the global
    # bbox (an unsorted write gives every file area ≈ 1.0); Z-order curve
    # segments at 8 files should average well below half the domain
    mean_area = sum(s["area"] for s in stats) / len(stats)
    assert mean_area < 0.5, f"files not spatially clustered: {mean_area}"

    # read-back: a coordinate-range predicate reaches the parquet scan
    back = spark.read.parquet(dest).filter((F.col("x") < 0.1) & (F.col("y") < 0.1))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(x,0.1)" in plan
    assert back.count() == sum(
        1 for r in points.collect() if r.x < 0.1 and r.y < 0.1
    )


def test_write_mode_and_key_col(spark, points, tmp_path):
    grid = CellGrid.box2d(0.0, 0.0, 1.0, 1.0, 8)
    dest = str(tmp_path / "zw")
    write_zordered(points, dest, grid, num_files=4, key_col="cell_key")
    cols = spark.read.parquet(dest).columns
    assert "cell_key" in cols and "zkey" not in cols
    # default mode='error' refuses to clobber an existing dataset
    with pytest.raises(Exception):
        write_zordered(points, dest, grid, num_files=4)
