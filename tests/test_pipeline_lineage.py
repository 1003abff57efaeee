"""Pipeline composition + checkpoint/lineage + kill/resume + streaming tests."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from geostatstransforms_jl_spark.core.geotable import georef_grid, georef_points
from geostatstransforms_jl_spark.core.grid import GridMeta
from geostatstransforms_jl_spark.core.lineage import MANIFEST, LineageStore
from geostatstransforms_jl_spark.operators import Detrend, Upscale, UniqueCoords
from geostatstransforms_jl_spark.plans import Pipeline


@pytest.fixture()
def store(tmp_path):
    return LineageStore(str(tmp_path / "ckpt"))


def _points(spark):
    rows = [(k, float(k % 50), float(k % 7), float(k)) for k in range(500)]
    return spark.createDataFrame(rows, "row_id long, x double, y double, a double")


def test_pipeline_lazy_composition(spark):
    gt = georef_points(_points(spark))
    pipe = Pipeline([UniqueCoords(), Detrend(["a"], degree=1)])
    out, caches = pipe.run(gt)
    assert out.df.count() == 350  # 50*7 unique coordinate pairs
    assert caches[1] is not None  # detrend cache present


def test_pipeline_commit_and_manifest(spark, store):
    gt = georef_points(_points(spark))
    pipe = Pipeline([UniqueCoords()], store=store)
    out, _ = pipe.run(gt)
    n = out.df.count()
    m = store.manifest(0, "uniquecoords")
    assert m is not None
    assert m["rows"] == n
    assert m["partitions"] and all("hash" in p and "rows" in p for p in m["partitions"])
    assert sum(p["rows"] for p in m["partitions"]) == n
    assert store.validate(spark, 0, "uniquecoords")


def test_resume_skips_valid_stages(spark, store):
    calls = {"n": 0}

    def counting_stage(df):
        calls["n"] += 1
        return df.withColumn("b", F.col("a") * 2)

    counting_stage.__name__ = "double_a"
    gt = georef_points(_points(spark))
    pipe = Pipeline([UniqueCoords(), counting_stage], store=store)
    out1, _ = pipe.run(gt)
    r1 = {(r.x, r.y): r.b for r in out1.df.collect()}
    assert calls["n"] == 1

    out2, _ = pipe.run(gt, resume=True)
    assert calls["n"] == 1  # second run replayed from snapshots
    assert all(m["resumed"] for m in pipe.metrics)
    r2 = {(r.x, r.y): r.b for r in out2.df.collect()}
    assert r1 == r2


def test_resume_rejects_corrupt_snapshot(spark, store):
    gt = georef_points(_points(spark))
    pipe = Pipeline([UniqueCoords()], store=store)
    pipe.run(gt)
    # corrupt the committed data: drop a parquet part file (simulated
    # partial loss after a kill)
    d = store.stage_dir(0, "uniquecoords")
    parts = [f for f in os.listdir(d) if f.endswith(".parquet")]
    os.remove(os.path.join(d, parts[0]))
    assert not store.validate(spark, 0, "uniquecoords")
    out, _ = pipe.run(gt, resume=True)  # recomputes instead of trusting it
    assert not pipe.metrics[0]["resumed"]
    assert store.validate(spark, 0, "uniquecoords")


def test_kill_leaves_no_half_commit(spark, store):
    # a .tmp dir without rename must never validate
    gt = georef_points(_points(spark))
    pipe = Pipeline([UniqueCoords()], store=store)
    pipe.run(gt)
    final = store.stage_dir(0, "uniquecoords")
    tmp = final + ".tmp"
    shutil.move(final, tmp)  # simulate dying before the atomic rename
    assert store.manifest(0, "uniquecoords") is None
    assert not store.validate(spark, 0, "uniquecoords")


def test_pipeline_revert(spark, store):
    gt = georef_points(_points(spark))
    pipe = Pipeline([Detrend(["a"], degree=1)])
    out, caches = pipe.run(gt)
    back = pipe.revert(out, caches)
    orig = {r.row_id: r.a for r in gt.df.collect()}
    rec = {r.row_id: r.a for r in back.df.collect()}
    for k in orig:
        assert rec[k] == pytest.approx(orig[k], abs=1e-8)


def test_streaming_unique_coords(spark, tmp_path):
    # run the streaming dedup over a file source and compare to batch
    from geostatstransforms_jl_spark.streaming import streaming_unique_coords

    src = tmp_path / "stream_src"
    df = _points(spark)
    df.write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    agg = streaming_unique_coords(stream, value_col="a")
    q = (
        agg.writeStream.format("memory")
        .queryName("uc_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from uc_stream")
    assert got.count() == 350
    batch = df.groupBy("x", "y").agg(F.avg("a").alias("a"))
    b = {(r.x, r.y): r.a for r in batch.collect()}
    g = {(r.x, r.y): r.a for r in got.collect()}
    assert b == pytest.approx(g)


def test_streaming_time_rollup(spark, tmp_path):
    # streaming hourly rollup over a file source == batch rollup (count/sum/avg)
    from geostatstransforms_jl_spark.streaming import streaming_time_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = tmp_path / "ev_src"
    ev.write.parquet(str(src))
    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    agg = streaming_time_rollup(stream, "1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select bucket.start as b, event_type, n, sum_value from ev_stream")
    batch = ev.groupBy(
        F.date_trunc("hour", "ts").alias("b"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    g = {(r.b, r.event_type): (r.n, round(r.sum_value, 6)) for r in got.collect()}
    b = {(r.b, r.event_type): (r.n, round(r.sum_value, 6)) for r in batch.collect()}
    assert g == b


def test_tabletransforms_vocabulary(spark):
    # P12: Select/Reject/Only/Filter/OneHot/StdFeats as composable stages
    import pytest as _pytest
    from geostatstransforms_jl_spark.core.geotable import georef_points
    from geostatstransforms_jl_spark.operators import (
        Filter, OneHot, Only, Reject, Select, StdFeats,
    )
    from geostatstransforms_jl_spark.plans.pipeline import Pipeline

    df = spark.createDataFrame(
        [(i, float(i % 7), float(i % 5), float(i), f"c{i % 3}", i) for i in range(60)],
        "row_id long, x double, y double, a double, cat string, n long",
    )
    gt = georef_points(df)

    sel, _ = Select(["a", "cat"]).apply(gt)
    assert set(sel.df.columns) == {"row_id", "x", "y", "a", "cat"}
    rej, _ = Reject(["cat", "x"]).apply(gt)  # x is geometry → protected
    assert set(rej.df.columns) == {"row_id", "x", "y", "a", "n"}
    only, _ = Only("continuous").apply(gt)
    assert set(only.df.columns) == {"row_id", "x", "y", "a"}

    oh, levels = OneHot("cat").apply(gt)
    assert levels == ["c0", "c1", "c2"]
    assert oh.df.select(F.sum("cat_c0")).first()[0] == 20

    # Filter is revertible: dropped rows come back
    filt = Filter("a < 30")
    kept, dropped = filt.apply(gt)
    assert kept.df.count() == 30 and dropped.count() == 30
    back = filt.revert(kept, dropped)
    assert back.df.count() == 60

    # StdFeats: zero mean / unit variance, revert restores values
    sf = StdFeats(["a"])
    std, moments = sf.apply(gt)
    m = std.df.agg(F.avg("a"), F.stddev_samp("a")).first()
    assert abs(m[0]) < 1e-9 and abs(m[1] - 1.0) < 1e-9
    rec = sf.revert(std, moments)
    orig = {r.row_id: r.a for r in gt.df.collect()}
    got = {r.row_id: r.a for r in rec.df.collect()}
    for k in orig:
        assert got[k] == _pytest.approx(orig[k], abs=1e-9)

    # composes in a Pipeline with stacked revert
    pipe = Pipeline([StdFeats(["a"]), Filter("a > -10")])
    out, caches = pipe.run(gt)
    assert out.df.count() == 60
