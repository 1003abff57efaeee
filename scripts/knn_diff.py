#!/usr/bin/env python
"""Diff ladder vs multires 1-NN outputs on the bench anchor table and
brute-force-verify the disagreeing targets.

Usage: python scripts/knn_diff.py <n_images> <cpus>
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n_images, cpus = int(sys.argv[1]), sys.argv[2]
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from geostatstransforms_jl_spark.core.session import get_spark
    from geostatstransforms_jl_spark.core.images import synthetic_images
    from geostatstransforms_jl_spark.functions import knn as K
    from pyspark.sql import functions as F

    spark = get_spark(app="knn-diff", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    imgs = synthetic_images(spark, n_images, partitions=4 * int(cpus))
    pts = imgs.select(
        F.xxhash64("image_id").alias("row_id"),
        ((F.shiftrightunsigned("phash", 15) % 100000) / 100000.0).alias("x"),
        ((F.col("phash") % 32768) / 32768.0).alias("y"),
    ).persist()
    pts.count()

    a = K.knn_join(pts, pts, k=1, exclude_same_id=True, broadcast_threshold=0) \
        .select("t_row_id", F.col("s_row_id").alias("s_a"), F.col("dist").alias("d_a"))
    b = K.knn_join_multires(pts, pts, k=1, exclude_same_id=True, broadcast_threshold=0) \
        .select("t_row_id", F.col("s_row_id").alias("s_b"), F.col("dist").alias("d_b"))
    j = a.join(b, "t_row_id", "full")
    diff = j.filter(
        (F.col("s_a").isNull()) | (F.col("s_b").isNull())
        | (F.col("s_a") != F.col("s_b")) | (F.abs(F.col("d_a") - F.col("d_b")) > 1e-12)
    ).persist()
    nd = diff.count()
    print(f"disagreeing targets: {nd}")
    rows = diff.limit(20).collect()
    for r in rows:
        print(dict(r.asDict()))
    if nd and nd <= 2000:
        bad_t = pts.join(diff.select("t_row_id"),
                         F.col("row_id") == F.col("t_row_id")).drop("t_row_id").persist()
        truth = K._bcast_targets_scan(
            K._prefixed(bad_t, "t_", ("x", "y"), "row_id", ()),
            K._prefixed(pts, "s_", ("x", "y"), "row_id", ()),
            1, "t_row_id", "s_row_id", "t_x", "t_y", "s_x", "s_y", True, None,
        ).select("t_row_id", F.col("s_row_id").alias("s_t"), F.col("dist").alias("d_t"))
        v = diff.join(truth, "t_row_id")
        bad_a = v.filter(F.abs(F.col("d_a") - F.col("d_t")) > 1e-12).count()
        bad_b = v.filter(F.abs(F.col("d_b") - F.col("d_t")) > 1e-12).count()
        print(json.dumps({"diff": nd, "ladder_wrong_dist": bad_a, "multires_wrong_dist": bad_b}))
        for r in v.filter(
            (F.abs(F.col("d_a") - F.col("d_t")) > 1e-12)
            | (F.abs(F.col("d_b") - F.col("d_t")) > 1e-12)
        ).limit(10).collect():
            print(dict(r.asDict()))
    spark.stop()


if __name__ == "__main__":
    main()
