#!/usr/bin/env python
"""A/B the two exact-kNN strategies (driver-looped ladder vs two-pass
multires) on the bench image anchor table, fresh JVM per run.

Usage: python scripts/knn_ab.py <strategy: ladder|multires> <n_images> <cpus>
Prints one JSON line.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    strategy, n_images, cpus = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from geostatstransforms_jl_spark.core.session import get_spark
    from geostatstransforms_jl_spark.core.images import synthetic_images
    from geostatstransforms_jl_spark.functions import knn as K
    from pyspark.sql import functions as F

    spark = get_spark(app=f"knn-ab-{strategy}", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.range(10).count()
    imgs = synthetic_images(spark, n_images, partitions=4 * int(cpus))
    pts = imgs.select(
        F.xxhash64("image_id").alias("row_id"),
        ((F.shiftrightunsigned("phash", 15) % 100000) / 100000.0).alias("x"),
        ((F.col("phash") % 32768) / 32768.0).alias("y"),
        F.col("phash"),
    ).persist()
    pts.count()
    fn = K.knn_join if strategy == "ladder" else K.knn_join_multires
    t0 = time.perf_counter()
    nn = fn(pts, pts, k=1, exclude_same_id=True, broadcast_threshold=0)
    n = nn.count()
    sec = time.perf_counter() - t0
    # cheap checksum for cross-strategy result equality
    chk = nn.agg(
        F.sum(F.pmod(F.xxhash64("t_row_id", "s_row_id"), F.lit(1_000_000_007))).alias("c")
    ).collect()[0]["c"]
    print(json.dumps({"strategy": strategy, "images": n_images, "cpus": int(cpus),
                      "rows": n, "sec": round(sec, 2),
                      "img_per_sec": round(n_images / sec, 1), "checksum": chk}))
    spark.stop()


if __name__ == "__main__":
    main()
