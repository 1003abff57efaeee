"""North-rule deployment job: run the spatial-join + tile-assignment pipeline
via ``spark-submit --py-files gst_spark.zip scripts/submit_job.py [n_images]``.

The package ships as a zip on the executors' PYTHONPATH (no install step),
matching the north rule's `spark-submit --py-files` constraint.  Prints one
JSON line with row counts and throughput.
"""

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    spark = SparkSession.builder.appName("gst-submit").getOrCreate()
    # imported AFTER the session exists: the zip from --py-files is on the path
    from geostatstransforms_jl_spark.core.images import synthetic_images
    from geostatstransforms_jl_spark.operators.gradient import gradient_packed
    from geostatstransforms_jl_spark.functions.knn import knn_join
    from geostatstransforms_jl_spark.operators.uniquecoords import unique_coords_df

    t0 = time.perf_counter()
    imgs = synthetic_images(spark, n_images, partitions=64).persist()
    n_g = gradient_packed(imgs).count()
    pts = imgs.select(
        F.xxhash64("image_id").alias("row_id"),
        ((F.shiftrightunsigned("phash", 15) % 100000) / 100000.0).alias("x"),
        ((F.col("phash") % 32768) / 32768.0).alias("y"),
    ).persist()
    n_nn = knn_join(pts, pts, k=1, exclude_same_id=True, broadcast_threshold=0).count()
    n_uc = unique_coords_df(pts, ("x", "y")).count()
    sec = time.perf_counter() - t0
    print(json.dumps({
        "images": n_images,
        "gradient_tiles": n_g,
        "nn_rows": n_nn,
        "unique_coords": n_uc,
        "sec": round(sec, 2),
        "images_per_sec": round(n_images / sec, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
