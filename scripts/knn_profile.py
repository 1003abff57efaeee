#!/usr/bin/env python
"""Step-by-step timing of the self-join dedup 1-NN fast path at bench scale.

Usage: python scripts/knn_profile.py <n_images> <cpus>
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n_images, cpus = int(sys.argv[1]), sys.argv[2]
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from geostatstransforms_jl_spark.core.session import get_spark
    from geostatstransforms_jl_spark.core.images import synthetic_images
    from geostatstransforms_jl_spark.functions import knn as K
    from pyspark.sql import functions as F, Window

    spark = get_spark(app="knn-prof", master=f"local[{cpus}]",
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
    T = {}

    t0 = time.perf_counter()
    stats = pts.agg(F.count("*").alias("n"),
                    F.approx_count_distinct(F.struct("x", "y")).alias("u")).first()
    T["stats_agg"] = round(time.perf_counter() - t0, 2)

    s = K._prefixed(pts, "s_", ("x", "y"), "row_id", ())
    sc = ["s_x", "s_y"]
    sid = "s_row_id"
    w_rn = Window.partitionBy(*sc).orderBy(sid)
    w_all = Window.partitionBy(*sc)
    t0 = time.perf_counter()
    marked = (s.withColumn("_rn", F.row_number().over(w_rn))
               .withColumn("_cnt", F.count("*").over(w_all)).persist())
    n_m = marked.count()
    T["window_marked"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_singles = marked.filter(F.col("_cnt") == 1).count()
    n_uniq = marked.filter(F.col("_rn") == 1).count()
    T["counts"] = round(time.perf_counter() - t0, 2)

    # pile branch
    ren = {c: "t_" + c[2:] for c in s.columns}
    top2 = marked.filter(F.col("_rn") <= 2).select(*s.columns)
    piles_t = marked.filter(F.col("_cnt") >= 2).select(
        *[F.col(c).alias(ren[c]) for c in s.columns])
    cond = (F.col("t_x") == F.col("s_x")) & (F.col("t_y") == F.col("s_y"))
    pairs = piles_t.join(top2, cond).filter(F.col(sid) != F.col("t_row_id"))
    t_cols = [ren[c] for c in s.columns]
    s_payload = [c for c in s.columns if c != sid]
    pile_out = (pairs.groupBy(*t_cols)
                .agg(F.min(F.struct(F.col(sid), *[F.col(c) for c in s_payload])).alias("_b"))
                .select(*t_cols, F.col(f"_b.{sid}").alias(sid),
                        *[F.col(f"_b.{c}").alias(c) for c in s_payload],
                        F.lit(0.0).alias("dist"), F.lit(1).alias("rank")))
    t0 = time.perf_counter()
    n_pile = pile_out.count()
    T["pile_branch"] = round(time.perf_counter() - t0, 2)

    raw = ["row_id", "x", "y"]
    singles_raw = marked.filter(F.col("_cnt") == 1).select(
        *[F.col(f"s_{c}").alias(c) for c in raw])
    uniq_raw = marked.filter(F.col("_rn") == 1).select(
        *[F.col(f"s_{c}").alias(c) for c in raw])
    t0 = time.perf_counter()
    inner = K.knn_join(singles_raw, uniq_raw, 1, exclude_same_id=True,
                       broadcast_threshold=0)
    n_inner = inner.count()
    T["inner_search"] = round(time.perf_counter() - t0, 2)

    print(json.dumps({"cpus": int(cpus), "n": stats["n"], "u": stats["u"],
                      "singles": n_singles, "uniq": n_uniq, "pile_rows": n_pile,
                      "inner_rows": n_inner, "timings": T}))
    spark.stop()


if __name__ == "__main__":
    main()
