"""Tile-assignment scaling evidence (north rule, round 4): the cells-rollup
stage — parquet scan → phash georeference → Morton cell key → per-cell
count/distinct-phash hash aggregate — at two parallelism levels over the
SAME materialized anchor table, reporting rows/sec at both plus efficiency.
Same protocol as the image/media scaling runs (fresh JVM per run,
interleaved reps, best per level; local[1] vs local[4] is this host's
honest N -> 4N pair, BENCH/README.md).

The anchor fixture is synthesized ONCE (make_image(encode=False): identical
image_id/phash values to the bench's image table, the codec draws no RNG)
and written to .scratch/ so the measured job is the realistic 100-TB shape:
a table scan feeding codegen'd bit expressions and one aggregate Exchange.

Usage: python scripts/cells_scaling.py [n_rows] [low] [high] [reps]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
LOW = sys.argv[2] if len(sys.argv) > 2 else "1"
HIGH = sys.argv[3] if len(sys.argv) > 3 else "4"
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 2
FIXTURE = os.path.join(REPO, ".scratch", f"anchors_{N}")

GEN = """
import sys
sys.path.insert(0, %(repo)r)
import pandas as pd
from pyspark.sql import functions as F
from geostatstransforms_jl_spark.core.session import get_spark
from geostatstransforms_jl_spark.core.images import make_image, georef_lonlat

n, path = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app="gst-cells-gen", master="local[16]", shuffle_partitions=16)

def gen(batches):
    for pdf in batches:
        ids = pdf["id"].tolist()
        yield pd.DataFrame({
            "row_id": ids,
            "phash": [make_image(int(i), encode=False)[6] & ((1 << 63) - 1)
                      for i in ids],
        })

lon, lat = georef_lonlat("phash")
(spark.range(n, numPartitions=64)
 .mapInPandas(gen, "row_id long, phash long")
 .select("row_id", "phash", lon.alias("x"), lat.alias("y"))
 .write.mode("overwrite").parquet(path))
spark.stop()
print("GEN_DONE")
"""

WORKER = """
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from geostatstransforms_jl_spark.core.session import get_spark
from geostatstransforms_jl_spark.core.cells import CellGrid
from geostatstransforms_jl_spark.functions.geocell import morton_cell

cpus, path, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app=f"gst-cells-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus))
spark.range(10).count()  # JVM warm
grid = CellGrid.box2d(0.0, 0.0, 1.0, 1.0, 8)
t0 = time.perf_counter()
res = (spark.read.parquet(path)
       .withColumn("zkey", morton_cell(grid, F.col("x"), F.col("y")))
       .groupBy("zkey")
       .agg(F.count("*").alias("n"), F.countDistinct("phash").alias("n_phash"))
       .agg(F.sum("n"), F.count("*"), F.sum("n_phash"))
       .first())
sec = time.perf_counter() - t0
assert res[0] == n, f"row conservation: {res[0]} != {n}"
spark.stop()
print("CELLS_JSON " + json.dumps({
    "cpus": int(cpus), "sec": round(sec, 2), "cells": res[1],
    "distinct_phash_sum": res[2], "rows_per_sec": round(n / sec, 1)}))
"""


def run_level(cpus: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, cpus, FIXTURE, str(N)],
        capture_output=True, text=True, cwd=REPO,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("CELLS_JSON ")]
    if p.returncode != 0 or not lines:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:] + "\n")
        raise RuntimeError(f"worker local[{cpus}] failed (rc={p.returncode})")
    return json.loads(lines[0][len("CELLS_JSON "):])


def main():
    if not os.path.exists(os.path.join(FIXTURE, "_SUCCESS")):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-c", GEN % {"repo": REPO}, str(N), FIXTURE],
            capture_output=True, text=True, cwd=REPO,
        )
        if "GEN_DONE" not in p.stdout:
            sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:] + "\n")
            raise RuntimeError("fixture generation failed")
        print(f"fixture {N} rows in {time.time()-t0:.0f}s", flush=True)

    runs = {LOW: [], HIGH: []}
    for rep in range(REPS):  # interleaved: a noise burst can't bias one level
        for lvl in (LOW, HIGH):
            r = run_level(lvl)
            runs[lvl].append(r)
            print(f"rep {rep} local[{lvl}]: {r['sec']}s "
                  f"{r['rows_per_sec']} rows/s", flush=True)
    best = {lvl: max(rs, key=lambda r: r["rows_per_sec"]) for lvl, rs in runs.items()}
    ratio = int(HIGH) / int(LOW)
    eff = best[HIGH]["rows_per_sec"] / best[LOW]["rows_per_sec"] / ratio
    out = {
        "stage": "tile_assignment_cells", "rows": N,
        "low": best[LOW], "high": best[HIGH],
        "runs": {k: [r["sec"] for r in v] for k, v in runs.items()},
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
