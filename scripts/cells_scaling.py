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

Shuffle partitioning is FIXED across both levels (default: 2x the high
level, overridable as argv[5]) so the two legs run the identical physical
plan over identical partition sizes and only executor parallelism differs —
the same comparison a real N -> 4N cluster run makes.  Tying partitions to
the core count instead conflates two effects: at local[1] a single shuffle
partition holding the whole countDistinct expand spills, which makes the
low leg artificially slow and the efficiency super-linear (measured:
1.048 at 128M rows with partitions=cores vs honest fixed-partition
readings; the 2026-08-18 log pair is kept in BENCH/BASELINE.md).

Three rollup modes decompose where the time goes at 100-TB shape:
  exact   count + countDistinct(phash): the expand shuffle carries one row
          per (cell, phash) pair — O(n) shuffle volume, the known
          scale anti-pattern for high-cardinality distinct counts
  approx  count + approx_count_distinct(phash): fixed-size HLL buffers,
          map-side combine, shuffle volume O(cells) — the design this
          engine would ship at 10^12 rows
  count   count + sum: pure assignment + associative rollup (no distinct)

`repeat` (argv[7]) unions k full scans of the same fixture into one job —
an effective k*n-row input from an n-row fixture, amortizing fixed
startup cost the way a genuinely larger table would, without hours of
fixture synthesis (the bytes are decoded k times; only the OS page cache
is shared, which a 100-TB scan would also enjoy per-file).

`dist` (argv[8]) picks the key distribution:
  real  phash-georeferenced anchors (the bench's image table shape)
  zipf  hot-cell stress (SURVEY §7: phash-derived cells are Zipfian by
        construction): cell ranks drawn Zipf(s=1.2) over all 256x256 grid
        cells — the hottest cell alone holds ~20% of all rows, the top
        ten ~49% (measured at 200k rows) — with x,y
        uniform inside the drawn cell so the Morton key maps 1:1 onto the
        skewed rank.  Verifies HLL map-side combine + AQE hold the 0.8
        efficiency target when the groupBy key is heavy-tailed.

The fixture cache key includes a content tag (hash of this script's GEN
block + core/images.py), so editing the synthesis invalidates old
fixtures instead of silently reusing them.

Usage: python scripts/cells_scaling.py [n_rows] [low] [high] [reps] [shuffle_partitions] [mode] [repeat] [dist]
"""

import hashlib
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
SP = int(sys.argv[5]) if len(sys.argv) > 5 else 2 * int(HIGH)
MODE = sys.argv[6] if len(sys.argv) > 6 else "exact"
REPEAT = int(sys.argv[7]) if len(sys.argv) > 7 else 1
DIST = sys.argv[8] if len(sys.argv) > 8 else "real"
assert DIST in ("real", "zipf"), DIST

GEN = """
import sys
sys.path.insert(0, %(repo)r)
import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from geostatstransforms_jl_spark.core.session import get_spark
from geostatstransforms_jl_spark.core.images import make_image, georef_lonlat

n, path, dist = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark(app="gst-cells-gen", master="local[16]", shuffle_partitions=16)

def gen_real(batches):
    for pdf in batches:
        ids = pdf["id"].tolist()
        yield pd.DataFrame({
            "row_id": ids,
            "phash": [make_image(int(i), encode=False)[6] & ((1 << 63) - 1)
                      for i in ids],
        })

# Zipf hot-cell synthesis: deterministic per row (splitmix64 uniforms), cell
# rank ~ Zipf(s=1.2) over all 256x256 cells of the WORKER's level-8 grid,
# point uniform inside the drawn cell.  Rank->cell is a fixed permutation so
# hot cells scatter spatially (hot Morton keys land in different shuffle
# partitions, isolating key skew from range skew).
_K, _S = 1 << 16, 1.2
_w = 1.0 / np.arange(1, _K + 1, dtype=np.float64) ** _S
_cdf = np.cumsum(_w) / _w.sum()
_perm = np.random.Generator(np.random.PCG64(12345)).permutation(_K)

def _u(ids, salt):
    z = (ids + np.uint64(salt)) * np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30); z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27); z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)

def gen_zipf(batches):
    for pdf in batches:
        ids = pdf["id"].to_numpy().astype(np.uint64)
        rank = np.searchsorted(_cdf, _u(ids, 1))
        cell = _perm[np.clip(rank, 0, _K - 1)]
        x = (cell %% 256 + _u(ids, 2)) / 256.0
        y = (cell // 256 + _u(ids, 3)) / 256.0
        phash = ((ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(1))
        yield pd.DataFrame({
            "row_id": ids.astype("int64"),
            "phash": phash.astype("int64"),
            "x": x, "y": y,
        })

base = spark.range(n, numPartitions=64)
if dist == "real":
    lon, lat = georef_lonlat("phash")
    out = (base.mapInPandas(gen_real, "row_id long, phash long")
           .select("row_id", "phash", lon.alias("x"), lat.alias("y")))
else:
    out = base.mapInPandas(gen_zipf, "row_id long, phash long, x double, y double")
out.write.mode("overwrite").parquet(path)
spark.stop()
print("GEN_DONE")
"""

# fixture cache key: row count + distribution + a content tag over the
# synthesis code (this GEN block and core/images.py) — editing either
# invalidates stale fixtures instead of silently reusing them
_IMAGES_SRC = os.path.join(
    REPO, "geostatstransforms_jl_spark", "core", "images.py"
)
with open(_IMAGES_SRC, "rb") as _f:
    _TAG = hashlib.sha256(GEN.encode() + _f.read()).hexdigest()[:8]
FIXTURE = os.path.join(REPO, ".scratch", f"anchors_{N}_{DIST}_{_TAG}")

WORKER = """
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from geostatstransforms_jl_spark.core.session import get_spark
from geostatstransforms_jl_spark.core.cells import CellGrid
from geostatstransforms_jl_spark.functions.geocell import morton_cell

cpus, path, n, sp, mode, repeat = (sys.argv[1], sys.argv[2], int(sys.argv[3]),
                                   int(sys.argv[4]), sys.argv[5],
                                   int(sys.argv[6]))
spark = get_spark(app=f"gst-cells-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=sp)
spark.range(10).count()  # JVM warm
grid = CellGrid.box2d(0.0, 0.0, 1.0, 1.0, 8)
distinct_agg = {
    "exact": F.countDistinct("phash"),
    "approx": F.approx_count_distinct("phash"),
    "count": F.sum(F.shiftrightunsigned("phash", 32)),
}[mode]
t0 = time.perf_counter()
scan = spark.read.parquet(path)
for _ in range(repeat - 1):  # separate scan nodes: no file-index dedup
    scan = scan.union(spark.read.parquet(path))
res = (scan
       .withColumn("zkey", morton_cell(grid, F.col("x"), F.col("y")))
       .groupBy("zkey")
       .agg(F.count("*").alias("n"), distinct_agg.alias("n_phash"))
       .agg(F.sum("n"), F.count("*"), F.sum("n_phash"))
       .first())
sec = time.perf_counter() - t0
assert res[0] == n * repeat, f"row conservation: {res[0]} != {n * repeat}"
spark.stop()
print("CELLS_JSON " + json.dumps({
    "cpus": int(cpus), "sec": round(sec, 2), "cells": res[1],
    "distinct_phash_sum": res[2], "rows_per_sec": round(n * repeat / sec, 1)}))
"""


def run_level(cpus: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, cpus, FIXTURE, str(N), str(SP), MODE, str(REPEAT)],
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
            [sys.executable, "-c", GEN % {"repo": REPO}, str(N), FIXTURE, DIST],
            capture_output=True, text=True, cwd=REPO,
        )
        if "GEN_DONE" not in p.stdout:
            sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:] + "\n")
            raise RuntimeError("fixture generation failed")
        print(f"fixture {N} rows in {time.time()-t0:.0f}s", flush=True)
    mtime = time.strftime(
        "%Y-%m-%d %H:%M",
        time.localtime(os.path.getmtime(os.path.join(FIXTURE, "_SUCCESS"))),
    )
    print(f"fixture {FIXTURE} (generated {mtime})", flush=True)

    runs = {LOW: [], HIGH: []}
    for rep in range(REPS):  # interleaved: a noise burst can't bias one level
        for lvl in (LOW, HIGH):
            r = run_level(lvl)
            runs[lvl].append(r)
            print(f"rep {rep} local[{lvl}]: {r['sec']}s "
                  f"{r['rows_per_sec']} rows/s", flush=True)
    best = {lvl: max(rs, key=lambda r: r["rows_per_sec"]) for lvl, rs in runs.items()}
    # output identity across parallelism levels (north rule): cell count and
    # the rollup checksum must not depend on the executor count (HLL merge is
    # commutative, so even approx mode is partition-order-invariant)
    for fld in ("cells", "distinct_phash_sum"):
        vals = {r[fld] for rs in runs.values() for r in rs}
        assert len(vals) == 1, f"{fld} differs across levels: {vals}"
    ratio = int(HIGH) / int(LOW)
    eff = best[HIGH]["rows_per_sec"] / best[LOW]["rows_per_sec"] / ratio
    out = {
        "stage": "tile_assignment_cells", "rows": N * REPEAT,
        "shuffle_partitions": SP, "mode": MODE, "repeat": REPEAT,
        "dist": DIST,
        "low": best[LOW], "high": best[HIGH],
        "runs": {k: [r["sec"] for r in v] for k, v in runs.items()},
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
