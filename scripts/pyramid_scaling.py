"""Multi-resolution pyramid scaling evidence (round 5): quantifies the two
claims in ``functions.cell_pyramid``'s docstring on real measurements.

1. **Plan claim** — the pyramid materializes EVERY zoom level from ONE scan
   of the input (persisted level-0 base, tiers re-aggregate O(cells) rows),
   while the naive alternative runs one GROUP BY per level and therefore
   scans + Morton-keys the input once PER LEVEL.  Both plans are run at the
   same parallelism over the same fixture and must produce bit-identical
   tier outputs in ``count`` mode (associative count/sum re-aggregation is
   exact); the reported ``pyramid_speedup`` is naive_sec / pyramid_sec.

2. **North-rule pair** — the pyramid job itself at two parallelism levels
   (fresh JVM per run, interleaved reps, FIXED shuffle partitioning across
   levels — the protocol every scaling pair in BENCH/BASELINE.md uses),
   reporting rows/sec at both plus scaling efficiency.

Modes:
  count  count + sum(phash >> 32) per tier: associative, so pyramid and
         naive outputs are asserted BIT-IDENTICAL tier by tier.
  hll    adds a distinct-phash estimate per tier: the pyramid unions
         DataSketches HLL (hll_sketch_agg / hll_union_agg), the naive plan
         computes approx_count_distinct per level directly — two different
         valid estimators, so only n_rows/sum checksums are asserted
         identical and both distinct totals are reported side by side.

The anchor fixture is SHARED with scripts/cells_scaling.py (same GEN code,
same content-tagged cache key) — one synthesis feeds both harnesses, and
`repeat` unions k scans of the fixture for an effective k*n-row input the
same way cells_scaling.py documents.

Usage: python scripts/pyramid_scaling.py [n_rows] [low] [high] [reps]
           [shuffle_partitions] [mode] [repeat] [dist] [levels]
"""

import importlib.util
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
MODE = sys.argv[6] if len(sys.argv) > 6 else "count"
REPEAT = int(sys.argv[7]) if len(sys.argv) > 7 else 1
DIST = sys.argv[8] if len(sys.argv) > 8 else "real"
LEVELS = int(sys.argv[9]) if len(sys.argv) > 9 else 8
assert MODE in ("count", "hll"), MODE
assert DIST in ("real", "zipf"), DIST

# Reuse cells_scaling's fixture machinery (GEN block + content-tagged cache
# key) so both harnesses share one synthesis.  cells_scaling parses sys.argv
# at import time; hand it a compatible argv for the duration of the import.
_saved_argv = sys.argv
sys.argv = ["cells_scaling.py", str(N), LOW, HIGH, "1", str(SP), "count", "1", DIST]
_spec = importlib.util.spec_from_file_location(
    "cells_scaling", os.path.join(REPO, "scripts", "cells_scaling.py")
)
_cs = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cs)
sys.argv = _saved_argv
FIXTURE = _cs.FIXTURE

WORKER = """
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from geostatstransforms_jl_spark.core.session import get_spark
from geostatstransforms_jl_spark.core.cells import CellGrid
from geostatstransforms_jl_spark.functions.geocell import (
    cell_pyramid, morton_cell, morton_parent)

(cpus, path, n, sp, mode, repeat, levels, plan) = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5], int(sys.argv[6]), int(sys.argv[7]), sys.argv[8])
spark = get_spark(app=f"gst-pyramid-{plan}-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=sp)
spark.range(10).count()  # JVM warm
grid = CellGrid.box2d(0.0, 0.0, 1.0, 1.0, 8)

t0 = time.perf_counter()
scan = spark.read.parquet(path)
for _ in range(repeat - 1):  # separate scan nodes: no file-index dedup
    scan = scan.union(spark.read.parquet(path))
scan = scan.withColumn("v", F.shiftrightunsigned("phash", 32))

if plan == "pyramid":
    out = cell_pyramid(
        scan, grid, coords=("x", "y"), levels=levels, sum_cols=("v",),
        distinct_col="phash" if mode == "hll" else None,
    )
else:  # naive: one GROUP BY per zoom level -> one input scan per level
    keyed = scan.withColumn("zkey", morton_cell(grid, F.col("x"), F.col("y")))
    tiers = []
    for lvl in range(levels + 1):
        aggs = [F.count("*").alias("n_rows"), F.sum("v").alias("sum_v")]
        if mode == "hll":
            aggs.append(F.approx_count_distinct("phash").alias("n_distinct"))
        tiers.append(
            keyed.groupBy(morton_parent(F.col("zkey"), lvl).alias("zkey"))
            .agg(*aggs).withColumn("level", F.lit(lvl)))
    out = tiers[0]
    for t in tiers[1:]:
        out = out.unionByName(t)

# force every tier; checksum is plan- and parallelism-invariant in count
# mode (associative re-agg), rows/sum-invariant in hll mode
final = [F.sum("n_rows"), F.count("*"), F.sum("sum_v")]
if mode == "hll":
    final.append(F.sum("n_distinct"))
res = out.agg(*final).first()
sec = time.perf_counter() - t0
assert res[0] == n * repeat * (levels + 1), f"row conservation: {res[0]}"
spark.catalog.clearCache()
spark.stop()
print("PYR_JSON " + json.dumps({
    "plan": plan, "cpus": int(cpus), "sec": round(sec, 2),
    "tier_rows": res[1], "sum_v": res[2],
    "distinct_sum": res[3] if mode == "hll" else None,
    "rows_per_sec": round(n * repeat / sec, 1)}))
"""


def run(plan: str, cpus: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, cpus, FIXTURE,
         str(N), str(SP), MODE, str(REPEAT), str(LEVELS), plan],
        capture_output=True, text=True, cwd=REPO,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("PYR_JSON ")]
    if p.returncode != 0 or not lines:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:] + "\n")
        raise RuntimeError(f"worker {plan} local[{cpus}] failed (rc={p.returncode})")
    return json.loads(lines[0][len("PYR_JSON "):])


def main():
    if not os.path.exists(os.path.join(FIXTURE, "_SUCCESS")):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-c", _cs.GEN % {"repo": REPO}, str(N), FIXTURE, DIST],
            capture_output=True, text=True, cwd=REPO,
        )
        if "GEN_DONE" not in p.stdout:
            sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:] + "\n")
            raise RuntimeError("fixture generation failed")
        print(f"fixture {N} rows in {time.time()-t0:.0f}s", flush=True)
    print(f"fixture {FIXTURE}", flush=True)

    # interleaved matrix: pyramid at both levels (the north-rule pair) and
    # naive at the HIGH level (the plan comparison), fresh JVM per run
    cells = [("pyramid", LOW), ("pyramid", HIGH), ("naive", HIGH)]
    runs = {c: [] for c in cells}
    for rep in range(REPS):
        for c in cells:
            r = run(*c)
            runs[c].append(r)
            print(f"rep {rep} {c[0]} local[{c[1]}]: {r['sec']}s "
                  f"{r['rows_per_sec']} rows/s", flush=True)

    best = {c: min(rs, key=lambda r: r["sec"]) for c, rs in runs.items()}
    # output identity: tier count and sum_v must match across plans,
    # parallelism levels, and reps (count mode adds nothing hll lacks here —
    # both checks are on the associative columns)
    for fld in ("tier_rows", "sum_v"):
        vals = {r[fld] for rs in runs.values() for r in rs}
        assert len(vals) == 1, f"{fld} differs across runs: {vals}"
    ratio = int(HIGH) / int(LOW)
    pyr_lo, pyr_hi = best[("pyramid", LOW)], best[("pyramid", HIGH)]
    naive_hi = best[("naive", HIGH)]
    out = {
        "stage": "cell_pyramid", "rows": N * REPEAT, "levels": LEVELS,
        "shuffle_partitions": SP, "mode": MODE, "repeat": REPEAT, "dist": DIST,
        "low": pyr_lo, "high": pyr_hi, "naive_high": naive_hi,
        "runs": {f"{p}_{c}": [r["sec"] for r in v] for (p, c), v in runs.items()},
        "scaling_efficiency": round(
            pyr_hi["rows_per_sec"] / pyr_lo["rows_per_sec"] / ratio, 3),
        "pyramid_speedup_vs_naive": round(naive_hi["sec"] / pyr_hi["sec"], 2),
    }
    if MODE == "hll":
        out["distinct_sums"] = {
            "pyramid": pyr_hi["distinct_sum"], "naive": naive_hi["distinct_sum"]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
