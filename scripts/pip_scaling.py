"""Point-in-polygon join scaling evidence (north rule, round 5): pip_join
with the SHUFFLE route genuinely forced — the polygon side's exploded
bbox-cell volume exceeds the broadcast threshold, so the auto decision
(`operators/spatialjoin.py:pip_join`) takes the shuffle_hash path — at two
parallelism levels over the SAME materialized point table, reporting
points/sec at both plus scaling efficiency.  Same protocol as
cells_scaling.py: fresh JVM per run, interleaved reps, best per level,
FIXED shuffle partitioning across levels so only executor parallelism
differs (BENCH/BASELINE.md, round-4 protocol note).

Workload shape (defaults): 12M uniform points x 20k diamond polygons
(4 non-horizontal edges each, radius 0.008) on a 1024x1024 cell grid —
exploded gcells ~= 20k x ~300 covered cells ~= 6M rows > the 2M broadcast
threshold, so the cell equi-join AND the edge join both run as
ShuffledHashJoin (asserted from the executed plan, not assumed).
Candidate volume ~= 61M pairs, ~246M edge-crossing tests, ~31M containment
pairs out — a real shuffle-route job, not a broadcast in disguise.

Determinism: points via splitmix64 on row id, polygons via PCG64(9172);
both levels must produce the identical pair count AND pair checksum
(asserted), evidencing output invariance across cluster sizes.

Usage: python scripts/pip_scaling.py [n_points] [n_polys] [low] [high] [reps] [shuffle_partitions]
"""

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
LOW = sys.argv[3] if len(sys.argv) > 3 else "1"
HIGH = sys.argv[4] if len(sys.argv) > 4 else "4"
REPS = int(sys.argv[5]) if len(sys.argv) > 5 else 2
SP = int(sys.argv[6]) if len(sys.argv) > 6 else 2 * int(HIGH)

GEN = """
import sys
sys.path.insert(0, %(repo)r)
import numpy as np
import pandas as pd
from geostatstransforms_jl_spark.core.session import get_spark

n, path = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app="gst-pip-gen", master="local[16]", shuffle_partitions=16)

def _u(ids, salt):
    z = (ids + np.uint64(salt)) * np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30); z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27); z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)

def gen(batches):
    for pdf in batches:
        ids = pdf["id"].to_numpy().astype(np.uint64)
        yield pd.DataFrame({
            "row_id": ids.astype("int64"),
            "x": _u(ids, 1), "y": _u(ids, 2),
        })

(spark.range(n, numPartitions=64)
 .mapInPandas(gen, "row_id long, x double, y double")
 .write.mode("overwrite").parquet(path))
spark.stop()
print("GEN_DONE")
"""

_TAG = hashlib.sha256(GEN.encode()).hexdigest()[:8]
FIXTURE = os.path.join(REPO, ".scratch", f"pip_points_{N}_{_TAG}")

WORKER = """
import json, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
from pyspark.sql import functions as F
from geostatstransforms_jl_spark.core.session import get_spark
from geostatstransforms_jl_spark.core.grid import GridMeta
from geostatstransforms_jl_spark.operators.spatialjoin import pip_join

cpus, path, n, m, sp = (sys.argv[1], sys.argv[2], int(sys.argv[3]),
                        int(sys.argv[4]), int(sys.argv[5]))
spark = get_spark(app=f"gst-pip-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=sp)
spark.range(10).count()  # JVM warm

# diamond polygons: centers uniform in [0.1, 0.9]^2, radius 0.008 — 4
# non-horizontal edges, bbox covers ~300 cells on the 1024-grid below
rng = np.random.Generator(np.random.PCG64(9172))
cx, cy = rng.uniform(0.1, 0.9, m), rng.uniform(0.1, 0.9, m)
r = 0.008
polys = spark.createDataFrame(
    [(int(i),
      [[(float(cx[i] + r), float(cy[i])), (float(cx[i]), float(cy[i] + r)),
        (float(cx[i] - r), float(cy[i])), (float(cx[i]), float(cy[i] - r))]])
     for i in range(m)],
    "geom_id long, rings array<array<struct<x double, y double>>>",
)

meta = GridMeta(1024, 1024, 0.0, 0.0, 1.0 / 1024, 1.0 / 1024)
pts = spark.read.parquet(path)
t0 = time.perf_counter()
pairs = pip_join(pts, polys, meta, point_id="row_id")
res = pairs.agg(
    F.count("*").alias("n_pairs"),
    F.sum(F.xxhash64(F.concat_ws(":", "row_id", "geom_id"))
          .cast("decimal(38,0)")).alias("chk"),
).first()
sec = time.perf_counter() - t0
plan = pairs._jdf.queryExecution().executedPlan().toString()
assert "ShuffledHashJoin" in plan, "expected the forced shuffle route"
assert "BroadcastHashJoin" not in plan, "broadcast leaked into the forced-shuffle run"
spark.stop()
print("PIP_JSON " + json.dumps({
    "cpus": int(cpus), "sec": round(sec, 2), "pairs": res["n_pairs"],
    "checksum": int(res["chk"]),
    "points_per_sec": round(n / sec, 1)}))
"""


def run_level(cpus: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO},
         cpus, FIXTURE, str(N), str(M), str(SP)],
        capture_output=True, text=True, cwd=REPO,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("PIP_JSON ")]
    if p.returncode != 0 or not lines:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:] + "\n")
        raise RuntimeError(f"worker local[{cpus}] failed (rc={p.returncode})")
    return json.loads(lines[0][len("PIP_JSON "):])


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
                  f"{r['points_per_sec']} points/s {r['pairs']} pairs", flush=True)
    best = {lvl: max(rs, key=lambda r: r["points_per_sec"]) for lvl, rs in runs.items()}
    for fld in ("pairs", "checksum"):
        vals = {r[fld] for rs in runs.values() for r in rs}
        assert len(vals) == 1, f"{fld} differs across levels: {vals}"
    ratio = int(HIGH) / int(LOW)
    eff = best[HIGH]["points_per_sec"] / best[LOW]["points_per_sec"] / ratio
    out = {
        "stage": "pip_join_shuffle_route", "points": N, "polygons": M,
        "shuffle_partitions": SP,
        "low": best[LOW], "high": best[HIGH],
        "runs": {k: [r["sec"] for r in v] for k, v in runs.items()},
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
