#!/usr/bin/env python
"""Benchmark harness.

Default mode (what the driver runs): executes the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "rows_per_sec": ...}

``--scaling`` mode evidences the north rule's two-cluster-size criterion in
this single-node sandbox: the same job runs at two parallelism levels
(local[8] vs local[32]) in fresh subprocesses, and the throughputs plus
scaling efficiency are printed and appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline queries: dedup (hash agg), spatial 1-NN join, tile assignment
HEADLINE = ["uniquecoords", "knn_transfer", "knn_aggregate", "upscale", "downscale", "aggregate_median"]


def run_bench(cpus: str = CPUS, sf_dir: str = SF_DIR, queries=None) -> dict:
    from geostatstransforms_jl_spark.core.session import get_spark
    import __spark_entry__ as E

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    spark = get_spark(app=f"gst-bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    qmap = E.queries()
    names = [q for q in (queries or HEADLINE) if q in qmap]
    # input size for the throughput metric: rows feeding the spatial-join stage
    n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # warm the JVM + parquet footers once so per-query timings measure the plan
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()

    per_q = {}
    t_all = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        df = qmap[name](spark, sf_dir)
        n = df.count()
        per_q[name] = round(time.perf_counter() - t0, 3)
        assert n > 0, f"{name} returned 0 rows"
    total = round(time.perf_counter() - t_all, 3)
    spark.stop()
    return {
        "metric": "spatial-join+tile-assignment headline suite",
        "value": total,
        "unit": "sec",
        "queries": per_q,
        "sf": sf_dir,
        "cpus": int(cpus),
        "lineitem_rows": n_li,
        "rows_per_sec": round(n_li * len(names) / total, 1),
    }


def run_scaling(low: str = "8", high: str = "32", sf_dir: str = SF_DIR) -> dict:
    """Same job at two parallelism levels in fresh subprocesses (fresh JVMs so
    neither run reuses the other's executors/caches)."""
    out = {}
    for cpus in (low, high):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=sf_dir)
        r = subprocess.run(
            [sys.executable, __file__, "--inner"], env=env, capture_output=True, text=True
        )
        line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
        out[cpus] = json.loads(line)
    tl, th = out[low]["rows_per_sec"], out[high]["rows_per_sec"]
    ratio = int(high) / int(low)
    eff = (th / tl) / ratio
    return {
        "metric": "scaling efficiency (local[%s] -> local[%s])" % (low, high),
        "value": round(eff, 3),
        "unit": "efficiency",
        "throughput_low": tl,
        "throughput_high": th,
        "detail": out,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        res = run_scaling()
        print(json.dumps(res))
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(
                f"\n| scaling local[8]→local[32] | eff={res['value']} | "
                f"{res['throughput_low']} → {res['throughput_high']} rows/s | {SF_DIR} |\n"
            )
    else:
        print(json.dumps(run_bench()))
