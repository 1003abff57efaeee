"""MinHash-LSH dedup scaling evidence (round 5): the text-dedup pipeline —
shingle explode → hash-once/derive-k signatures → banded buckets →
score-before-collapse pairs → anti-join — at two parallelism levels over the
SAME materialized document table, reporting docs/sec at both plus scaling
efficiency.  Same protocol as cells_scaling.py / pip_scaling.py: fresh JVM
per run, interleaved reps, best per level, FIXED shuffle partitioning across
levels so only executor parallelism differs (BENCH/BASELINE.md, round-4
protocol note).

Workload shape (defaults): 150k synthetic prose documents of ~60 words from
a 40k-word Zipf-ish vocabulary, with 2% planted near-duplicates (doc_id
mod 50 == 1: a copy of the previous doc with 3 words resampled —
est-Jaccard ≈ 0.85, above the 0.7 threshold) and 2% planted exact
duplicates (mod 50 == 2).  Deterministic per doc_id via
splitmix64, so both levels (and reruns) see byte-identical input.

Determinism gate: survivor count AND survivor-id checksum must be identical
across levels (asserted) — output invariance across cluster sizes, the same
evidence shape the image pipeline records.

Usage: python scripts/dedup_scaling.py [n_docs] [low] [high] [reps] [shuffle_partitions] [policy]

`policy` (argv[6], default greedy) picks the survivor rule: `greedy` is
minhash_dedup's drop-larger-side anti-join; `cc` is minhash_dedup_cc's
one-survivor-per-component (pointer-jumping connected components over the
same pair graph) — the delta between the two runs is the price of the
O(log n)-round label-propagation loop, everything upstream is identical.
"""

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
LOW = sys.argv[2] if len(sys.argv) > 2 else "1"
HIGH = sys.argv[3] if len(sys.argv) > 3 else "4"
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 2
SP = int(sys.argv[5]) if len(sys.argv) > 5 else 2 * int(HIGH)
POLICY = sys.argv[6] if len(sys.argv) > 6 else "greedy"
assert POLICY in ("greedy", "cc"), POLICY

GEN = """
import sys
sys.path.insert(0, %(repo)r)
import numpy as np
import pandas as pd
from geostatstransforms_jl_spark.core.session import get_spark

n, path = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app="gst-dedup-gen", master="local[16]", shuffle_partitions=16)

WORDS = 60      # words per document
VOCAB = 40_000  # vocabulary size
M64 = np.uint64(0xFFFFFFFFFFFFFFFF)

def _mix(z):
    z = (z * np.uint64(0x9E3779B97F4A7C15)) & M64
    z ^= z >> np.uint64(30); z = (z * np.uint64(0xBF58476D1CE4E5B9)) & M64
    z ^= z >> np.uint64(27); z = (z * np.uint64(0x94D049BB133111EB)) & M64
    z ^= z >> np.uint64(31)
    return z

def gen(batches):
    for pdf in batches:
        ids = pdf["id"].to_numpy().astype(np.uint64)
        # doc_id mod 50 in {1, 2}: near-dup / exact-dup of the PREVIOUS doc ->
        # derive words from the base id so the pair shares its shingles
        mod = ids %% np.uint64(50)
        base = ids - np.where((mod == 1) | (mod == 2), np.uint64(1), np.uint64(0)) \
                   - np.where(mod == 2, np.uint64(1), np.uint64(0))
        pos = np.arange(WORDS, dtype=np.uint64)
        # (n_docs, WORDS) word indices; Zipf-ish skew by squaring a uniform
        h = _mix(base[:, None] * np.uint64(1315423911) + pos[None, :])
        u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        w = (u * u * VOCAB).astype(np.int64)
        # near-dups (mod==1): resample words 7, 23, 41 from the copy's own id
        nd = mod == 1
        if nd.any():
            for p in (7, 23, 41):
                hp = _mix(ids[nd] * np.uint64(2654435761) + np.uint64(p))
                up = (hp >> np.uint64(11)).astype(np.float64) / float(1 << 53)
                w[nd, p] = (up * up * VOCAB).astype(np.int64)
        texts = [" ".join("w%%05d" %% x for x in row) for row in w]
        yield pd.DataFrame({"doc_id": ids.astype("int64"), "text": texts})

(spark.range(n, numPartitions=64)
 .mapInPandas(gen, "doc_id long, text string")
 .write.mode("overwrite").parquet(path))
spark.stop()
print("GEN_DONE")
"""

_TAG = hashlib.sha256(GEN.encode()).hexdigest()[:8]
FIXTURE = os.path.join(REPO, ".scratch", f"dedup_docs_{N}_{_TAG}")

WORKER = """
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from geostatstransforms_jl_spark.core.session import get_spark
from geostatstransforms_jl_spark.textops.dedup import minhash_dedup, minhash_dedup_cc

cpus, path, n, sp = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
policy = sys.argv[5]
spark = get_spark(app=f"gst-dedup-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=sp)
spark.range(10).count()  # JVM warm

docs = spark.read.parquet(path)  # 64 files -> scan parallelism is real here
t0 = time.perf_counter()
fn = minhash_dedup if policy == "greedy" else minhash_dedup_cc
kept = fn(docs, threshold=0.7, max_bucket_size=1000)
res = kept.agg(
    F.count("*").alias("n_kept"),
    F.sum(F.xxhash64(F.col("doc_id").cast("string"))
          .cast("decimal(38,0)")).alias("chk"),
).first()
sec = time.perf_counter() - t0
spark.stop()
print("DEDUP_JSON " + json.dumps({
    "cpus": int(cpus), "sec": round(sec, 2), "kept": res["n_kept"],
    "checksum": int(res["chk"]),
    "docs_per_sec": round(n / sec, 1)}))
"""


def run_level(cpus: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO},
         cpus, FIXTURE, str(N), str(SP), POLICY],
        capture_output=True, text=True, cwd=REPO,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("DEDUP_JSON ")]
    if p.returncode != 0 or not lines:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:] + "\n")
        raise RuntimeError(f"worker local[{cpus}] failed (rc={p.returncode})")
    return json.loads(lines[0][len("DEDUP_JSON "):])


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
        print(f"fixture {N} docs in {time.time()-t0:.0f}s", flush=True)
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
                  f"{r['docs_per_sec']} docs/s kept={r['kept']}", flush=True)
    best = {lvl: max(rs, key=lambda r: r["docs_per_sec"]) for lvl, rs in runs.items()}
    for fld in ("kept", "checksum"):
        vals = {r[fld] for rs in runs.values() for r in rs}
        assert len(vals) == 1, f"{fld} differs across levels: {vals}"
    ratio = int(HIGH) / int(LOW)
    eff = best[HIGH]["docs_per_sec"] / best[LOW]["docs_per_sec"] / ratio
    out = {
        "stage": f"minhash_dedup_{POLICY}", "docs": N,
        "shuffle_partitions": SP,
        "low": best[LOW], "high": best[HIGH],
        "runs": {k: [r["sec"] for r in v] for k, v in runs.items()},
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
