"""chunk_pack scaling evidence (round 5): the concat-and-chunk sequence
packing assignment — parquet scan → range shards → in-shard windowed prefix
sum → broadcast cross-shard offsets → chunk arithmetic — at two parallelism
levels over the SAME materialized corpus table, reporting docs/sec at both
plus efficiency.  Same protocol as the cells/dedup/pyramid scaling runs
(fresh JVM per run, interleaved reps, best per level; local[1] vs local[4]
is this host's honest N -> 4N pair, BENCH/README.md).

The fixture is (doc_id, n_toks, src) — the two columns the packing job
actually reads plus one payload column so parquet column pruning is part of
the measured path (a real corpus scan projects id+token-count out of a wide
document table).  Token counts are deterministic splitmix-style uniforms in
[0, 997), dense ids, so shard occupancy is balanced by construction — the
operator's contract (shard_size over dense numeric ids).

Shuffle partitioning is FIXED across both levels (default 2x the high
level, argv[5]) so both legs run the identical physical plan and only
executor parallelism differs — see cells_scaling.py for why tying
partitions to cores makes the low leg spill and the reading super-linear.

The consuming aggregate folds every output column (sum/max of chunk_id,
sum of n_chunks and chunk_offset, count) so nothing is dead code, and the
checksums double as the north rule's output-identity assertion: the packing
assignment must be byte-identical across parallelism levels.

`route` (argv[8]) picks the implementation:
  generic  one-exchange distributed prefix sum (any layout) — sort+shuffle
           heavy, so size shuffle_partitions to memory (the 400M sp=16
           reading shows the spill penalty of oversized sort partitions)
  sorted   zero-shuffle chunk_pack_sorted over the fixture's id-clustered
           file layout (spark.range writes contiguous id ranges per file)
           — the 100-TB route when the table layout qualifies
  tokenize the end-to-end pipeline shape: scan a TEXT corpus fixture
           (~190-char synthetic docs), whitespace-tokenize in Catalyst
           (the gate query's exact formulation), then the generic pack —
           the skeleton-only routes above are the worst case (zero ALU
           per byte); this is what a real packing job spends its time on

Usage: python scripts/packing_scaling.py [n_rows] [low] [high] [reps] [shuffle_partitions] [chunk_size] [shard_size] [route]
"""

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
LOW = sys.argv[2] if len(sys.argv) > 2 else "1"
HIGH = sys.argv[3] if len(sys.argv) > 3 else "4"
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 2
SP = int(sys.argv[5]) if len(sys.argv) > 5 else 2 * int(HIGH)
CHUNK = int(sys.argv[6]) if len(sys.argv) > 6 else 2048
SHARD = int(sys.argv[7]) if len(sys.argv) > 7 else 65536
ROUTE = sys.argv[8] if len(sys.argv) > 8 else "generic"
assert ROUTE in ("generic", "sorted", "tokenize"), ROUTE

GEN = """
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from geostatstransforms_jl_spark.core.session import get_spark

n, path = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app="gst-pack-gen", master="local[16]", shuffle_partitions=16)
(spark.range(n, numPartitions=64)
 .select(F.col("id").alias("doc_id"),
         F.pmod(F.xxhash64("id"), F.lit(997)).alias("n_toks"),
         F.pmod(F.xxhash64("id", F.lit(1).cast("long")), F.lit(31)).alias("src"))
 .write.mode("overwrite").parquet(path))
spark.stop()
print("GEN_DONE")
"""

TEXTGEN = """
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from geostatstransforms_jl_spark.core.session import get_spark

n, path = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app="gst-packtext-gen", master="local[16]",
                  shuffle_partitions=16)
# ~190-char synthetic docs: 12-61 words drawn from a 4096-word vocabulary by
# per-(doc, position) hash — deterministic, realistic token-count spread
words = F.transform(
    F.sequence(F.lit(1), (F.pmod(F.xxhash64("id"), F.lit(50)) + 12).cast("int")),
    lambda i: F.concat(
        F.lit("w"),
        F.pmod(F.xxhash64("id", i.cast("long")), F.lit(4096)).cast("string"),
    ),
)
(spark.range(n, numPartitions=64)
 .select(F.col("id").alias("doc_id"),
         F.concat_ws(" ", words).alias("text"),
         F.pmod(F.xxhash64("id", F.lit(2).cast("long")), F.lit(31)).alias("src"))
 .write.mode("overwrite").parquet(path))
spark.stop()
print("GEN_DONE")
"""

# content tag covers the synthesis code only (the GEN blocks): the operator
# under test is deliberately NOT part of the fixture identity — editing
# packing.py must not regenerate multi-GB fixtures that don't depend on it
if ROUTE == "tokenize":
    _TAG = hashlib.sha256(TEXTGEN.encode()).hexdigest()[:8]
    FIXTURE = os.path.join(REPO, ".scratch", f"packtext_{N}_{_TAG}")
    GEN = TEXTGEN
else:
    _TAG = hashlib.sha256(GEN.encode()).hexdigest()[:8]
    FIXTURE = os.path.join(REPO, ".scratch", f"packdocs_{N}_{_TAG}")

WORKER = """
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from geostatstransforms_jl_spark.core.session import get_spark
from geostatstransforms_jl_spark.textops import chunk_pack

cpus, path, n, sp, chunk, shard, route = (sys.argv[1], sys.argv[2],
                                          int(sys.argv[3]), int(sys.argv[4]),
                                          int(sys.argv[5]), int(sys.argv[6]),
                                          sys.argv[7])
spark = get_spark(app=f"gst-pack-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=sp)
spark.range(10).count()  # JVM warm
t0 = time.perf_counter()
if route == "tokenize":
    # end-to-end: tokenize THEN pack (the gate query's formulation)
    src = spark.read.parquet(path).select(
        "doc_id",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).cast("long").alias("n_toks"),
    )
else:
    src = spark.read.parquet(path).select("doc_id", "n_toks")
if route == "sorted":
    from geostatstransforms_jl_spark.textops import chunk_pack_sorted
    packed = chunk_pack_sorted(src, chunk, "n_toks")
else:
    packed = chunk_pack(src, chunk, "n_toks", shard_size=shard)
res = (packed
       .agg(F.count("*"), F.sum("chunk_id"), F.max("chunk_id"),
            F.sum("chunk_offset"), F.sum("n_chunks"))
       .first())
sec = time.perf_counter() - t0
assert res[0] == n, f"row conservation: {res[0]} != {n}"
spark.stop()
print("PACK_JSON " + json.dumps({
    "cpus": int(cpus), "sec": round(sec, 2),
    "sum_chunk_id": res[1], "max_chunk_id": res[2],
    "sum_offset": res[3], "sum_n_chunks": res[4],
    "docs_per_sec": round(n / sec, 1)}))
"""


def run_level(cpus: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO},
         cpus, FIXTURE, str(N), str(SP), str(CHUNK), str(SHARD), ROUTE],
        capture_output=True, text=True, cwd=REPO,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("PACK_JSON ")]
    if p.returncode != 0 or not lines:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:] + "\n")
        raise RuntimeError(f"worker local[{cpus}] failed (rc={p.returncode})")
    return json.loads(lines[0][len("PACK_JSON "):])


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
                  f"{r['docs_per_sec']} docs/s", flush=True)
    best = {lvl: max(rs, key=lambda r: r["docs_per_sec"]) for lvl, rs in runs.items()}
    # north-rule output identity: the packing assignment (all four checksums)
    # must not depend on the executor count
    for fld in ("sum_chunk_id", "max_chunk_id", "sum_offset", "sum_n_chunks"):
        vals = {r[fld] for rs in runs.values() for r in rs}
        assert len(vals) == 1, f"{fld} differs across levels: {vals}"
    ratio = int(HIGH) / int(LOW)
    eff = best[HIGH]["docs_per_sec"] / best[LOW]["docs_per_sec"] / ratio
    out = {
        "stage": "chunk_pack", "route": ROUTE, "rows": N,
        "shuffle_partitions": SP,
        "chunk_size": CHUNK, "shard_size": SHARD,
        "low": best[LOW], "high": best[HIGH],
        "runs": {k: [r["sec"] for r in v] for k, v in runs.items()},
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
