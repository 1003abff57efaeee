"""Stage-time decomposition of the minhash_dedup pipeline on the
dedup_scaling fixture: where does the per-doc cost actually go?

Stages forced independently (fresh un-persisted lineage each, so a stage's
time is its own cost plus upstream, and deltas isolate each phase):

  shingle   — explode word n-grams + xxhash64 base (no signatures)
  sigs      — + the 64 min-aggregates (the signature pass)
  pairs     — banded buckets -> cap -> self-join -> est >= threshold (from
              persisted sigs, so this measures LSH alone)
  dedup     — full minhash_dedup end-to-end

Usage: python scripts/dedup_profile.py [fixture_dir] [cpus]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from geostatstransforms_jl_spark.core.session import get_spark
from geostatstransforms_jl_spark.textops.dedup import (
    minhash_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    word_ngrams,
)

fixture = sys.argv[1] if len(sys.argv) > 1 else None
cpus = sys.argv[2] if len(sys.argv) > 2 else "4"
if fixture is None:
    scratch = os.path.join(REPO, ".scratch")
    cands = sorted(d for d in os.listdir(scratch) if d.startswith("dedup_docs_"))
    fixture = os.path.join(scratch, cands[-1])

spark = get_spark(app="gst-dedup-profile", master=f"local[{cpus}]",
                  shuffle_partitions=2 * int(cpus))
docs = spark.read.parquet(fixture)
n = docs.count()
print(f"{n} docs, local[{cpus}]", flush=True)


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    sec = time.perf_counter() - t0
    print(f"{label:10s} {sec:8.2f}s  ({n/sec:,.0f} docs/s)  -> {out}", flush=True)
    return sec


# 1. shingle explode + base hash only
ex = docs.select("doc_id", F.explode(word_ngrams(F.col("text"), 3)).alias("sh"))
exb = ex.select("doc_id", F.xxhash64(F.col("sh")).alias("shb"))
t("shingle", lambda: exb.agg(F.sum(F.col("shb").cast("decimal(38,0)"))).first()[0])

# 2. full signature pass (shingle + 64 derived min-aggs)
sigs = minhash_signatures(docs)
t("sigs", lambda: sigs.agg(F.sum(F.element_at("sig", 1).cast("decimal(38,0)"))).first()[0])

# 3. LSH pairs from persisted signatures
sigs_p = minhash_signatures(docs).persist()
sigs_p.count()
pairs = minhash_lsh_pairs(sigs_p, threshold=0.7, max_bucket_size=1000)
t("pairs", lambda: pairs.count())
sigs_p.unpersist()

# 4. end-to-end
t("dedup", lambda: minhash_dedup(docs, threshold=0.7, max_bucket_size=1000).count())

spark.stop()
