"""Training-set assembly for LLM pipelines: deterministic hash-based
dataset splits and concat-and-chunk sequence packing.

Both are pure Catalyst.  ``hash_split`` is a narrow projection (zero
shuffles, reproducible on any cluster size); ``chunk_pack`` is the
GPT-style "concatenate the corpus in a fixed order, slice into
context-length windows" assignment, computed as a distributed prefix sum
with ONE data exchange — not the single-partition global window a naive
``Window.orderBy`` would plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    out: str = "split",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Assign every row to a named split (train/val/test/…) by hashing its id.

    ``bucket = pmod(xxhash64(id, seed), buckets)`` and the ``weights``
    fractions carve ``[0, buckets)`` into contiguous ranges, so membership is
    a pure function of (id, seed): re-runs, re-partitioning, cluster size,
    and row order cannot move a document between splits — the property that
    makes held-out sets trustworthy across pipeline versions (a
    ``sample()``-based split has none of these guarantees).  Zero shuffles;
    whole-stage codegen end to end.

    ``weights`` need not sum to 1 — they are normalized.  Range boundaries
    are rounded once at plan time; with the default 10^6 buckets the realized
    fraction of each split is within 10^-6 of the requested one.
    """
    if not weights:
        raise ValueError("hash_split: weights must name at least one split")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError(f"hash_split: weights must be non-negative and sum > 0, got {weights}")
    if out in df.columns:
        raise ValueError(f"hash_split: output column {out!r} already exists in the input")
    total = float(sum(weights.values()))
    names = list(weights)  # caller's order defines the bucket ranges
    bounds, acc = [], 0.0
    for n in names:
        acc += weights[n] / total
        bounds.append(min(buckets, int(round(acc * buckets))))
    bounds[-1] = buckets  # rounding must not orphan the top bucket

    # seed cast to long → Spark's 8-byte hash path, matching the clean-room
    # XXH64 oracle replay (scripts/sparkhash.py ("long", seed))
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed).cast("long")), F.lit(buckets))
    # fold the names in reverse so the CASE tests ranges low→high
    expr = F.lit(names[-1])
    for n, b in reversed(list(zip(names[:-1], bounds[:-1]))):
        expr = F.when(bucket < F.lit(b), F.lit(n)).otherwise(expr)
    return df.withColumn(out, expr)


def chunk_pack(
    df: DataFrame,
    chunk_size: int,
    tokens_col: str,
    order_col: str = "doc_id",
    shard_size: int = 65536,
    shard_expr=None,
) -> DataFrame:
    """Concat-and-chunk packing: conceptually concatenate every document's
    tokens in ``order_col`` order and slice the stream into fixed
    ``chunk_size`` windows (the standard pretraining sequence-packing
    scheme).  Emits, per document::

        chunk_id     window index where the document STARTS
        chunk_offset token offset of the document within that window
        n_chunks     how many windows the document spans (0 for empty docs)

    Scale shape: the global running token offset is a distributed prefix
    sum, NOT a ``Window.orderBy`` with no partition key (which Catalyst
    plans as a single-partition sort — the whole corpus through one task).
    Documents are sharded by ``order_col`` range (``order_col div
    shard_size`` for the numeric default — contiguous in the global order by
    construction); the in-shard running sum is a windowed aggregate behind
    ONE hash exchange, and the cross-shard offsets come from a
    count/sum-per-shard aggregate — thousands of rows at any corpus size —
    prefix-summed in a bounded single-partition window and broadcast back.
    Total cost: one exchange over the data + one broadcast join, all
    JVM-side.

    ``order_col`` must be numeric and unique (document ids).  For a
    non-numeric order key pass ``shard_expr``: any expression that is
    constant-per-shard and monotone in the key's order (e.g. a date bucket
    for timestamp keys).  ``tokens_col`` must be non-negative; negative
    counts would silently corrupt every later offset, so validate upstream.

    Every input column rides along, THROUGH the exchange.  When only the
    assignment is needed, ``select(order_col, tokens_col)`` first so the
    shuffle ships fixed-width pairs; when the packed payload itself is the
    output, carrying it through this one exchange beats any join-back plan
    (the join would re-shuffle the corpus a second time).
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_pack: chunk_size must be positive, got {chunk_size}")
    if shard_expr is None:
        shard_expr = F.floor(F.col(order_col).cast("long") / F.lit(shard_size))
    toks = F.col(tokens_col).cast("long")

    keyed = df.withColumn("_shard", shard_expr)
    w = (
        Window.partitionBy("_shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = keyed.withColumn("_local_end", F.sum(toks).over(w))

    # per-shard totals: a second, column-pruned pass over the source (scan
    # reads only shard key + tokens), aggregated map-side to one tiny row
    # per shard, then prefix-summed over all PRIOR shards.  The single-
    # partition window here is over #shards rows — bounded by corpus_size /
    # shard_size, not by corpus size
    totals = keyed.groupBy("_shard").agg(F.sum(toks).alias("_tot"))
    # constant partition key: same bounded single-partition evaluation as a
    # bare orderBy window, minus the WindowExec "No Partition Defined"
    # warning that would (wrongly) suggest the DATA path is unpartitioned
    wp = (
        Window.partitionBy(F.lit(0))
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = totals.select(
        "_shard", F.coalesce(F.sum("_tot").over(wp), F.lit(0)).alias("_before")
    )

    start = F.col("_before") + F.col("_local_end") - toks
    return (
        local.join(F.broadcast(prefix), "_shard")
        .withColumn("chunk_id", F.floor(start / chunk_size))
        .withColumn("chunk_offset", start - F.col("chunk_id") * chunk_size)
        .withColumn(
            "n_chunks",
            F.when(toks == 0, F.lit(0).cast("long")).otherwise(
                F.floor((start + toks - 1) / chunk_size) - F.col("chunk_id") + 1
            ),
        )
        .drop("_shard", "_local_end", "_before")
    )
