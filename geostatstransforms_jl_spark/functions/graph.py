"""Distributed connected components over an edge list — the union-find
primitive a near-duplicate pipeline needs to collapse similarity CHAINS
(a~b, b~c ⇒ {a,b,c} one group), which the greedy anti-join policy in
``textops.minhash_dedup`` deliberately does not do (reference point:
MLlib's deprecated RDD connectedComponents; GraphFrames implements the
same alternating-star algorithm family on DataFrames).

Algorithm: iterative **min-label propagation with pointer jumping**
(hash-to-min).  Each round every node's label becomes the min over

* its own label,
* its neighbors' labels (both edge directions),
* its label's label (pointer jumping — label paths halve each round).

Pointer jumping is what turns the worst case from O(diameter) rounds into
O(log n): a path of 2^k nodes converges in ~k rounds, not 2^k.  Each
round runs three label equi-joins (one per edge direction + the
pointer-jump self-join), one min hash-aggregate, and the convergence-
count join — every exchange fixed-width (two longs per row), with
``localCheckpoint`` truncating the lineage so the plan does not grow
with iterations — the standard guard for iterative DataFrame
algorithms.  Convergence is detected by a changed-label count (one
scalar action per round, driver receives one long).

At 100-TB dedup scale the edge list is the SMALL side (near-dup pairs are
a sliver of the corpus); rounds are O(log n) and every shuffle carries
(long, long) rows, so the whole thing is cheap next to the signature pass
that produced the edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    id_out: str = "id",
    comp_out: str = "component",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every node appearing in `edges`, where
    ``component`` is the minimum node id in the node's connected
    component — a deterministic canonical representative.

    `edges` is undirected (direction ignored, self-loops and duplicate
    edges harmless).  Nodes must be orderable and hashable — longs in
    every pipeline here.  Raises ``RuntimeError`` after `max_iter`
    non-converged rounds (pointer jumping needs ~log2(n) rounds, so 50
    covers any graph that fits in a cluster).

    The result is materialized (the convergence loop is inherently
    eager); the returned DataFrame is a ``localCheckpoint`` — no lineage
    back to `edges`, safe to reuse without re-running the loop."""
    # persist the raw edges BEFORE the eager node-set checkpoint below: the
    # caller's edge pipeline (e.g. the whole LSH banding/scoring chain) is
    # materialized exactly once, into this cache; every later use — the
    # node set and all per-round joins — reads the cache
    raw = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).persist()
    # node set from the RAW edges: a node whose only edge is a self-loop
    # still appears in the output (as its own component)
    labels = (
        raw.select(F.col("s").alias(id_out))
        .union(raw.select("d"))
        .distinct()
        .withColumn(comp_out, F.col(id_out))
        .localCheckpoint()
    )
    # cache-read + cheap filter per use; no second persist needed
    e = raw.filter(F.col("s") != F.col("d"))
    try:
        for _ in range(max_iter):
            nbr = e.join(
                labels.select(F.col(id_out).alias("s"), F.col(comp_out).alias("_c")),
                "s",
            )
            cands = (
                labels.select(id_out, comp_out)
                # neighbor labels, both directions of each edge
                .union(nbr.select(F.col("d").alias(id_out), F.col("_c").alias(comp_out)))
                .union(
                    e.join(
                        labels.select(
                            F.col(id_out).alias("d"), F.col(comp_out).alias("_c")
                        ),
                        "d",
                    ).select(F.col("s").alias(id_out), F.col("_c").alias(comp_out))
                )
                # pointer jumping: my label's label
                .union(
                    labels.join(
                        labels.select(
                            F.col(id_out).alias(comp_out), F.col(comp_out).alias("_cc")
                        ),
                        comp_out,
                    ).select(id_out, F.col("_cc").alias(comp_out))
                )
            )
            new_labels = (
                cands.groupBy(id_out)
                .agg(F.min(comp_out).alias(comp_out))
                .localCheckpoint()
            )
            changed = (
                new_labels.join(labels.withColumnRenamed(comp_out, "_old"), id_out)
                .filter(F.col(comp_out) != F.col("_old"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "pointer jumping needs ~log2(n); raise max_iter only if the "
            "node count genuinely warrants it"
        )
    finally:
        raw.unpersist()
