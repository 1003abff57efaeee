"""Approximate / exact nearest-neighbor search over embedding columns.

* `cosine_topk`    — exact brute-force baseline: broadcast queries × corpus,
  dot products via `zip_with`/`aggregate` higher-order functions (JVM-side),
  per-query `row_number ≤ k`.  O(|Q|·|C|) but the corpus side streams — the
  correct baseline when |Q| is small.
* `lsh_topk`       — the scale path: random-hyperplane LSH buckets (seeded
  hyperplanes, signs computed in one Arrow-batched numpy matmul), candidates
  from multi-table bucket equi-joins, exact cosine re-ranking on candidates
  only.  Recall tunable via (n_tables, n_bits).
* `ivf_topk`       — IVF variant: k-means coarse centroids (driver-trained on
  a bounded sample), each vector assigned to nearest centroid; queries probe
  the `nprobe` nearest centroids' inverted lists.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cluster_numlib import kmeans


def _norm_col(vec: str):
    return F.sqrt(F.aggregate(F.col(vec), F.lit(0.0), lambda a, x: a + x * x))


def _dot(a: str, b: str):
    return F.aggregate(F.zip_with(F.col(a), F.col(b), lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """(q_id, c_id, cosine, rank) — exact top-k by cosine, ties broken by
    corpus id (deterministic)."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
        .withColumn("qn", _norm_col("qv"))
    )
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv")).withColumn(
        "cn", _norm_col("cv")
    )
    pairs = c.crossJoin(q)
    if exclude_self:
        pairs = pairs.filter(F.col("q_id") != F.col("c_id"))
    cos = _dot("qv", "cv") / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("c_id"))
    return (
        pairs.withColumn("cosine", cos)
        .select("q_id", "c_id", "cosine")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_block: int = 2048,
    n_blocks: Optional[int] = None,
) -> DataFrame:
    """(a, b, cosine) for every unordered pair with cosine ≥ threshold —
    the embedding-cosine near-duplicate primitive.  EXACT, but blocked:

    A naive `join(a < b)` plans as a BroadcastNestedLoopJoin — a single
    unsplittable O(n²) task.  Instead every vector hashes to one of B blocks
    and explodes to the B unordered block-pairs it participates in; one
    `groupBy(ba, bb).applyInPandas` computes each block-pair's full cosine
    submatrix with one float64 GEMM and keeps pairs ≥ threshold (a < b).
    Exact coverage (pair (u,v) appears in exactly group
    (min(blk_u,blk_v), max(...))), B(B+1)/2 evenly-sized tasks, shuffle
    volume n·B = O(n^1.5) — the standard exact all-pairs layout.  No join in
    the plan at all.  For true 100-TB scale exact all-pairs is inherently
    O(n²) compute; the approximate path is `cosine_pairs_lsh`.
    """
    if n_blocks is None:
        n = df.count()
        n_blocks = max(1, -(-n // max(1, rows_per_block)))
    B = int(n_blocks)
    t = float(threshold)

    v = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).withColumn("_blk", F.pmod(F.xxhash64("_id"), F.lit(B)).cast("int"))
    pairs = v.select(
        "_id",
        "_v",
        "_blk",
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("_other"),
    ).select(
        "_id",
        "_v",
        "_blk",
        F.least("_blk", "_other").alias("_ba"),
        F.greatest("_blk", "_other").alias("_bb"),
    )

    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "cosine": pd.Series(dtype="float64")})

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ba, bb = key
        a_side = pdf[pdf["_blk"] == ba]
        if len(a_side) == 0 or (ba != bb and (pdf["_blk"] == bb).sum() == 0):
            return empty
        ids_a = a_side["_id"].to_numpy()
        A = np.stack(a_side["_v"].to_numpy()).astype(np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        if ba == bb:
            C = A @ A.T
            iu, ju = np.triu_indices(len(ids_a), k=1)
            cos = C[iu, ju]
            aa, bb_ = ids_a[iu], ids_a[ju]
        else:
            b_side = pdf[pdf["_blk"] == bb]
            ids_b = b_side["_id"].to_numpy()
            Bm = np.stack(b_side["_v"].to_numpy()).astype(np.float64)
            Bm /= np.linalg.norm(Bm, axis=1, keepdims=True)
            C = A @ Bm.T
            ii, jj = np.nonzero(C >= t)
            cos = C[ii, jj]
            aa, bb_ = ids_a[ii], ids_b[jj]
        keep = cos >= t
        aa, bb_, cos = aa[keep], bb_[keep], cos[keep]
        lo = np.minimum(aa, bb_)
        hi = np.maximum(aa, bb_)
        return pd.DataFrame({"a": lo, "b": hi, "cosine": cos})

    return (
        pairs.groupBy("_ba", "_bb")
        .applyInPandas(run, "a long, b long, cosine double")
    )


def cosine_pairs_lsh(
    df: DataFrame,
    threshold: float,
    dim: int,
    n_tables: int = 12,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate near-dup pairs: random-hyperplane LSH bucket self-join for
    candidates, exact cosine verify.  Recall < 1 by construction — a pair at
    cosine t collides per table with prob (1 − θ/π)^n_bits, θ = arccos(t);
    size (n_tables, n_bits) for the target threshold (low thresholds need few
    bits / many tables).  The exact `cosine_pairs` is the oracle-verified
    baseline; this is the 100-TB path where O(n^1.5) shuffle is too much."""
    # Bucket rows carry (id, table, bucket) ONLY — never the dim-float
    # vector: carrying it multiplies the bucket self-join exchange by
    # n_tables x dim x 4 bytes per vector.  Candidate id-pairs collapse
    # first (fixed-width 16-byte distinct, HashAggregate — no var-width
    # first() buffers, so no SortAggregate fallback), then the vectors join
    # back by id for ONE exact-cosine verification per pair; AQE broadcasts
    # the candidate side when it fits.  Same restructure as
    # minhash_lsh_pairs (textops/dedup.py), measured ~2.2x there.
    b = with_lsh_buckets(
        df, dim, n_tables, n_bits, id_col, vec_col, seed, include_vec=False
    )
    cand = (
        b.select(F.col(id_col).alias("a"), "table", "bucket")
        .join(b.select(F.col(id_col).alias("b"), "table", "bucket"), ["table", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    vecs = df.select(id_col, vec_col)
    j = cand.join(
        vecs.select(F.col(id_col).alias("a"), F.col(vec_col).alias("av")), "a"
    ).join(vecs.select(F.col(id_col).alias("b"), F.col(vec_col).alias("bv")), "b")
    cos = _dot("av", "bv") / (_norm_col("av") * _norm_col("bv"))
    return (
        j.withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("a", "b", "cosine")
    )


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def with_lsh_buckets(
    df: DataFrame, dim: int, n_tables: int = 8, n_bits: int = 12,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7,
    include_vec: bool = True,
) -> DataFrame:
    """(id[, embedding], table, bucket) — one row per hash table.

    ``include_vec=False`` keeps the vector out of the OUTPUT SCHEMA (not
    just a dropped column): mapInPandas output is opaque to Catalyst's
    column pruning, so a dropped-after vector would still cross the
    Arrow boundary n_tables times per input row."""
    H = _hyperplanes(dim, n_tables, n_bits, seed)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            V = np.stack(pdf[vec_col].to_numpy())
            rows = []
            for t in range(n_tables):
                signs = (V @ H[t].T) > 0  # (n, n_bits)
                buckets = (signs * (1 << np.arange(n_bits))).sum(axis=1)
                cols = {id_col: pdf[id_col]}
                if include_vec:
                    cols[vec_col] = pdf[vec_col]
                cols["table"] = t
                cols["bucket"] = buckets.astype(np.int64)
                rows.append(pd.DataFrame(cols))
            yield pd.concat(rows, ignore_index=True)

    vec_field = f" {vec_col} array<float>," if include_vec else ""
    schema = f"{id_col} long,{vec_field} table int, bucket long"
    return df.select(id_col, vec_col).mapInPandas(run, schema)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    n_tables: int = 8,
    n_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: bucket equi-join candidates + exact re-rank."""
    # vec-free bucket rows; table-duplicate collapse on bare (q_id, c_id)
    # — a fixed-width HashAggregate — then ONE vector join-back per side
    # for the exact re-rank (same no-carry restructure as cosine_pairs_lsh:
    # carrying cv through the bucket join ships the corpus vector n_tables
    # times, the join-back ships it once and AQE broadcasts the small
    # candidate/query sides)
    qb = with_lsh_buckets(
        queries, dim, n_tables, n_bits, id_col, vec_col, seed, include_vec=False
    ).select(F.col(id_col).alias("q_id"), "table", "bucket")
    cb = with_lsh_buckets(
        corpus, dim, n_tables, n_bits, id_col, vec_col, seed, include_vec=False
    ).select(F.col(id_col).alias("c_id"), "table", "bucket")
    cand = qb.join(cb, ["table", "bucket"])
    if exclude_self:
        cand = cand.filter(F.col("q_id") != F.col("c_id"))
    cand = cand.select("q_id", "c_id").distinct()
    j = cand.join(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")), "q_id"
    ).join(corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv")), "c_id")
    cos = _dot("qv", "cv") / (_norm_col("qv") * _norm_col("cv"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("c_id"))
    return (
        j.withColumn("cosine", cos)
        .select("q_id", "c_id", "cosine")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    train_sample: int = 2000,
    seed: int = 7,
) -> DataFrame:
    """IVF: coarse k-means on a bounded sample (driver), inverted lists by
    nearest centroid, queries probe nprobe lists, exact re-rank inside."""
    # deterministic unbiased sample: order by seeded hash, take n — NOT
    # limit(n), which takes the first rows in partition order and trains
    # centroids on whatever file happened to be scanned first.
    samp = (
        corpus.select(
            vec_col, F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h")
        )
        .orderBy("_h")
        .limit(train_sample)
        .drop("_h")
        .toPandas()
    )
    X = np.stack(samp[vec_col].to_numpy()).astype(float)
    _, C = kmeans(X, n_centroids, maxiter=20, seed=seed)

    def assign(nlists: int):
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                V = np.stack(pdf[vec_col].to_numpy()).astype(float)
                d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(-1)
                idx = np.argsort(d2, axis=1)[:, :nlists]
                out = []
                for r in range(nlists):
                    out.append(
                        pd.DataFrame(
                            {id_col: pdf[id_col], vec_col: pdf[vec_col], "list_id": idx[:, r].astype(np.int32)}
                        )
                    )
                yield pd.concat(out, ignore_index=True)

        return run

    schema = f"{id_col} long, {vec_col} array<float>, list_id int"
    cl = corpus.select(id_col, vec_col).mapInPandas(assign(1), schema).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"), "list_id"
    )
    ql = queries.select(id_col, vec_col).mapInPandas(assign(nprobe), schema).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"), "list_id"
    )
    cand = ql.join(cl, "list_id")
    if exclude_self:
        cand = cand.filter(F.col("q_id") != F.col("c_id"))
    cos = _dot("qv", "cv") / (_norm_col("qv") * _norm_col("cv"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("c_id"))
    # each corpus vector lives in exactly one list (assign(1)), so a (q, c)
    # pair occurs at most once per probe set and the collapse is defensive;
    # run it on the scored 24-byte projection (fixed-width HashAggregate)
    # rather than dropDuplicates carrying the two vectors through a
    # SortAggregate (same plan reasoning as ann_lsh_topk above)
    return (
        cand.withColumn("cosine", cos)
        .select("q_id", "c_id", "cosine")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
