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
) -> DataFrame:
    """(a, b, cosine) for every unordered pair with cosine ≥ threshold —
    the embedding-cosine near-duplicate primitive.  Exact O(n²/2) self-join
    with dot products JVM-side (`zip_with`/`aggregate`); pair space halved by
    the a<b predicate so no post-hoc dedup.  At scale, gate the candidate set
    with `with_lsh_buckets` first and feed the bucket-joined pairs here."""
    lhs = df.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("av")
    ).withColumn("an", _norm_col("av"))
    rhs = df.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("bv")
    ).withColumn("bn", _norm_col("bv"))
    cos = _dot("av", "bv") / (F.col("an") * F.col("bn"))
    return (
        lhs.join(rhs, F.col("a") < F.col("b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("a", "b", "cosine")
    )


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def with_lsh_buckets(
    df: DataFrame, dim: int, n_tables: int = 8, n_bits: int = 12,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7,
) -> DataFrame:
    """(id, embedding, table, bucket) — one row per hash table."""
    H = _hyperplanes(dim, n_tables, n_bits, seed)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            V = np.stack(pdf[vec_col].to_numpy())
            rows = []
            for t in range(n_tables):
                signs = (V @ H[t].T) > 0  # (n, n_bits)
                buckets = (signs * (1 << np.arange(n_bits))).sum(axis=1)
                rows.append(
                    pd.DataFrame(
                        {
                            id_col: pdf[id_col],
                            vec_col: pdf[vec_col],
                            "table": t,
                            "bucket": buckets.astype(np.int64),
                        }
                    )
                )
            yield pd.concat(rows, ignore_index=True)

    schema = f"{id_col} long, {vec_col} array<float>, table int, bucket long"
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
    qb = with_lsh_buckets(queries, dim, n_tables, n_bits, id_col, vec_col, seed).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"), "table", "bucket"
    )
    cb = with_lsh_buckets(corpus, dim, n_tables, n_bits, id_col, vec_col, seed).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"), "table", "bucket"
    )
    cand = qb.join(cb, ["table", "bucket"]).dropDuplicates(["q_id", "c_id"])
    if exclude_self:
        cand = cand.filter(F.col("q_id") != F.col("c_id"))
    cos = _dot("qv", "cv") / (_norm_col("qv") * _norm_col("cv"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("c_id"))
    return (
        cand.withColumn("cosine", cos)
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
    samp = corpus.select(vec_col).limit(train_sample).toPandas()
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
    cand = ql.join(cl, "list_id").dropDuplicates(["q_id", "c_id"])
    if exclude_self:
        cand = cand.filter(F.col("q_id") != F.col("c_id"))
    cos = _dot("qv", "cv") / (_norm_col("qv") * _norm_col("cv"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("c_id"))
    return (
        cand.withColumn("cosine", cos)
        .select("q_id", "c_id", "cosine")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
