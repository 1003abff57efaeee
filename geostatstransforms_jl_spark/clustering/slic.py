"""SLIC superpixel clustering (reference: src/clustering/slic.jl:41-204).

Semantics reproduced:
* features standardized first (`StdFeats`, :64);
* initial spacing via the recursive bbox split (:120-143), initial centers =
  unique 1-NN snaps of the lattice points in product order — the product
  iterates the FIRST axis fastest (:145-163), which fixes the label numbering
  the reference's exact-label fixture depends on (test/clustering.jl:3-5);
* Lloyd iterations: each center competes only for points within a ball of
  radius max(s) around it; dₜ = √(dᵥ² + m²·(dₛ/max(s))²); labels/distances
  improve monotonically ACROSS iterations (dists are never reset, :82-98);
* medoid update: new center = cluster member nearest to the coordinate mean
  (:195-204);
* convergence on the relative change of mean(dists) (:86-95) — including the
  reference's Inf/NaN behavior when orphans exist;
* orphans get the label of their nearest assigned point (:100-112).

Spark plan: at reference-like k (tens–hundreds of centers) the centers table
is tiny → broadcast cross join + radius filter for assignment.  That
candidate volume is O(n·k) before the filter, so superpixel-scale k
(~10⁴–10⁶) passes `assign_via_cells=True`: candidates route through the
cell-ring `radius_join` (ball radius = s_max), whose volume is
O(points-per-ball · k) — independent of total k — at the cost of one extra
shuffle on cell keys per Lloyd iteration.  Both paths share the dt formula
term-for-term and the exact squared-radius filter, so labels are identical
(asserted in tests/test_clustering.py).  Each Lloyd iteration is one job
over the points: `min_by(struct(dt, k))` per point merged with the previous
best, then a `groupBy(label)` medoid update.

Center state is a DISTRIBUTED k-row DataFrame ``(k, rid)`` for the whole
run: initial labels come from a `row_number` over first-lattice-occurrence
(one k-row window, single partition by construction — k rows, not n), the
per-iteration center attribute lookup is a broadcast semi-join of that map
against the standardized points, and the medoid refresh is a
`join + coalesce` of two k-row frames.  NOTHING center-shaped is collected
to the driver and no plan carries a k-literal `In` list, so the advertised
superpixel-scale k (10⁴–10⁶) neither bloats the driver nor the query plan
(plan-asserted in tests/test_clustering.py::test_slic_plan_has_no_k_literal_in).
State persists via localCheckpoint to keep the lineage flat across
iterations.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.geotable import GeoTable, GridDomain, PointDomain, grid_centroids
from ..functions.knn import knn_join, radius_join


def slic_spacing(k: int, sides: Sequence[float]):
    """Recursive spacing split (src/clustering/slic.jl:120-143)."""
    l = list(sides)
    d = len(l)
    if d == 1:
        return [l[0] / k]
    j = int(np.argmax(l))
    kj = math.ceil(k ** (1.0 / d))
    sj = l[j] / kj
    kn = math.ceil(k / kj)
    ln = l[:j] + l[j + 1 :]
    s = slic_spacing(kn, ln)
    return s[:j] + [sj] + s[j:]


def _standardize(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    if not cols:
        return df
    stats = df.agg(
        *[F.avg(c).alias(f"m_{c}") for c in cols],
        *[F.stddev_samp(c).alias(f"s_{c}") for c in cols],
    ).first()
    out = df
    for c in cols:
        mu = float(stats[f"m_{c}"])
        sd = float(stats[f"s_{c}"] or 0.0)
        out = out.withColumn(c, (F.col(c) - F.lit(mu)) / F.lit(sd if sd > 0 else 1.0))
    return out


def slic_df(
    df: DataFrame,
    k: int,
    m: float,
    tol: float = 1e-4,
    maxiter: int = 10,
    weights: Optional[dict] = None,
    feature_cols: Optional[Sequence[str]] = None,
    coord_cols=("x", "y"),
    row_id: str = "row_id",
    assign_via_cells: bool = False,
    _plan_probe=None,
) -> DataFrame:
    """Returns (row_id, *coord_cols, label) with labels 1..#centers.

    `assign_via_cells=True` swaps the per-iteration broadcast cross join for
    the cell-ring `radius_join` (ball radius = s_max): label-identical, and
    the candidate volume no longer scales with total center count — the
    large-k path (see the module docstring).

    n-D: `coord_cols` may hold any number of axes — the spacing recursion
    (slic_spacing), lattice enumeration (first axis fastest, matching the
    reference's product order, src/clustering/slic.jl:145-163), spatial
    distance and medoid update are all dimension-generic."""
    spark = df.sparkSession
    coords = list(coord_cols)
    feats = list(
        feature_cols
        if feature_cols is not None
        else [c for c in df.columns if c not in {*coords, row_id}]
    )
    d = _standardize(df.select(row_id, *coords, *feats), feats).persist()

    b = d.agg(
        *[F.min(c).alias(f"lo_{i}") for i, c in enumerate(coords)],
        *[F.max(c).alias(f"hi_{i}") for i, c in enumerate(coords)],
    ).first()
    los = [float(b[f"lo_{i}"]) for i in range(len(coords))]
    his = [float(b[f"hi_{i}"]) for i in range(len(coords))]
    spac = slic_spacing(k, [hi - lo for lo, hi in zip(los, his)])
    s_max = max(spac)

    # lattice points in product order, FIRST axis fastest (:145-163)
    axes = [
        np.arange(lo + s / 2, hi, s) if s > 0 else np.array([lo])
        for lo, hi, s in zip(los, his, spac)
    ]
    lattice = [
        (int(n), *[float(v) for v in reversed(tup)])
        for n, tup in enumerate(itertools.product(*reversed(axes)))
    ]
    lat_schema = "n long, " + ", ".join(f"{c} double" for c in coords)
    lat_df = spark.createDataFrame(lattice, lat_schema)
    snap = knn_join(
        lat_df, d.select(row_id, *coords), k=1,
        t_id="n", s_id=row_id, t_coords=coords, s_coords=coords,
        salt_threshold=None,
    )
    # center k = order of FIRST lattice occurrence of the snapped row
    # (reference's product-order dedup, src/clustering/slic.jl:145-163),
    # computed distributed: min lattice index per row, then a row_number over
    # the ≤k survivors (single k-row window, never n rows).
    cmap = (
        snap.groupBy(F.col(f"s_{row_id}").alias("rid"))
        .agg(F.min("t_n").alias("first_n"))
        .select(
            F.row_number().over(Window.orderBy("first_n")).alias("k"),
            "rid",
        )
        .localCheckpoint()
    )

    wvec = [float((weights or {}).get(c, 1.0)) for c in feats]

    def centers_df(cm: DataFrame) -> DataFrame:
        """(k, kc_*, kf_*) via a broadcast semi-join of the k-row center map
        against the standardized points — no isin literals, no collect."""
        return (
            d.join(F.broadcast(cm), d[row_id] == cm["rid"])
            .select(
                "k",
                *[F.col(c).alias(f"kc_{j}") for j, c in enumerate(coords)],
                *[F.col(c).alias(f"kf_{c}") for c in feats],
            )
        )

    state = d.select(
        row_id, *coords, *feats,
        F.lit(0).alias("label"), F.lit(float("inf")).alias("dist"),
    ).localCheckpoint()

    delta_cur = float("inf")
    for _ in range(maxiter):
        cdf = centers_df(cmap)
        ds2 = F.lit(0.0)
        for j, c in enumerate(coords):
            ds2 = ds2 + (F.col(c) - F.col(f"kc_{j}")) ** 2
        dv2 = F.lit(0.0)
        for c, w in zip(feats, wvec):
            dv2 = dv2 + F.lit(w) * (F.col(c) - F.col(f"kf_{c}")) ** 2
        dt = F.sqrt(dv2 + F.lit(m * m) * ds2 / F.lit(s_max * s_max))
        if assign_via_cells:
            # candidates via the cell-ring ball join: O(points-per-ball · k)
            # instead of the cross join's O(n · k).  radius_join's own filter
            # is sqrt-based; inflate its radius a hair and re-apply the exact
            # squared-radius predicate below so the ball membership — and
            # therefore the labels — are bit-identical to the broadcast path.
            kc_cols = [f"kc_{j}" for j in range(len(coords))]
            kf_cols = [f"kf_{c}" for c in feats]
            rj = radius_join(
                state.select(row_id, *coords, *feats),
                cdf,
                radius=s_max * (1.0 + 1e-9),
                t_id=row_id,
                s_id="k",
                t_coords=coords,
                s_coords=kc_cols,
                t_carry=tuple(feats),
                s_carry=tuple(kf_cols),
                salt_threshold=None,
            )
            cand = rj.select(
                F.col(f"t_{row_id}").alias(row_id),
                *[F.col(f"t_{c}").alias(c) for c in coords],
                *[F.col(f"t_{c}").alias(c) for c in feats],
                F.col("s_k").alias("k"),
                *[F.col(f"s_{c}").alias(c) for c in kc_cols],
                *[F.col(f"s_{c}").alias(c) for c in kf_cols],
            )
        else:
            cand = state.crossJoin(F.broadcast(cdf))
        cand = cand.filter(ds2 <= F.lit(s_max * s_max)).withColumn("dt", dt)
        if _plan_probe is not None:
            _plan_probe(cand)
        best = cand.groupBy(row_id).agg(
            F.min(F.struct(F.col("dt").alias("d"), F.col("k").alias("k"))).alias("b")
        ).select(row_id, F.col("b.d").alias("nd"), F.col("b.k").alias("nk"))
        merged = state.join(best, row_id, "left").select(
            row_id, *coords, *feats,
            F.when(F.col("nd") < F.col("dist"), F.col("nk")).otherwise(F.col("label")).alias("label"),
            F.when(F.col("nd") < F.col("dist"), F.col("nd")).otherwise(F.col("dist")).alias("dist"),
        ).localCheckpoint()
        state = merged

        # medoid update
        means = state.filter(F.col("label") > 0).groupBy("label").agg(
            *[F.avg(c).alias(f"m_{j}") for j, c in enumerate(coords)]
        )
        dm2 = F.lit(0.0)
        for j, c in enumerate(coords):
            dm2 = dm2 + (F.col(c) - F.col(f"m_{j}")) ** 2
        med = (
            state.join(F.broadcast(means), "label")
            .withColumn("dm", F.sqrt(dm2))
            .groupBy("label")
            .agg(F.min(F.struct(F.col("dm"), F.col(row_id).alias("rid"))).alias("b"))
            .select("label", F.col("b.rid").alias("mrid"))
        )
        # labels with no assigned points keep their previous center (the
        # reference's `get(medoid, k, old)` fallback) — a k-row left join,
        # nothing collected.
        cmap = (
            cmap.join(med, cmap["k"] == med["label"], "left")
            .select("k", F.coalesce("mrid", "rid").alias("rid"))
            .localCheckpoint()
        )

        delta_new = state.agg(F.avg("dist")).first()[0]
        if delta_cur not in (0.0,) and delta_new is not None and math.isfinite(delta_new) and math.isfinite(delta_cur):
            if abs(delta_new - delta_cur) / delta_cur < tol:
                break
        delta_cur = delta_new if delta_new is not None else float("inf")

    # orphans → label of nearest assigned point (src/clustering/slic.jl:100-112)
    orphans = state.filter(F.col("label") == 0)
    if not orphans.isEmpty():
        assigned = state.filter(F.col("label") > 0)
        nn = knn_join(
            orphans.select(row_id, *coords),
            assigned.select(row_id, *coords, "label"),
            k=1, t_id=row_id, s_id=row_id, t_coords=coords, s_coords=coords,
            s_carry=("label",), salt_threshold=None,
        ).select(F.col(f"t_{row_id}").alias(row_id), F.col("s_label").alias("label"))
        fixed = orphans.drop("label").join(nn, row_id)
        state = assigned.unionByName(fixed.select(*assigned.columns))

    d.unpersist()
    return state.select(row_id, *coords, "label")


@dataclass
class SLIC:
    k: int
    m: float
    tol: float = 1e-4
    maxiter: int = 10
    weights: Optional[dict] = None
    assign_via_cells: bool = False

    def apply(self, gt: GeoTable):
        if isinstance(gt.domain, GridDomain):
            df = grid_centroids(gt)
            dcols = [c for c in (gt.domain.tile_col, *gt.domain.index_cols) if c]
            df = df.drop(*dcols)
            coord_cols = ("x", "y")
        else:
            assert isinstance(gt.domain, PointDomain)
            df = gt.df
            coord_cols = gt.domain.coord_cols
        out = slic_df(
            df, self.k, self.m, self.tol, self.maxiter, self.weights,
            coord_cols=coord_cols, row_id=gt.row_id,
            assign_via_cells=self.assign_via_cells,
        )
        return GeoTable(out, PointDomain(coord_cols), row_id=gt.row_id), None

    __call__ = apply
