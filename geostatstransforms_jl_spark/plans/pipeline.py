"""Pipeline — the engine's analogue of the reference's transform composition.

The reference pipes geotables through transforms (`gtb |> Potrace(..) |>
Filter(..)`, src/rasterize.jl:129), threading (geotable, cache) pairs so the
chain is revertible (src/detrend.jl:42-93).  Here:

* without a lineage store the stages compose LAZILY — one Catalyst plan for
  the whole pipeline, so filters/projections written in later stages push
  down through earlier ones;
* with a `LineageStore`, each stage's output commits as a validated snapshot
  (core/lineage.py) and `run(resume=True)` replays the plan skipping every
  stage whose snapshot validates — the kill/resume contract;
* caches from revertible stages stack, and `revert()` unwinds them in
  reverse, mirroring apply/revert.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple, Union

from pyspark.sql import DataFrame

from ..core.geotable import GeoTable
from ..core.lineage import LineageStore

Stage = object  # anything with .apply(gt) -> (gt, cache); or df->df callable


@dataclass
class Pipeline:
    stages: List[Stage]
    store: Optional[LineageStore] = None
    metrics: List[dict] = field(default_factory=list)

    @staticmethod
    def _name(stage) -> str:
        if hasattr(stage, "apply"):
            return type(stage).__name__.lower()
        return getattr(stage, "__name__", "fn")

    def run(self, gt: GeoTable, resume: bool = False) -> Tuple[GeoTable, List]:
        """Returns (final geotable, cache stack)."""
        caches = []
        self.metrics = []
        cur = gt
        spark = gt.df.sparkSession
        for idx, stage in enumerate(self.stages):
            name = self._name(stage)
            t0 = time.perf_counter()
            if self.store is not None and resume and self.store.validate(spark, idx, name):
                df = self.store.load(spark, idx, name)
                cur = cur.with_df(df)
                caches.append(None)
                self.metrics.append(
                    {"stage": idx, "name": name, "resumed": True, "sec": round(time.perf_counter() - t0, 3)}
                )
                continue
            if hasattr(stage, "apply"):
                cur, cache = stage.apply(cur)
            else:
                cur = cur.with_df(stage(cur.df))
                cache = None
            caches.append(cache)
            if self.store is not None:
                key = cur.row_id if cur.row_id in cur.df.columns else None
                df = self.store.commit(idx, name, cur.df, key_col=key)
                cur = cur.with_df(df)
            self.metrics.append(
                {"stage": idx, "name": name, "resumed": False, "sec": round(time.perf_counter() - t0, 3)}
            )
        return cur, caches

    def revert(self, gt: GeoTable, caches: List) -> GeoTable:
        cur = gt
        for stage, cache in zip(reversed(self.stages), reversed(caches)):
            if hasattr(stage, "revert") and cache is not None:
                cur = stage.revert(cur, cache)
            else:
                raise ValueError(f"stage {type(stage).__name__} is not revertible")
        return cur
