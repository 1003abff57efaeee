from .graph import connected_components
from .geocell import cell_pyramid, morton_cell, tile_cells, zorder_repartition
from .knn import knn_join, metric_cholesky, radius_join
from .timeseries import sessionize, time_rollup

__all__ = [
    "knn_join",
    "metric_cholesky",
    "cell_pyramid",
    "connected_components",
    "morton_cell",
    "radius_join",
    "sessionize",
    "tile_cells",
    "time_rollup",
    "zorder_repartition",
]
