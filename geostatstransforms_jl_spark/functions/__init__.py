from .knn import knn_join, metric_cholesky, radius_join
from .timeseries import sessionize, time_rollup

__all__ = ["knn_join", "metric_cholesky", "radius_join", "sessionize", "time_rollup"]
