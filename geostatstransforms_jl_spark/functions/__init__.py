from .knn import knn_join, radius_join

__all__ = ["knn_join", "radius_join"]
