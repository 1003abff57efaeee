from .grid import GridMeta, fitdims
from .geotable import GeoTable, PointDomain, GridDomain, GeomDomain
from .aggregates import (
    AGG_REGISTRY,
    default_agg,
    resolve_aggs,
    grouped_agg,
    first_by,
    last_by,
    mode_expr,
)
from .validate import (
    validate_media,
    image_reject_reason,
    video_reject_reason,
    audio_reject_reason,
)

__all__ = [
    "GridMeta",
    "fitdims",
    "GeoTable",
    "PointDomain",
    "GridDomain",
    "GeomDomain",
    "AGG_REGISTRY",
    "default_agg",
    "resolve_aggs",
    "grouped_agg",
    "first_by",
    "last_by",
    "mode_expr",
    "validate_media",
    "image_reject_reason",
    "video_reject_reason",
    "audio_reject_reason",
]
