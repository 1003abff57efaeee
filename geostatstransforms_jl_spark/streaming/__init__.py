from .incremental import (
    streaming_quality,
    streaming_sessionize,
    streaming_tile_agg,
    streaming_time_rollup,
    streaming_unique_coords,
)

__all__ = [
    "streaming_quality",
    "streaming_sessionize",
    "streaming_tile_agg",
    "streaming_time_rollup",
    "streaming_unique_coords",
]
