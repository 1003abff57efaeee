from .incremental import (
    assign_session_seq,
    streaming_quality,
    streaming_sessionize,
    streaming_tile_agg,
    streaming_cell_pyramid,
    streaming_tile_cells,
    streaming_time_rollup,
    streaming_unique_coords,
)

__all__ = [
    "assign_session_seq",
    "streaming_quality",
    "streaming_sessionize",
    "streaming_tile_agg",
    "streaming_cell_pyramid",
    "streaming_tile_cells",
    "streaming_time_rollup",
    "streaming_unique_coords",
]
