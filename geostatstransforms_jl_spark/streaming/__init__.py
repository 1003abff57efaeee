from .incremental import streaming_quality, streaming_unique_coords, streaming_tile_agg

__all__ = ["streaming_quality", "streaming_unique_coords", "streaming_tile_agg"]
