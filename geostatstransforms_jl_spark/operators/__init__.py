from .uniquecoords import UniqueCoords
from .upscale import Upscale
from .downscale import Downscale
from .aggregate import Aggregate
from .transfer import Transfer

__all__ = ["UniqueCoords", "Upscale", "Downscale", "Aggregate", "Transfer"]
