from .uniquecoords import UniqueCoords
from .upscale import Upscale
from .downscale import Downscale
from .aggregate import Aggregate
from .transfer import Transfer
from .interpolate import Interpolate, InterpolateNeighbors
from .droplocallowhigh import DropLocalLowHigh, DropLocalLow, DropLocalHigh

__all__ = [
    "UniqueCoords",
    "Upscale",
    "Downscale",
    "Aggregate",
    "Transfer",
    "Interpolate",
    "InterpolateNeighbors",
    "DropLocalLowHigh",
    "DropLocalLow",
    "DropLocalHigh",
]
