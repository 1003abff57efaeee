from .uniquecoords import UniqueCoords
from .upscale import Upscale
from .downscale import Downscale
from .aggregate import Aggregate
from .transfer import Transfer
from .interpolate import Interpolate, InterpolateNeighbors
from .droplocallowhigh import DropLocalLowHigh, DropLocalLow, DropLocalHigh
from .gradient import Gradient
from .rasterize import Rasterize
from .potrace import Potrace
from .detrend import Detrend
from .seqfilters import ModeFilter, Quenching, MaxPosterior
from .tabletransforms import AbsoluteUnits, Filter, OneHot, Only, Reject, Select, StdFeats
from .spatialjoin import pip_join

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
    "Gradient",
    "Rasterize",
    "Potrace",
    "Detrend",
    "ModeFilter",
    "Quenching",
    "MaxPosterior",
    "Select",
    "Reject",
    "Only",
    "Filter",
    "OneHot",
    "StdFeats",
    "AbsoluteUnits",
    "pip_join",
]
