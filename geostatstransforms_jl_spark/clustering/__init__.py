from .slic import SLIC, slic_df
from .ghc import GHC, ghc_df
from .gsc import GSC, gsc_df

__all__ = ["SLIC", "slic_df", "GHC", "ghc_df", "GSC", "gsc_df"]
