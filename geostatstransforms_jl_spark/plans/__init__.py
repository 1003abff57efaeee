from .pipeline import Pipeline, Stage

__all__ = ["Pipeline", "Stage"]
