"""Query plans ("models"): composed operator pipelines, single- and multi-chip."""

from .pipeline import make_dist_pipeline, pipeline_single

__all__ = ["pipeline_single", "make_dist_pipeline"]
