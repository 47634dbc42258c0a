from .exprs import dsum, davg, revenue
from .tracking import auto_tracking, auto_tracking_with, track

__all__ = ["dsum", "davg", "revenue", "auto_tracking", "auto_tracking_with", "track"]
