"""Pipeline auto-tracking decorators (reference: python/sqlflow.py:51-120).

``@auto_tracking`` registers every DataFrame a function returns as a temp
view named after the function, so catalog-mode lineage extraction sees each
pipeline stage as a named node. Returned containers (list/tuple/dict) are
searched for DataFrames; if the return value contains none, the DataFrame
*arguments* are registered instead (so sink-style functions still track).

Disable globally with env ``SQLFLOW_AUTO_TRACKING_DISABLED=1``.
"""

from __future__ import annotations

import functools
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame

_DISABLE_ENV = "SQLFLOW_AUTO_TRACKING_DISABLED"


def _collect_dataframes(value: Any) -> list[DataFrame]:
    if isinstance(value, DataFrame):
        return [value]
    if isinstance(value, (list, tuple)):
        return [df for v in value for df in _collect_dataframes(v)]
    if isinstance(value, dict):
        return [df for v in value.values() for df in _collect_dataframes(v)]
    return []


def _unique_view_name(df: DataFrame, base: str) -> str:
    catalog = df.sparkSession.catalog
    if not catalog.tableExists(base):
        return base
    return f"{base}_{uuid.uuid4().hex[:7]}"


def track(df: DataFrame, name: str) -> DataFrame:
    """Explicitly register a pipeline stage for lineage tracking."""
    df.createOrReplaceTempView(_unique_view_name(df, name))
    return df


def auto_tracking_with(name: str | None = None):
    """Decorator factory: track DataFrames under ``name`` (default fn name)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            result = fn(*args, **kwargs)
            if os.environ.get(_DISABLE_ENV, "").strip() in ("1", "true", "yes"):
                return result
            dfs = _collect_dataframes(result)
            if not dfs:  # fall back to DataFrame inputs
                dfs = _collect_dataframes(list(args) + list(kwargs.values()))
            base = name or fn.__name__
            for df in dfs:
                try:
                    df.createOrReplaceTempView(_unique_view_name(df, base))
                except Exception:
                    pass  # tracking must never break the pipeline
            return result

        return wrapper

    return deco


def auto_tracking(fn):
    """``@auto_tracking`` — track under the wrapped function's name."""
    return auto_tracking_with(None)(fn)
