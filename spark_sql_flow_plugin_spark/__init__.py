"""spark_sql_flow_plugin_spark — a PySpark-native engine with the query and
data-processing capabilities of maropu/spark-sql-flow-plugin (reference at
/root/reference), plus LLM-training-data pipeline operators designed for
100 TB scale.

Layers:
- ``registry`` / ``operators`` / ``streaming``: the runnable query surface
  (SURVEY.md §2.D) + NEW dedup/similarity/text/multimodal operators.
- ``plans`` / ``sinks``: column-level lineage extraction over Catalyst
  optimized plans, rendered to GraphViz/Mermaid/adjacency sinks
  (reference SQLFlow.scala / basicSinks.scala, re-expressed in Python).
- ``functions.tracking``: @auto_tracking pipeline decorators.
"""

from .api import (
    export_data_lineage_into,
    extract,
    print_as_sql_flow,
    save_as_sql_flow,
    save_data_lineage,
    to_sql_flow_string,
)
from .functions.tracking import auto_tracking, auto_tracking_with, track
from .registry import all_specs, oracle_sql, queries
from .session import get_session, tune

__all__ = [
    "all_specs",
    "auto_tracking",
    "auto_tracking_with",
    "export_data_lineage_into",
    "extract",
    "get_session",
    "oracle_sql",
    "print_as_sql_flow",
    "queries",
    "save_as_sql_flow",
    "save_data_lineage",
    "to_sql_flow_string",
    "track",
    "tune",
]

__version__ = "0.1.0"
