"""traffic_engine_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch recast (NOT a port) of the capabilities of
opentraffic/traffic-engine (reference at /root/reference) as declarative
Spark plans: H3-style packed-cell spatial joins, slippy-tile parity math,
per-trace crossing state machines in applyInPandas, histogram/summary
statistics as native aggregations, plus the training-data operators
(dedup, ANN, text analysis) a 100 TB pipeline needs.

See SURVEY.md for the operator-by-operator mapping.
"""

from .config import DEFAULT_CONFIG, EngineConfig
from .session import get_spark

__all__ = ["DEFAULT_CONFIG", "EngineConfig", "get_spark"]
__version__ = "0.1.0"
