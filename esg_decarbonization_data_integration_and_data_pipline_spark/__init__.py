"""PySpark-native decarbonization analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference corporate-decarbonization ETL platform
(lu791019/ESG-Decarbonization-Data-integration-and-Data-pipline):
a 3-layer (raw -> staging -> app) relational warehouse with joins,
rollups, partitioned cumulative sums (YTM), pivots, as-of/interval
joins, carbon-accounting arithmetic and idempotent partition-replace
writes -- plus the large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal columns,
structured streaming) that the 100 TB design target requires.

Everything is declarative DataFrame/SQL so Catalyst + AQE choose the
physical plan; Python UDFs appear only where semantics genuinely
cannot be expressed with built-in functions (IRR, external model
calls, binary decode stubs).
"""

from esg_decarbonization_data_integration_and_data_pipline_spark.session import get_spark

__all__ = ["get_spark"]
