"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference project
``Andcher3/Advanced-Technologies-of-China-Graph-Database-Construction``
(a bibliometric property-graph ETL + query system; see SURVEY.md).

Everything here is a brand-new Spark-first design: DataFrames + Spark SQL
+ Catalyst for the relational core, node/edge DataFrames for the property
graph, LSH + connected-components for entity resolution, Structured
Streaming for incremental ingest, and Arrow-batched pandas UDFs for the
(pluggable, network-free by default) ML/LLM enrichment seams.
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
