"""dfx_indicators_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the
UNDP-Data/dfx-indicators-etl reference (a pandas indicator ETL):
canonical indicator data model, source transforms, validation,
star-schema observation views, storage — plus the relational analytics
and large-scale training-data operators (dedup, similarity, text
analysis, multimodal plumbing) needed at 100 TB scale.

Architecture is Spark-first: logical plans are declared with the
DataFrame/SQL API so Catalyst/Tungsten pick physical strategies
(broadcast joins, partial aggregation, pushdown, AQE). Python UDFs are
avoided in hot paths; Arrow-batched Pandas UDFs are used only where
built-ins cannot express the semantics.
"""

__version__ = "0.1.0"
