"""cubicerp_client_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference client-ETL system (CubicERP/cubicerp-client-etl, studied at
/root/reference/), re-expressed Spark-first:

* the reference's *native* surface (file codecs, row transforms, lookup
  joins, merge/upsert modes, run ledger, job orchestration) becomes
  declarative DataFrame lineage (``sources/``, ``sinks/``, ``operators/``,
  ``plans/``);
* the relational surface the reference *delegates* to the source database
  (its ``sql_query`` passthrough, cubicerpetl/cubicerpetl.py:299-302) is
  owned in-engine by Spark SQL / Catalyst;
* LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal columns) are first-class operators designed for 100 TB scale.

Everything is DataFrame/SQL-first: no driver-side row loops, no collect()
in operator paths, Pandas UDFs only where built-ins can't express the
semantics.
"""

from cubicerp_client_etl_spark.session import get_spark

__all__ = ["get_spark"]

__version__ = "0.1.0"
