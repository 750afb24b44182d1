from cubicerp_client_etl_spark.connectors.rpc import rpc_extract, rpc_load

__all__ = ["rpc_extract", "rpc_load"]
