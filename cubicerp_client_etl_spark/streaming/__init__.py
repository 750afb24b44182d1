from cubicerp_client_etl_spark.streaming.jobs import run_stream_to_memory

__all__ = ["run_stream_to_memory"]
