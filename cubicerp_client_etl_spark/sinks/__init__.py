from cubicerp_client_etl_spark.sinks.ledger import write_ledger
from cubicerp_client_etl_spark.sinks.writers import (
    render_fixed_width_lines,
    write_csv_resource,
    write_fixed_width,
    write_parquet,
)

__all__ = [
    "render_fixed_width_lines",
    "write_fixed_width",
    "write_csv_resource",
    "write_parquet",
    "write_ledger",
]
