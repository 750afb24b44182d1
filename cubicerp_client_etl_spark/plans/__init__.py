from cubicerp_client_etl_spark.plans.interpreter import run_job
from cubicerp_client_etl_spark.plans.spec import (
    ColumnSpec,
    FieldSpec,
    JobSpec,
    MappingSpec,
    ResourceSpec,
    ServerSpec,
    TransformSpec,
)

__all__ = [
    "ServerSpec",
    "ResourceSpec",
    "ColumnSpec",
    "FieldSpec",
    "TransformSpec",
    "MappingSpec",
    "JobSpec",
    "run_job",
]
