from cubicerp_client_etl_spark.compilers.domain import compile_domain
from cubicerp_client_etl_spark.compilers.template import render_date_template

__all__ = ["compile_domain", "render_date_template"]
