"""Driver-window output contract (VERDICT r2 "Next round" #4).

The external driver correctness-checks the FIRST 50 registry names in
sorted order, canonicalizing results through a pandas ``sort_values``
over every column — which raises ``TypeError: unhashable type`` on any
array/struct/map cell (the round-2 q041 red). This test makes that
failure class impossible to reintroduce: every window query's output
schema must be scalar-only, and every window query must carry a DuckDB
oracle (rows-only window slots waste hard-signal coverage).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tests.conftest import SF_SMOKE

WINDOW = 50


def _window_names():
    from cubicerp_client_etl_spark.queries import REGISTRY

    return sorted(REGISTRY)[:WINDOW]


_COMPOSITE = (T.ArrayType, T.StructType, T.MapType)


@pytest.mark.parametrize("name", _window_names())
def test_window_query_returns_scalar_columns_only(spark, name):
    from cubicerp_client_etl_spark.queries import REGISTRY

    schema = REGISTRY[name].fn(spark, SF_SMOKE).schema
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, _COMPOSITE)
    ]
    assert not bad, (
        f"{name} is inside the driver's 50-query window but returns "
        f"composite columns {bad}; serialize them (per-element scalars, "
        f"md5(to_json(...)), array_join) — see queries/__init__.py"
    )


def test_every_window_query_has_an_oracle():
    from cubicerp_client_etl_spark.queries import REGISTRY

    missing = [n for n in _window_names() if REGISTRY[n].oracle is None]
    assert not missing, (
        f"window queries without a DuckDB oracle (driver records only a "
        f"weak rows-only check): {missing}"
    )
