"""I1×C4 — model-based property test: apply_reprocess_mode must agree
with a plain-Python dict model of the reference's do_load routing
(cubicerpetl.py:494-537) for every mode, on arbitrary target/staged
batches (unique pks per side, matching the reference's id-keyed
semantics)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cubicerp_client_etl_spark.operators.merge import (
    REPROCESS_MODES,
    apply_reprocess_mode,
)

# small domains force pk collisions between target and staged
side = st.dictionaries(
    keys=st.integers(min_value=0, max_value=6),
    values=st.integers(min_value=0, max_value=5),
    max_size=7,
)


def model(target: dict, staged: dict, mode: str) -> list[tuple[int, int]]:
    if mode == "insert":
        # everything kept, every staged row created (dup pks allowed)
        return sorted(list(target.items()) + list(staged.items()))
    if mode in ("update", "delete"):
        # staged wins on match, staged-only created, target-only kept
        return sorted({**target, **staged}.items())
    if mode == "noupdate":
        # target wins on match, staged-only created
        return sorted({**staged, **target}.items())
    if mode == "onlyupdate":
        # staged wins on match, staged-only dropped, target-only kept
        return sorted(
            (pk, staged.get(pk, v)) for pk, v in target.items()
        )
    raise AssertionError(mode)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=side, staged=side, mode=st.sampled_from(REPROCESS_MODES))
def test_reprocess_mode_matches_dict_model(spark, target, staged, mode):
    tdf = spark.createDataFrame(
        list(target.items()) or [(None, None)], "pk int, v int"
    ).filter("pk IS NOT NULL")
    sdf = spark.createDataFrame(
        list(staged.items()) or [(None, None)], "pk int, v int"
    ).filter("pk IS NOT NULL")
    merged = apply_reprocess_mode(tdf, sdf, "pk", mode, action_col=None)
    got = sorted((r.pk, r.v) for r in merged.collect())
    assert got == model(target, staged, mode), (mode, target, staged)
