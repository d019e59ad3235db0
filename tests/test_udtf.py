"""The Python UDTF chunker must be row-identical to its built-in HOF
twin (text_chunk_windows) — same chunks, same clamped tails, same
NULL-text handling — proving the @udtf surface computes exactly what
the production JVM-side form does."""

from __future__ import annotations

from etl_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_udtf_matches_hof_twin(spark):
    udtf_rows = [
        tuple(r)
        for r in REGISTRY["udtf_chunk_windows"].builder(spark, SF_DIR).collect()
    ]
    hof_rows = [
        tuple(r)
        for r in REGISTRY["text_chunk_windows"].builder(spark, SF_DIR).collect()
    ]
    assert len(udtf_rows) > 0
    assert sorted(udtf_rows) == sorted(hof_rows)


def test_udtf_plan_is_a_lateral_generate(spark):
    # The UDTF must run as a per-partition table function (a Generate/
    # lateral-join shape), not via any collect-and-rejoin path.
    plan = (
        REGISTRY["udtf_chunk_windows"]
        .builder(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PythonUDTF" in plan or "Generate" in plan
    assert "CartesianProduct" not in plan
