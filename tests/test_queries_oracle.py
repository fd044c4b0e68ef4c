"""DuckDB-oracle equivalence for every registry entry with an oracle —
the local mirror of the driver's CORRECTNESS gate (sf0.01)."""

import pytest

from data_pipelines_snowflake_procedures_spark.queries import REGISTRY

from .oracle_utils import assert_oracle_match

ORACLE_SPECS = [s for s in REGISTRY.values() if s.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_match(spark, duck, spec, sf_dir):
    assert_oracle_match(spark, duck, spec, sf_dir)


def test_rows_only_specs_return_rows(spark, sf_dir):
    for spec in REGISTRY.values():
        if spec.oracle is None:
            df = spec.spark_fn(spark, sf_dir)
            assert df.columns, f"{spec.name}: empty schema"
            assert df.count() >= 0
