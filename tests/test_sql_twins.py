"""The SQL front end (entry point C, SURVEY.md §3.3): every analytic.sql
question run as literal Spark SQL must return exactly what its DataFrame
twin returns."""

from __future__ import annotations

import pytest

from busdata_pipeline_spark.plans.registry import QUERIES
from busdata_pipeline_spark.plans.sql_twins import SQL_TWINS
from tests.conftest import SF0001


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(str(r[c]) for c in cols) for r in df.collect())
    )


@pytest.mark.parametrize("name", sorted(SQL_TWINS))
def test_sql_twin_equals_dataframe(spark, name):
    df_result = QUERIES[name](spark, SF0001)
    sql_result = QUERIES[f"sql_{name}"](spark, SF0001)
    assert sorted(sql_result.columns) == sorted(df_result.columns)
    assert _sorted_rows(sql_result) == _sorted_rows(df_result)
