"""SQL-text surface parity: the reference's UX is SQL strings with
{{param}} templates (main.go:92-125); the Spark-SQL translations must
return exactly what the DataFrame builders return, and the templating
must behave like the runner's substitution."""

from __future__ import annotations

import pytest

from quacfka_service_spark import sqlapi
from quacfka_service_spark.fixtures import build_bidreq
from quacfka_service_spark.operators.aggregates import (
    hourly_agg,
    partition_enumeration,
    raw_export_filter,
)
from quacfka_service_spark.operators.normalize import normalize_bidreq

from .conftest import SF_DIR


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.fixture(scope="module")
def catalog(spark):
    sqlapi.register_catalog(spark, SF_DIR)
    return spark


def test_render_template_substitutes_and_fails_loud():
    assert (
        sqlapi.render_template("a={{x}} b={{y}} a2={{x}}", x=1, y="z")
        == "a=1 b=z a2=1"
    )
    with pytest.raises(KeyError, match="unbound template parameter"):
        sqlapi.render_template("WHERE hour = {{hour}}")


def test_partition_enum_sql_equals_dataframe(catalog, spark):
    got = sqlapi.sql(spark, sqlapi.PARTITION_ENUM_SQL)
    want = partition_enumeration(build_bidreq(spark, SF_DIR))
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_hourly_agg_sql_equals_dataframe(catalog, spark):
    got = sqlapi.sql(spark, sqlapi.HOURLY_AGG_SQL)
    want = hourly_agg(normalize_bidreq(build_bidreq(spark, SF_DIR)))
    assert sorted(got.columns) == sorted(want.columns)
    assert _rows(got.select(*want.columns)) == _rows(want)


def test_raw_export_sql_equals_dataframe_for_min_hour(catalog, spark):
    bid = build_bidreq(spark, SF_DIR)
    want = raw_export_filter(bid)
    # the DataFrame op auto-selects the minimum hour; feed the SQL
    # template the same hour the runner would iterate first
    first = (
        sqlapi.sql(spark, sqlapi.PARTITION_ENUM_SQL).limit(1).collect()[0]
    )
    got = sqlapi.sql(
        spark,
        sqlapi.RAW_EXPORT_SQL,
        year=first.year,
        month=first.month,
        day=first.day,
        hour=first.hour,
    )
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_sql_surface_reaches_catalyst_pushdown(catalog, spark):
    """The SQL text plans like the DataFrame API: the templated hour
    filter must reach the scan as a real predicate (no tax for using
    SQL text)."""
    from quacfka_service_spark.plans.inspect import formatted_plan

    got = sqlapi.sql(
        spark, sqlapi.RAW_EXPORT_SQL, year=2024, month=1, day=1, hour=0
    )
    plan = formatted_plan(got)
    assert "Filter" in plan
    # partial aggregation for the flagship agg, same as the DataFrame op
    agg_plan = formatted_plan(sqlapi.sql(spark, sqlapi.HOURLY_AGG_SQL))
    assert "partial_" in agg_plan
