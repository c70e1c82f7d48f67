"""Co-located bucketed joins (sinks/bucketed.py): the whole point is
an exchange-free fact-fact join, so that is what gets pinned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quacfka_service_spark.plans.inspect import count_exchanges, formatted_plan
from quacfka_service_spark.session import load_table
from quacfka_service_spark.sinks.bucketed import colocated_join, write_bucketed

from .conftest import SF_DIR


@pytest.fixture()
def no_broadcast(spark):
    """Force SMJ so the assertion is about shuffle exchanges, not
    broadcast luck at tiny SF."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_no_exchange(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    li = li.withColumnRenamed("l_orderkey", "o_orderkey")

    write_bucketed(orders, "b_orders", str(tmp_path / "o"), key="o_orderkey", buckets=4)
    write_bucketed(li, "b_lineitem", str(tmp_path / "l"), key="o_orderkey", buckets=4)
    try:
        joined = colocated_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = formatted_plan(joined)
        assert count_exchanges(joined) == 0, plan
        assert "SortMergeJoin" in plan

        # same rows as the plain (shuffled) join
        want = orders.join(li, "o_orderkey").count()
        assert joined.count() == want > 0

        # and a groupBy on the bucket key is exchange-free too
        agg = spark.table("b_lineitem").groupBy("o_orderkey").agg(
            F.count(F.lit(1)).alias("n")
        )
        assert count_exchanges(agg) == 0, formatted_plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
