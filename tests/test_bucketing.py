"""Bucketed-table co-located join tests: the join on the bucket key must
plan with NO shuffle exchange on either side — the file layout carries the
hash partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions.partitioning import write_bucketed


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    write_bucketed(
        orders, "t_orders_b", "o_custkey", 8,
        sort_cols="o_custkey", path=str(tmp_path / "orders_b"),
    )
    write_bucketed(
        cust, "t_cust_b", "c_custkey", 8,
        sort_cols="c_custkey", path=str(tmp_path / "cust_b"),
    )
    yield "t_orders_b", "t_cust_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t_orders, t_cust = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_orders).join(
            spark.table(t_cust),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # sorted buckets: no extra Sort needed before the merge join
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    t_orders, _ = bucketed_tables
    agg = spark.table(t_orders).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() > 0


def test_bucketed_matches_plain_join(spark, bucketed_tables):
    t_orders, t_cust = bucketed_tables
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bucketed = (
        spark.table(t_orders)
        .join(spark.table(t_cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bucketed.collect())
    )
