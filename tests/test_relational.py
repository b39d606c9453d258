"""as-of join semantics (DuckDB/kdb parity) and bucketed range join."""

import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions.relational import asof_join, range_join_buckets


def _left(spark):
    return spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c"), (3, 10, "d")],
        "k long, ts long, tag string",
    )


def test_asof_basic_latest_match(spark):
    right = spark.createDataFrame(
        [(1, 90, 1.0), (1, 200, 2.0), (2, 50, 3.0)], "k long, ts long, v double"
    )
    out = asof_join(_left(spark), right, on="k", value_cols=["v"])
    got = {r["tag"]: r["v_asof"] for r in out.collect()}
    # ts=100 → right@90; ts=205 → right@200; ts=50 → right@50 (inclusive);
    # k=3 has no right rows → NULL.
    assert got == {"a": 1.0, "b": 2.0, "c": 3.0, "d": None}


def test_asof_whole_row_null_fields(spark):
    """A matched right row with NULL in one value column must attach that
    NULL — never inherit the field from an older right row."""
    right = spark.createDataFrame(
        [(1, 90, 1.0, "old"), (1, 199, None, "new")],
        "k long, ts long, v double, label string",
    )
    out = asof_join(_left(spark), right, on="k", value_cols=["v", "label"])
    row = {r["tag"]: (r["v_asof"], r["label_asof"]) for r in out.collect()}
    # ts=100 matches the 90 row; ts=205 matches the 199 row whose v is NULL.
    assert row["a"] == (1.0, "old")
    assert row["b"] == (None, "new")


def test_asof_no_future_leak(spark):
    right = spark.createDataFrame([(1, 300, 9.0)], "k long, ts long, v double")
    out = asof_join(_left(spark), right, on="k", value_cols=["v"])
    assert all(r["v_asof"] is None for r in out.collect() if r["k"] == 1)


def test_range_join_buckets(spark):
    pts = spark.createDataFrame([(1, 5), (2, 35), (3, 99)], "pid long, x long")
    ivs = spark.createDataFrame(
        [(10, 0, 10), (20, 30, 40), (30, 90, 95)], "iid long, lo long, hi long"
    )
    out = range_join_buckets(pts, ivs, "x", "lo", "hi", bucket_width=16)
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    assert got == {(1, 10), (2, 20)}


def test_salted_join_matches_plain_join(spark):
    import random

    rng = random.Random(9)
    # skewed: key 0 holds half the rows
    left = spark.createDataFrame(
        [(0 if rng.random() < 0.5 else rng.randrange(1, 50), i) for i in range(2000)],
        "k long, payload long",
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(50)], "k long, tag string"
    )
    from krnel_graph_spark.functions.relational import salted_join

    plain = left.join(right, "k").select("k", "payload", "tag")
    salted = salted_join(left, right, "k", num_salts=8).select("k", "payload", "tag")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_asof_join_weird_column_names(spark):
    left = spark.createDataFrame([(1, 100, "a")], "k long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 90, 1.5)], ["k", "ts", "bid price"]
    )
    out = asof_join(left, right, on="k", value_cols=["bid price"])
    assert out.collect()[0]["bid price_asof"] == 1.5


def test_asof_join_no_value_cols_rejected(spark):
    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame([(1, 90)], "k long, ts long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no value columns"):
        asof_join(left, right, on="k")


def test_asof_join_dotted_column_names(spark):
    left = spark.createDataFrame([(1, 100, "a")], "k long, ts long, tag string")
    right = spark.createDataFrame([(1, 90, 2.5)], ["k", "ts", "bid.price"])
    out = asof_join(left, right, on="k", value_cols=["bid.price"])
    assert out.collect()[0]["bid.price_asof"] == 2.5


def test_salted_join_rejects_existing_salt_column(spark):
    from krnel_graph_spark.functions.relational import salted_join

    left = spark.createDataFrame([(1, 0)], "k long, __salt long")
    right = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(left, right, on="k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(right, left, on="k")


# --------------------------------------------------------------------- #
# pivot_dynamic                                                           #
# --------------------------------------------------------------------- #


def _sales(spark):
    return spark.createDataFrame(
        [("us", "red", 2.0), ("us", "blue", 3.0), ("eu", "red", 5.0),
         ("eu", None, 7.0), ("ap", "blue", 11.0)],
        "region string, color string, amt double",
    )


def test_pivot_dynamic_golden(spark):
    from krnel_graph_spark.functions.relational import pivot_dynamic

    out = pivot_dynamic(_sales(spark), "region", "color", max_values=10)
    # Deterministic schema: values sorted, NULL pivot value last.
    assert out.columns == ["region", "v_blue", "v_red", "v_null"]
    rows = {r["region"]: r for r in out.collect()}
    assert (rows["us"]["v_red"], rows["us"]["v_blue"], rows["us"]["v_null"]) == (1, 1, None)
    assert rows["eu"]["v_null"] == 1
    assert rows["ap"]["v_blue"] == 1 and rows["ap"]["v_red"] is None


def test_pivot_dynamic_custom_agg_and_budget(spark):
    from krnel_graph_spark.functions.relational import pivot_dynamic

    out = pivot_dynamic(
        _sales(spark), "region", "color",
        agg=F.round(F.sum("amt"), 4), max_values=3, prefix="amt_",
    )
    rows = {r["region"]: r for r in out.collect()}
    assert rows["eu"]["amt_red"] == 5.0 and rows["eu"]["amt_null"] == 7.0

    # Budget exceeded -> explicit error, not a runaway wide plan.
    with pytest.raises(ValueError, match="more than 2 distinct"):
        pivot_dynamic(_sales(spark), "region", "color", max_values=2)


def test_pivot_dynamic_matches_fixed_pivot(spark):
    """Dynamic discovery must reuse the fixed-list path exactly."""
    from krnel_graph_spark.functions.relational import pivot_dynamic

    df = _sales(spark).where(F.col("color").isNotNull())
    dyn = pivot_dynamic(df, "region", "color", max_values=5)
    fixed = (
        df.groupBy("region").pivot("color", ["blue", "red"]).count()
        .select("region", F.col("blue").alias("v_blue"), F.col("red").alias("v_red"))
    )
    assert sorted(map(tuple, dyn.collect())) == sorted(map(tuple, fixed.collect()))
