"""Error-bound tests for the approximate sketches (no SQL oracle by design:
sketch internals differ across engines; exact answers bound them instead)."""

import random

import pytest

from krnel_graph_spark.functions import sketches


@pytest.fixture(scope="module")
def skewed(spark):
    rng = random.Random(5)
    rows = []
    # Zipf-ish: value i appears ~ 3000 / (i + 1) times
    for i in range(200):
        rows += [(f"v{i}", float(i))] * max(1, 3000 // (i + 1))
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "k string, x double").repartition(16).cache()


def test_approx_distinct_within_rsd(skewed):
    row = sketches.approx_distinct(skewed, ["k"], rsd=0.02).collect()[0]
    exact = skewed.select("k").distinct().count()
    assert abs(row["k_distinct"] - exact) / exact < 0.08


def test_heavy_hitters_exact_top(skewed):
    top = sketches.heavy_hitters(skewed, "k", k=5).collect()
    assert [r["value"] for r in top] == ["v0", "v1", "v2", "v3", "v4"]
    assert top[0]["n"] == 3000


def test_approx_quantiles_rank_error(skewed):
    got = sketches.approx_quantiles(skewed, "x", [0.5, 0.9], accuracy=10000)
    import numpy as np

    xs = np.array([r["x"] for r in skewed.select("x").collect()])
    for q, est in zip([0.5, 0.9], got):
        rank = (xs <= est).mean()
        assert abs(rank - q) < 0.01


def test_column_profile_single_job(skewed):
    row = sketches.column_profile(skewed, ["k", "x"]).collect()[0]
    assert row["k_nonnull"] == skewed.count()
    assert row["x_min"] == "0.0"
    assert float(row["x_max"]) == 199.0


def test_quantize_roundtrip_error_bound(spark):
    import numpy as np

    from krnel_graph_spark.functions.vector import dequantize, quantize_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    orig = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    q = quantize_embeddings(emb, "embedding", "vec_id")
    back = q.select("vec_id", dequantize("q", "scale").alias("d"), "scale").collect()
    assert len(back) == len(orig)
    for r in back:
        x = orig[r["vec_id"]]
        d = np.asarray(r["d"])
        assert np.abs(x - d).max() <= r["scale"] / 2 + 1e-12


def test_quantize_zero_vector(spark):
    from krnel_graph_spark.functions.vector import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -2.0])], "vec_id long, embedding array<double>"
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df, "embedding", "vec_id").collect()}
    assert rows[1]["q"] == [0, 0] and rows[1]["scale"] == 0.0
    assert rows[2]["q"] == [64, -127]


def test_profile_table_long_format(spark):
    from krnel_graph_spark.functions.sketches import profile_table

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (2, 4.0, None)],
        "k long, v double, s string",
    )
    rows = {
        r["column"]: r
        for r in profile_table(df, ["k", "v", "s"], exact_distinct=True).collect()
    }
    assert rows["k"]["n_rows"] == 3 and rows["k"]["n_nonnull"] == 3
    assert rows["k"]["n_distinct"] == 2
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 2.0
    assert rows["v"]["n_nonnull"] == 2 and rows["v"]["max_num"] == 4.0
    assert rows["s"]["n_nonnull"] == 2 and rows["s"]["min_num"] is None

    # approx mode still one row per column with sane counts
    approx = {
        r["column"]: r for r in profile_table(df, ["k", "s"]).collect()
    }
    assert set(approx) == {"k", "s"} and approx["k"]["n_distinct"] >= 1


# --------------------------------------------------------------------- #
# histogram_fixed                                                         #
# --------------------------------------------------------------------- #


def test_histogram_fixed_counts_and_clamping(spark):
    from krnel_graph_spark.functions.sketches import histogram_fixed

    rows = [(float(v),) for v in [-5, 0, 1, 9, 10, 11, 19, 25, 100]] + [(None,)]
    df = spark.createDataFrame(rows, "x double")
    out = {
        r["bin"]: (r["lo"], r["hi"], r["n"])
        for r in histogram_fixed(df, "x", 0.0, 20.0, 2).collect()
    }
    # bins: [0,10) and [10,20); -5 clamps into 0, 25/100 clamp into 1
    assert out[0] == (0.0, 10.0, 4)   # -5, 0, 1, 9
    assert out[1] == (10.0, 20.0, 5)  # 10, 11, 19, 25, 100
    assert len(out) == 2


def test_histogram_fixed_empty_bins_present(spark):
    from krnel_graph_spark.functions.sketches import histogram_fixed

    df = spark.createDataFrame([(5.0,)], "x double")
    out = histogram_fixed(df, "x", 0.0, 100.0, 10).collect()
    assert len(out) == 10
    assert sum(r["n"] for r in out) == 1
    assert sum(1 for r in out if r["n"] == 0) == 9


def test_histogram_fixed_validation(spark):
    import pytest as _pytest

    from krnel_graph_spark.functions.sketches import histogram_fixed

    df = spark.createDataFrame([(1.0,)], "x double")
    with _pytest.raises(ValueError):
        histogram_fixed(df, "x", 0.0, 10.0, 0)
    with _pytest.raises(ValueError):
        histogram_fixed(df, "x", 10.0, 10.0, 4)


def test_corr_matrix_differential(spark):
    """corr_matrix vs numpy corrcoef on random data incl. nulls."""
    import numpy as np

    from krnel_graph_spark.functions.sketches import corr_matrix

    rng = np.random.default_rng(9)
    x = rng.normal(0, 1, 300)
    y = 2 * x + rng.normal(0, 0.5, 300)   # strongly correlated
    z = rng.normal(0, 1, 300)              # independent
    rows = [
        (float(a), float(b), float(c)) for a, b, c in zip(x, y, z)
    ] + [(None, 1.0, 1.0), (1.0, None, 1.0)]  # complete-case drops these
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in corr_matrix(df, ["x", "y", "z"]).collect()
    }
    exp = np.corrcoef(np.vstack([x, y, z]))
    import pytest as _pytest

    assert got[("x", "y")] == _pytest.approx(exp[0, 1], abs=1e-6)
    assert got[("x", "z")] == _pytest.approx(exp[0, 2], abs=1e-6)
    assert got[("y", "z")] == _pytest.approx(exp[1, 2], abs=1e-6)
    assert got[("x", "y")] > 0.9 and abs(got[("x", "z")]) < 0.2


def test_corr_matrix_validation(spark):
    import pytest as _pytest

    from krnel_graph_spark.functions.sketches import corr_matrix

    df = spark.createDataFrame([(1.0,)], "x double")
    with _pytest.raises(ValueError):
        corr_matrix(df, ["x"])


def test_profile_table_hll_band_split_plan(spark):
    """hll_band: exact stats + each column's own HLL graded inside the
    band, emitted from the exact aggregation crossJoined with a MINIMAL
    sketches-only aggregation — deliberately NOT one fused agg (Catalyst
    routes multi-distinct through Expand, and HLL sketches through the
    expanded stream measured ~3x slower at sf0.1)."""
    from krnel_graph_spark.functions.sketches import profile_table

    rows = [(i % 7, float(i % 13), str(i % 3)) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, v double, s string")
    out = {r.column: r for r in profile_table(df, ["k", "v", "s"], hll_band=0.15).collect()}
    assert set(out) == {"k", "v", "s"}
    assert out["k"].n_distinct == 7 and out["v"].n_distinct == 13
    assert out["s"].n_distinct == 3
    # tiny cardinalities sit in HLL's exact regime -> always in band
    assert all(r.hll_within_band for r in out.values())
    assert out["k"].n_rows == 500 and out["s"].min_num is None
    # plan shape: the HLL aggregates must NOT ride the Expand — they
    # arrive via a broadcast 1-row join with their own aggregate
    plan = profile_table(df, ["k", "v"], hll_band=0.15)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Expand" in plan  # the exact multi-distinct path
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row hll wide
