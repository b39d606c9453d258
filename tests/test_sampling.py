"""Deterministic sampling / shuffle-export tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from krnel_graph_spark.functions.sampling import (
    hash_sample,
    shuffle_export,
    stratified_sample,
)


def test_hash_sample_rate_and_determinism(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    n = orders.count()
    s1 = hash_sample(orders, "o_orderkey", 0.2, seed=1)
    k1 = sorted(r["o_orderkey"] for r in s1.select("o_orderkey").collect())
    # rate is approximately honored (binomial tolerance)
    assert abs(len(k1) / n - 0.2) < 0.06
    # identical selection under a different partitioning
    s2 = hash_sample(orders.repartition(13), "o_orderkey", 0.2, seed=1)
    k2 = sorted(r["o_orderkey"] for r in s2.select("o_orderkey").collect())
    assert k1 == k2
    # different seed -> different selection
    k3 = sorted(
        r["o_orderkey"]
        for r in hash_sample(orders, "o_orderkey", 0.2, seed=2)
        .select("o_orderkey")
        .collect()
    )
    assert k1 != k3
    # fraction edges
    assert hash_sample(orders, "o_orderkey", 0.0).count() == 0
    assert hash_sample(orders, "o_orderkey", 1.0).count() == n


def test_stratified_sample_rates(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = stratified_sample(
        docs, "source", {"src0": 1.0, "src1": 0.0}, "doc_id",
        seed=0, default_fraction=0.5,
    )
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["src0"] == totals["src0"]      # fraction 1.0 keeps all
    assert "src1" not in per                  # fraction 0.0 drops all
    others = sum(v for k, v in per.items() if k not in ("src0", "src1"))
    others_total = sum(v for k, v in totals.items() if k not in ("src0", "src1"))
    assert 0 < others < others_total          # default rate in between


def test_shuffle_export_is_permutation_and_sorted(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    out = shuffle_export(docs, "doc_id", seed=9, num_shards=4)
    rows = out.collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in docs.collect()
    )
    assert set(r["shard"] for r in rows) <= set(range(4))
    # every shard gets a reasonable share (hash balance)
    from collections import Counter

    c = Counter(r["shard"] for r in rows)
    assert min(c.values()) > len(rows) / 4 / 3


def test_shuffle_export_total_order_plan(spark):
    """Without shards: range partition + local sort — a distributed total
    order, never a single-task global sort or window."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    out = shuffle_export(docs, "doc_id", seed=9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # range partitioning + per-partition sort = global order across
    # partitions; assert the local sort actually happened
    def check(it):
        ks = [r["shuffle_key"] for r in it]
        yield (ks == sorted(ks),)

    assert all(x[0] for x in out.rdd.mapPartitions(check).collect())


def test_hash_sample_fractions_are_nested(spark):
    """Deterministic thresholding gives NESTED samples: every row kept at
    fraction f is also kept at any f' > f — growing a sample never churns
    previously selected rows (the reproducibility property RNG sampling
    cannot offer)."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    keys = [
        set(
            r["o_orderkey"]
            for r in hash_sample(orders, "o_orderkey", f, seed=4)
            .select("o_orderkey")
            .collect()
        )
        for f in (0.1, 0.3, 0.6, 1.0)
    ]
    for smaller, larger in zip(keys, keys[1:]):
        assert smaller <= larger
    assert len(keys[0]) > 0 and len(keys[-1]) == orders.count()


def test_stratified_matches_hash_sample_per_stratum(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = stratified_sample(
        docs, "source", {"src0": 0.4}, "doc_id", seed=6, default_fraction=0.2
    )
    # stratum src0 must equal a plain hash_sample at 0.4 over that stratum
    a = sorted(
        r["doc_id"]
        for r in out.filter(F.col("source") == "src0").select("doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in hash_sample(
            docs.filter(F.col("source") == "src0"), "doc_id", 0.4, seed=6
        )
        .select("doc_id")
        .collect()
    )
    assert a == b


# --------------------------------------------------------------------- #
# mix_to_weights                                                          #
# --------------------------------------------------------------------- #


def test_mix_to_weights_proportions(spark):
    import pytest as _pytest

    from krnel_graph_spark.functions.sampling import mix_to_weights

    rows = (
        [(i, "web") for i in range(0, 7000)]
        + [(i, "code") for i in range(7000, 8000)]
        + [(i, "books") for i in range(8000, 11000)]
    )
    df = spark.createDataFrame(rows, "id long, src string")
    out = mix_to_weights(df, "src", {"web": 7, "code": 2, "books": 1}, "id")
    counts = {r["src"]: r["n"] for r in out.groupBy("src").count().withColumnRenamed("count", "n").collect()}
    # binding stratum: code has 1000 rows for weight 2 -> T = 5000
    # targets: web 3500, code 1000, books 500 (Bernoulli wobble ~ sqrt(n))
    assert counts["code"] == _pytest.approx(1000, rel=0.12)
    assert counts["web"] == _pytest.approx(3500, rel=0.12)
    assert counts["books"] == _pytest.approx(500, rel=0.2)
    # realized mix close to 7:2:1
    total = sum(counts.values())
    assert counts["web"] / total == _pytest.approx(0.7, abs=0.05)


def test_mix_to_weights_deterministic_and_drops_unlisted(spark):
    from krnel_graph_spark.functions.sampling import mix_to_weights

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, src string")
    a = {r["id"] for r in mix_to_weights(df, "src", {"a": 1, "b": 1}, "id").collect()}
    b = {r["id"] for r in mix_to_weights(df, "src", {"a": 1, "b": 1}, "id").collect()}
    assert a == b
    srcs = {r["src"] for r in mix_to_weights(df, "src", {"a": 1, "b": 1}, "id").collect()}
    assert "c" not in srcs


def test_mix_to_weights_validation(spark):
    import pytest as _pytest

    from krnel_graph_spark.functions.sampling import mix_to_weights

    df = spark.createDataFrame([(1, "a")], "id long, src string")
    with _pytest.raises(ValueError):
        mix_to_weights(df, "src", {}, "id")
    with _pytest.raises(ValueError):
        mix_to_weights(df, "src", {"a": 0}, "id")
    with _pytest.raises(ValueError):
        mix_to_weights(df, "src", {"a": -1}, "id")
    # weights naming only absent strata -> empty result, no crash
    assert mix_to_weights(df, "src", {"zz": 1}, "id").count() == 0


def test_weighted_sample(spark):
    import pytest
    from krnel_graph_spark.functions.sampling import weighted_sample

    rows = [(i, 1.0 if i < 90 else 1000.0) for i in range(100)]
    rows += [(200, None), (201, 0.0), (202, -3.0)]  # excluded
    df = spark.createDataFrame(rows, "id long, w double")

    out = weighted_sample(df, "w", 20, "id", seed=3)
    ids = [r["id"] for r in out.collect()]
    assert len(ids) == len(set(ids)) == 20
    assert not {200, 201, 202} & set(ids)
    # the 10 heavy rows (1000x weight) should essentially always win slots
    heavy = sum(1 for i in ids if 90 <= i < 100)
    assert heavy == 10
    # deterministic across invocations and partitionings
    ids2 = [
        r["id"]
        for r in weighted_sample(
            df.repartition(7), "w", 20, "id", seed=3
        ).collect()
    ]
    assert sorted(ids) == sorted(ids2)
    # different seed -> (almost surely) different light-row picks
    ids3 = [r["id"] for r in weighted_sample(df, "w", 20, "id", seed=4).collect()]
    assert sorted(ids3) != sorted(ids)
    with pytest.raises(ValueError):
        weighted_sample(df, "w", 0, "id")
    # plan: TakeOrderedAndProject, no full sort-exchange
    plan = (
        weighted_sample(df, "w", 20, "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
