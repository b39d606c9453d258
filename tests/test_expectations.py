"""Data-quality expectations: single-pass rule evaluation, three-valued
logic (NULL = violation), and the quarantine split invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions.expectations import expect_rules, quarantine

RULES = {"v_pos": "v > 0", "v_small": "v < 10", "k_not_null": "k IS NOT NULL"}


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [(1, 5.0), (2, -3.0), (3, 42.0), (None, 7.0), (5, None)],
        "k int, v double",
    )


def test_expect_rules_counts_and_null_semantics(spark, frame):
    got = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in expect_rules(frame, RULES).collect()
    }
    # NULL v fails BOTH value rules (unknown is not satisfied).
    assert got["v_pos"] == (5, 2, False)      # -3 and NULL
    assert got["v_small"] == (5, 2, False)    # 42 and NULL
    assert got["k_not_null"] == (5, 1, False)
    all_pass = expect_rules(frame, {"any": "v IS NOT NULL OR v IS NULL"})
    assert all_pass.first()["passed"] is True


def test_expect_rules_single_aggregate_pass(spark, frame):
    plan = (
        expect_rules(frame, RULES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # One scan feeding one aggregate chain -- rules never add scans.
    assert plan.count("Scan ") <= 1


def test_expect_rules_empty_rules_raises(spark, frame):
    with pytest.raises(ValueError):
        expect_rules(frame, {})


def test_quarantine_partition_and_audit_trail(spark, frame):
    clean, bad = quarantine(frame, RULES)
    c = clean.collect()
    b = bad.collect()
    # Exact partition: every row lands on exactly one side.
    assert len(c) + len(b) == 5
    assert {r["k"] for r in c} == {1}
    audit = {r["k"]: sorted(r["__failed_rules"]) for r in b}
    assert audit[2] == ["v_pos"]
    assert audit[3] == ["v_small"]
    assert audit[None] == ["k_not_null"]
    assert audit[5] == ["v_pos", "v_small"]  # NULL v fails both
    # clean frame carries no audit column
    assert "__failed_rules" not in clean.columns
