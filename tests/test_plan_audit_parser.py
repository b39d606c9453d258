"""Unit-pin tools/audit_plans.read_schema_widths — the scans[widths]
column of PLANS.md is the audit signal for unpruned scans; the r10 judge
found it over-reporting (19 columns for a pruned 5-column lineitem read)
because the old regex swallowed following plan lines on truncated
schemas and miscounted commas inside nested types."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from audit_plans import read_schema_widths  # noqa: E402


def test_flat_schema():
    plan = "FileScan parquet ... ReadSchema: struct<a:bigint,b:string,c:double>"
    assert read_schema_widths(plan) == [3]


def test_nested_types_count_as_one_field_each():
    plan = (
        "ReadSchema: struct<a:string,b:struct<x:int,y:int>,"
        "c:array<struct<p:int,q:array<int>>>,d:map<string,int>>"
    )
    assert read_schema_widths(plan) == [4]


def test_truncated_schema_does_not_swallow_next_lines():
    # Spark truncation: no closing '>' on the ReadSchema line; commas on
    # later lines (e.g. a PushedFilters list) must NOT count as columns.
    plan = (
        "FileScan parquet [l_orderkey,l_quantity] "
        "ReadSchema: struct<l_orderkey:bigint,l_quantity:dou\n"
        "PushedFilters: [IsNotNull(a), GreaterThan(b, 1), In(c, [x,y,z])]\n"
        "ReadSchema: struct<n_nationkey:bigint,n_name:string>"
    )
    assert read_schema_widths(plan) == [2, 2]


def test_more_fields_marker_is_honored():
    plan = "ReadSchema: struct<a:int,b:int,c:int... 4 more fields>"
    assert read_schema_widths(plan) == [7]


def test_empty_and_multiple_scans():
    plan = (
        "ReadSchema: struct<>\n"
        "something else entirely\n"
        "ReadSchema: struct<a:int>"
    )
    assert read_schema_widths(plan) == [0, 1]


def test_real_plan_widths_match_projection(spark):
    # End-to-end: a 2-column projection over a 33-column-ish table must
    # report exactly the projected width, not the full schema.
    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .filter("l_quantity > 10")
    )
    from audit_plans import audit

    a = audit(df)
    assert a["scan_cols"] == [2]
    assert a["pushed"]
