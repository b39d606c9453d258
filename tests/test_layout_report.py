"""layout_report: parquet footer auditing cross-checked against DuckDB's
parquet_metadata on multi-file, multi-row-group layouts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions.partitioning import layout_report

SRC = "/root/testdata/sf0.001/lineitem.parquet"


@pytest.fixture(scope="module")
def layout_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "li")
    (
        spark.read.parquet(SRC)
        .repartitionByRange(3, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        # tiny row groups -> several per file
        .option("parquet.block.size", 64 * 1024)
        .parquet(path)
    )
    return path


def test_layout_report_matches_duckdb_metadata(spark, layout_dir):
    got = (
        layout_report(spark, layout_dir, "l_orderkey", table="li")
        .orderBy("file", "row_group_id")
        .collect()
    )
    want = duckdb.sql(
        f"""
        SELECT substring(regexp_extract(file_name, '[^/]+$'), 1, 10) AS f,
               row_group_id, row_group_num_rows,
               stats_min_value, stats_max_value
        FROM parquet_metadata('{layout_dir}/*.parquet')
        WHERE path_in_schema = 'l_orderkey'
        ORDER BY f, row_group_id
        """
    ).fetchall()
    assert len(got) == len(want) >= 3  # 3 files, >= 1 group each
    for g, w in zip(got, want):
        assert (g["file"], g["row_group_id"], g["n_rows"]) == (
            w[0], w[1], w[2],
        )
        assert g["min_v"] == str(w[3]) and g["max_v"] == str(w[4])


def test_layout_report_shows_range_clustering(spark, layout_dir):
    """Range-partitioned + sorted layout must have NON-OVERLAPPING
    per-file key ranges — the property that makes footer pruning work."""
    rows = layout_report(spark, layout_dir, "l_orderkey").collect()
    per_file = {}
    for r in rows:
        lo, hi = per_file.get(r["file"], (10**18, -1))
        per_file[r["file"]] = (
            min(lo, int(r["min_v"])), max(hi, int(r["max_v"]))
        )
    spans = sorted(per_file.values())
    assert len(spans) == 3
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next


def test_layout_report_footers_only_no_shuffle(spark):
    df = layout_report(spark, SRC, "l_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1
