"""Compaction: many tiny files -> few target-sized files, zero row loss,
no shuffle in the plan (coalesce is a narrow dependency)."""

from __future__ import annotations

import glob

from krnel_graph_spark.functions.partitioning import compact_parquet


def test_compact_parquet(spark, tmp_path):
    src = str(tmp_path / "shattered")
    dst = str(tmp_path / "compacted")
    spark.range(50_000).selectExpr(
        "id", "id % 97 as k", "uuid() as payload"
    ).repartition(200).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 200

    stats = compact_parquet(spark, src, dst, target_file_bytes=1 << 20)
    n_out = len(glob.glob(f"{dst}/part-*.parquet"))
    assert stats["files_after"] == n_out
    assert n_out < 20  # ~2-3 MB of data at 1 MB target
    back = spark.read.parquet(dst)
    assert back.count() == 50_000
    assert back.selectExpr("sum(id)").collect()[0][0] == 49999 * 50000 // 2

    # narrow plan: no Exchange between the scan and the write
    plan = (
        spark.read.parquet(src)
        .coalesce(3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
