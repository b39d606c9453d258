"""``upsert_parquet`` (SCD-1 merge) tests: replace/insert/pass-through
semantics, tombstone deletes, composite keys, schema mismatch errors, and
the CLI subcommand.
"""

from __future__ import annotations

import json

import pytest

from krnel_graph_spark.functions.partitioning import upsert_parquet


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)


def test_replace_insert_passthrough(spark, tmp_path):
    tgt = str(tmp_path / "tgt")
    dst = str(tmp_path / "dst")
    _write(spark, tgt, [(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    updates = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "id long, v string"
    )
    stats = upsert_parquet(spark, tgt, updates, "id", dst)
    got = {(r["id"], r["v"]) for r in spark.read.parquet(dst).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}
    assert stats == {
        "rows_before": 3,
        "rows_upserted": 2,
        "rows_deleted": 0,
        "rows_after": 4,
    }


def test_tombstones(spark, tmp_path):
    tgt = str(tmp_path / "tgt")
    dst = str(tmp_path / "dst")
    _write(spark, tgt, [(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    updates = spark.createDataFrame(
        [(1, "A1", False), (3, None, True), (9, None, True)],
        "id long, v string, deleted boolean",
    )
    stats = upsert_parquet(
        spark, tgt, updates, "id", dst, delete_col="deleted"
    )
    got = {(r["id"], r["v"]) for r in spark.read.parquet(dst).collect()}
    assert got == {(1, "A1"), (2, "b")}
    assert stats["rows_deleted"] == 2 and stats["rows_after"] == 2


def test_composite_keys(spark, tmp_path):
    tgt = str(tmp_path / "tgt")
    dst = str(tmp_path / "dst")
    _write(
        spark,
        tgt,
        [(1, "x", 10.0), (1, "y", 20.0), (2, "x", 30.0)],
        "a long, b string, v double",
    )
    updates = spark.createDataFrame(
        [(1, "y", 99.0)], "a long, b string, v double"
    )
    upsert_parquet(spark, tgt, updates, ["a", "b"], dst)
    got = {
        (r["a"], r["b"], r["v"]) for r in spark.read.parquet(dst).collect()
    }
    assert got == {(1, "x", 10.0), (1, "y", 99.0), (2, "x", 30.0)}


def test_schema_mismatch_raises(spark, tmp_path):
    tgt = str(tmp_path / "tgt")
    _write(spark, tgt, [(1, "a")], "id long, v string")
    updates = spark.createDataFrame([(1, "a", 0)], "id long, v string, extra int")
    with pytest.raises(ValueError, match="columns"):
        upsert_parquet(spark, tgt, updates, "id", str(tmp_path / "dst"))


def test_cli_upsert(spark, tmp_path, capsys):
    from krnel_graph_spark.cli import main

    tgt = str(tmp_path / "tgt")
    upd = str(tmp_path / "upd")
    dst = str(tmp_path / "dst")
    _write(spark, tgt, [(1, "a"), (2, "b")], "id long, v string")
    _write(spark, upd, [(2, "B")], "id long, v string")
    rc = main(["upsert", tgt, upd, dst, "id"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_after"] == 2
    got = {(r["id"], r["v"]) for r in spark.read.parquet(dst).collect()}
    assert got == {(1, "a"), (2, "B")}


def test_snapshot_diff_statuses(spark):
    from krnel_graph_spark.functions.partitioning import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "id long, v string, n int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", None), (5, "e", 50)],
        "id long, v string, n int",
    )
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id").collect()}
    assert got == {1: "same", 2: "changed", 3: "same", 4: "removed", 5: "added"}


def test_snapshot_diff_null_vs_string_null(spark):
    """A real 'null' string and a NULL must hash differently."""
    from krnel_graph_spark.functions.partitioning import snapshot_diff

    old = spark.createDataFrame([(1, None)], "id long, v string")
    new = spark.createDataFrame([(1, "null")], "id long, v string")
    [r] = snapshot_diff(old, new, "id").collect()
    assert r["status"] == "changed"


def test_snapshot_diff_schema_mismatch(spark):
    import pytest as _pytest

    from krnel_graph_spark.functions.partitioning import snapshot_diff

    old = spark.createDataFrame([(1, "a")], "id long, v string")
    new = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError):
        snapshot_diff(old, new, "id")


def test_cli_table_diff(spark, tmp_path, capsys):
    import json

    from krnel_graph_spark.cli import main

    old = str(tmp_path / "old")
    new = str(tmp_path / "new")
    _write(spark, old, [(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    _write(spark, new, [(1, "a"), (2, "B"), (4, "d")], "id long, v string")
    out = str(tmp_path / "diffout")
    rc = main(["table-diff", old, new, "id", "--out", out])
    assert rc == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counts == {"added": 1, "removed": 1, "changed": 1, "same": 1}
    table = {
        r["id"]: r["status"] for r in spark.read.parquet(out).collect()
    }
    assert table == {1: "same", 2: "changed", 3: "removed", 4: "added"}
