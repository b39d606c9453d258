"""CSV / JSON-lines sources and user-directed sinks (beyond-reference:
the reference reads only parquet + inline and writes only into its result
store — SURVEY §2.1)."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def csv_file(spark, tmp_path):
    p = str(tmp_path / "people.csv")
    spark.createDataFrame(
        [(1, "ann", 10.5), (2, "bob", -3.25), (3, "cy", 0.0)],
        "id long, name string, score double",
    ).coalesce(1).write.option("header", True).csv(p)
    return p


def test_csv_source_with_schema(lazy_runner, csv_file):
    ds = lazy_runner.from_csv(
        csv_file, schema="id long, name string, score double"
    )
    out = lazy_runner.to_pandas(ds)
    assert sorted(out["name"].tolist()) == ["ann", "bob", "cy"]
    assert out.dtypes["score"].kind == "f"


def test_csv_source_inferred(lazy_runner, csv_file):
    out = lazy_runner.to_pandas(lazy_runner.from_csv(csv_file))
    assert len(out) == 3
    # engine ops compose on top of the scan
    ds = lazy_runner.from_csv(csv_file)
    masked = ds.mask_rows(ds.col_categorical("name").is_in({"ann", "cy"}))
    assert sorted(lazy_runner.to_pandas(masked)["name"]) == ["ann", "cy"]


def test_json_lines_source(lazy_runner, spark, tmp_path):
    p = str(tmp_path / "rows.jsonl")
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "k long, v string"
    ).coalesce(1).write.json(p)
    out = lazy_runner.to_pandas(lazy_runner.from_json_lines(p))
    assert sorted(out["v"].tolist()) == ["x", "y"]


def test_csv_identity_is_content_based(lazy_runner, csv_file, tmp_path):
    ds1 = lazy_runner.from_csv(csv_file, schema="id long, name string, score double")
    # Same bytes at a different path → same uuid (path excluded from identity)
    import shutil

    p2 = str(tmp_path / "copy.csv")
    shutil.copytree(csv_file, p2)
    ds2 = lazy_runner.from_csv(p2, schema="id long, name string, score double")
    assert ds1.uuid == ds2.uuid
    # Different schema → different uuid
    ds3 = lazy_runner.from_csv(csv_file, schema="id long, name string, score string")
    assert ds3.uuid != ds1.uuid


def test_write_parquet_roundtrip(lazy_runner, tmp_path):
    ds = lazy_runner.from_inline_dataset({"a": [3, 1, 2], "b": ["z", "x", "y"]})
    out_path = str(tmp_path / "out.parquet")
    lazy_runner.write_parquet(ds, out_path, sort_by_row_id=True)
    back = lazy_runner.to_pandas(lazy_runner.from_parquet(out_path))
    assert back["a"].tolist() == [3, 1, 2]  # row-id order preserved


def test_write_csv_flattens_nested(lazy_runner, tmp_path):
    ds = lazy_runner.from_inline_dataset(
        {"v": [[1.0, 2.0], [3.0, 4.0]], "n": ["p", "q"]}
    )
    out_path = str(tmp_path / "out.csv")
    lazy_runner.write_csv(ds, out_path, sort_by_row_id=True)
    files = [f for f in os.listdir(out_path) if f.endswith(".csv")]
    text = "".join(open(os.path.join(out_path, f)).read() for f in files)
    assert "[1.0,2.0]" in text and '"p"' not in text.split("\n")[0]


def test_write_json_lines_roundtrip(lazy_runner, tmp_path):
    ds = lazy_runner.from_inline_dataset({"k": [1, 2], "v": ["a", "b"]})
    out_path = str(tmp_path / "out.jsonl")
    lazy_runner.write_json_lines(ds, out_path)
    back = lazy_runner.to_pandas(lazy_runner.from_json_lines(out_path))
    assert sorted(back["v"].tolist()) == ["a", "b"]


def test_sql_entry_point(lazy_runner):
    ds = lazy_runner.from_inline_dataset(
        {"k": ["a", "b", "a", "a"], "v": [1.0, 2.0, 3.0, 4.0]}
    )
    out = lazy_runner.sql(
        "SELECT k, count(*) AS n, sum(v) AS total FROM {d} GROUP BY k ORDER BY k",
        d=ds,
    ).collect()
    assert [(r["k"], r["n"], r["total"]) for r in out] == [
        ("a", 3, 8.0),
        ("b", 1, 2.0),
    ]


def test_sql_entry_joins_two_graphs(lazy_runner):
    left = lazy_runner.from_inline_dataset({"k": [1, 2], "x": ["p", "q"]})
    right = lazy_runner.from_inline_dataset({"k": [1, 2], "y": [10, 20]})
    out = lazy_runner.sql(
        "SELECT l.k, l.x, r.y FROM {l} l JOIN {r} r ON l.k = r.k ORDER BY l.k",
        l=left,
        r=right,
    ).collect()
    assert [(r["k"], r["x"], r["y"]) for r in out] == [(1, "p", 10), (2, "q", 20)]


def test_bucketed_tables_join_without_shuffle(lazy_runner):
    spark = lazy_runner.spark
    left = lazy_runner.from_inline_dataset(
        {"k": list(range(100)), "x": [float(i) for i in range(100)]}
    )
    right = lazy_runner.from_inline_dataset(
        {"k": list(range(100)), "y": [i * 2 for i in range(100)]}
    )
    try:
        lazy_runner.write_bucketed(left, "t_bleft", ["k"], num_buckets=8)
        lazy_runner.write_bucketed(right, "t_bright", ["k"], num_buckets=8)
        # Disable broadcast so the join would otherwise shuffle both sides.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_bleft").join(spark.table("t_bright"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hash" not in plan, plan[:800]
        assert joined.count() == 100
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_sink_translates_bounds_error(lazy_runner, tmp_path):
    import pytest as _pytest

    ds = lazy_runner.from_inline_dataset({"v": [[1.0, 2.0]]})
    bad = ds.col_vector("v").col(7)
    with _pytest.raises(IndexError):
        lazy_runner.write_parquet(bad, str(tmp_path / "bad.parquet"))


def test_orc_roundtrip(lazy_runner, spark, tmp_path):
    """ORC source/sink: engine-written ORC reads back row-identical
    (written row ids re-adopted), and engine ops compose on the scan."""
    p = str(tmp_path / "nation.orc")
    src = lazy_runner.from_parquet("/root/testdata/sf0.001/nation.parquet")
    lazy_runner.write_orc(src, p, sort_by_row_id=True)
    back = lazy_runner.from_orc(p)
    a = lazy_runner.to_pandas(src)
    b = lazy_runner.to_pandas(back)
    assert a.equals(b)
    masked = back.mask_rows(
        back.col_categorical("n_name").is_in({"NATION_1", "NATION_2"})
    )
    assert len(lazy_runner.to_pandas(masked)) == 2


# --------------------------------------------------------------------- #
# raw text lines source/sink                                              #
# --------------------------------------------------------------------- #


def test_text_roundtrip(runner, tmp_path):
    ds = runner.from_inline_dataset(
        {"doc": ["alpha beta", "gamma", "delta epsilon zeta"]}
    )
    path = str(tmp_path / "lines.txt")
    runner.write_text(ds, path, column="doc", sort_by_row_id=True)
    back = runner.from_text(path, column="doc")
    got = runner.to_pandas(back)["doc"].tolist()
    assert got == ["alpha beta", "gamma", "delta epsilon zeta"]


def test_text_column_in_identity(runner, tmp_path):
    ds = runner.from_inline_dataset({"doc": ["x"]})
    path = str(tmp_path / "l.txt")
    runner.write_text(ds, path, column="doc")
    a = runner.from_text(path, column="text")
    b = runner.from_text(path, column="line")
    assert a.uuid != b.uuid
    assert runner.to_pandas(b).columns.tolist()[-1] == "line"
