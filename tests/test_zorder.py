"""Z-order layout tests: content preservation plus an actual
data-skipping measurement — per-output-file min/max stats must be tight
in BOTH z-ordered dimensions, where a linear sort is tight only in its
leading column. That multi-column skipping is the whole point of the
layout, so it's asserted, not assumed.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions.partitioning import write_zordered, zorder_key


@pytest.fixture(scope="module")
def xy_df(spark):
    # Two independent uniform dims: the adversarial case for linear sort.
    return (
        spark.range(100_000)
        .select(
            (F.hash(F.col("id").cast("string")) % 10_000).alias("x"),
            (F.hash(F.concat(F.lit("y"), F.col("id").cast("string"))) % 10_000)
            .alias("y"),
            F.col("id"),
        )
    )


def _coverage(path: str, col: str, n_probes: int = 64) -> float:
    """Average fraction of parquet files whose [min,max] for ``col``
    contains a probe point — the scan fraction a point query pays."""
    stats = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        stats.append((lo, hi))
    assert stats
    lo_all = min(s[0] for s in stats)
    hi_all = max(s[1] for s in stats)
    hits = 0
    for p in range(n_probes):
        probe = lo_all + (hi_all - lo_all) * (p + 0.5) / n_probes
        hits += sum(1 for lo, hi in stats if lo <= probe <= hi)
    return hits / (n_probes * len(stats))


def test_zorder_preserves_rows_and_prunes_both_dims(spark, xy_df, tmp_path):
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(xy_df, zpath, ["x", "y"], n_files=16)
    # Linear baseline: range-partition + sort on x only.
    (
        xy_df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # Content round-trips exactly (same multiset of rows).
    back = spark.read.parquet(zpath)
    assert back.count() == 100_000
    assert back.select(F.sum("x"), F.sum("y"), F.sum("id")).collect() == (
        xy_df.select(F.sum("x"), F.sum("y"), F.sum("id")).collect()
    )
    assert back.columns == ["x", "y", "id"]  # helper key is dropped

    zx, zy = _coverage(zpath, "x"), _coverage(zpath, "y")
    lx, ly = _coverage(lpath, "x"), _coverage(lpath, "y")
    # Linear sort: near-perfect on x, useless on y.
    assert lx < 0.2
    assert ly > 0.8
    # Z-order: real pruning on BOTH dims — each point probe touches a
    # minority of files in either dimension.
    assert zx < 0.5 and zy < 0.5
    # And y-skipping beats the linear layout by a wide margin.
    assert zy < ly / 2


def test_zorder_key_bounds_and_determinism(spark, xy_df):
    zdf, key = zorder_key(xy_df, ["x", "y"], bits=4)
    rows = zdf.select(F.min(key), F.max(key)).collect()[0]
    assert 0 <= rows[0] <= rows[1] < (1 << 8)  # 2 cols x 4 bits
    # Deterministic: same input -> identical keys on recompute.
    a = {r.id: r[key] for r in zdf.select("id", key).collect()}
    zdf2, _ = zorder_key(xy_df, ["x", "y"], bits=4)
    b = {r.id: r[key] for r in zdf2.select("id", key).collect()}
    assert a == b
