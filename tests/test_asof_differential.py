"""Differential test: asof_join vs the pandas ``merge_asof`` oracle.

``merge_asof(direction="backward", allow_exact_matches=True)`` implements
the same inclusive as-of semantics (latest right row with ``ts <= left.ts``
per key) the union+window plan claims, so random draws that agree with it
across seeds pin the implementation. Draw shapes deliberately include the
hard cases: equal-ts ties across sides, right rows with NULL values where
an earlier row was non-null (a per-column ``last(ignorenulls)`` bug would
resurrect the stale value), keys missing on either side, and a
TIMESTAMP_NTZ input (the dtype the driver's events parquet now carries).

Right-side (key, ts) pairs are drawn unique: when several right rows share
the exact key and timestamp, which one an as-of join attaches is
tie-ordering-dependent in any engine (pandas picks input order, Spark's
window picks an arbitrary equal-key order), so that case is out of the
contract, exactly as in the gate query which pre-aggregates right to
unique (user_id, ts).
"""

import math
import random

import pandas as pd
import pytest

from krnel_graph_spark.functions.relational import asof_join

N_KEYS = 6
TS_RANGE = 25  # small: forces plenty of cross-side ties


def _draw(seed: int):
    rng = random.Random(seed)
    left = [
        (rng.randrange(N_KEYS), rng.randrange(TS_RANGE), lid)
        for lid in range(rng.randrange(1, 60))
    ]
    right_pairs = set()
    while len(right_pairs) < rng.randrange(1, 60):
        right_pairs.add((rng.randrange(N_KEYS), rng.randrange(TS_RANGE)))
    right = [
        (
            k,
            ts,
            None if rng.random() < 0.3 else round(rng.uniform(-5, 5), 3),
            None if rng.random() < 0.3 else f"s{rng.randrange(10)}",
        )
        for (k, ts) in sorted(right_pairs)
    ]
    return left, right


def _oracle(left_rows, right_rows):
    lpdf = pd.DataFrame(left_rows, columns=["key", "ts", "lid"])
    rpdf = pd.DataFrame(right_rows, columns=["key", "ts", "val", "tag"])
    out = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("ts", kind="stable"),
        on="ts",
        by="key",
        direction="backward",
    )
    return out.sort_values("lid").reset_index(drop=True)


def _canon(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    return round(v, 6) if isinstance(v, float) else v


def _check(spark, left_rows, right_rows):
    ldf = spark.createDataFrame(left_rows, "key long, ts long, lid long")
    rdf = spark.createDataFrame(
        right_rows, "key long, ts long, val double, tag string"
    )
    got = (
        asof_join(ldf, rdf, on="key", value_cols=["val", "tag"])
        .orderBy("lid")
        .collect()
    )
    want = _oracle(left_rows, right_rows)
    assert len(got) == len(want)
    for row, (_, orow) in zip(got, want.iterrows()):
        assert row["lid"] == orow["lid"]
        assert _canon(row["val_asof"]) == _canon(
            None if pd.isna(orow["val"]) else float(orow["val"])
        ), f"lid={row['lid']} key={row['key']} ts={row['ts']}"
        assert _canon(row["tag_asof"]) == _canon(
            None if pd.isna(orow["tag"]) else orow["tag"]
        )


@pytest.mark.parametrize("seed", range(8))
def test_asof_matches_merge_asof(spark, seed):
    left, right = _draw(seed)
    _check(spark, left, right)


def test_asof_all_null_value_column(spark):
    """A matched right row whose value columns are ALL null must still
    attach (as nulls) — and unmatched lefts are nulls too."""
    left = [(0, 10, 0), (0, 1, 1), (1, 10, 2)]
    right = [(0, 5, None, None), (2, 1, 1.0, "x")]
    _check(spark, left, right)


def test_asof_equal_ts_is_inclusive(spark):
    """right.ts == left.ts matches (<=, DuckDB/kdb semantics)."""
    left = [(0, 5, 0)]
    right = [(0, 5, 1.5, "hit"), (0, 4, 9.0, "stale")]
    _check(spark, left, right)
    ldf = spark.createDataFrame(left, "key long, ts long, lid long")
    rdf = spark.createDataFrame(right, "key long, ts long, val double, tag string")
    row = asof_join(ldf, rdf, on="key", value_cols=["val", "tag"]).collect()[0]
    assert row["tag_asof"] == "hit"


def test_asof_ntz_timestamp_input(spark):
    """TIMESTAMP_NTZ event time (the driver's events.parquet dtype): after
    with_event_time normalization the join must agree with merge_asof on
    real datetimes."""
    from pyspark.sql import functions as F

    from krnel_graph_spark.streaming.events import with_event_time

    left, right = _draw(99)
    ldf = with_event_time(
        spark.createDataFrame(left, "key long, ts long, lid long").withColumn(
            "ts", F.timestamp_seconds("ts").cast("timestamp_ntz")
        )
    )
    rdf = with_event_time(
        spark.createDataFrame(
            right, "key long, ts long, val double, tag string"
        ).withColumn("ts", F.timestamp_seconds("ts").cast("timestamp_ntz"))
    )
    assert dict(ldf.dtypes)["ts"] == "timestamp"
    got = (
        asof_join(ldf, rdf, on="key", value_cols=["val", "tag"])
        .orderBy("lid")
        .collect()
    )
    want = _oracle(left, right)
    for row, (_, orow) in zip(got, want.iterrows()):
        assert _canon(row["val_asof"]) == _canon(
            None if pd.isna(orow["val"]) else float(orow["val"])
        )


@pytest.mark.parametrize("seed", range(4))
def test_interval_join_matches_pandas_oracle(spark, seed):
    """interval_join vs a pandas merge+filter oracle: every (left, right)
    pair with the same key and right.ts in [left.ts - W, left.ts] appears
    exactly once, inner-join semantics."""
    from krnel_graph_spark.streaming.events import interval_join

    from pyspark.sql import functions as F

    W = 5
    left, right = _draw(seed)
    # integer draws become real TIMESTAMPs (interval_join normalizes event
    # time for watermark compatibility, so raw bigints would be read as
    # epoch nanos)
    ldf = spark.createDataFrame(left, "key long, ts long, lid long").withColumn(
        "ts", F.timestamp_seconds("ts")
    )
    rdf = spark.createDataFrame(
        right, "key long, ts long, val double, tag string"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    got = sorted(
        (r["lid"], int(r["ts_r"].timestamp()), _canon(r["val_r"]))
        for r in interval_join(
            ldf, rdf, on="key", lookback=f"{W} seconds"
        ).collect()
    )

    lpdf = pd.DataFrame(left, columns=["key", "ts", "lid"])
    rpdf = pd.DataFrame(right, columns=["key", "ts", "val", "tag"])
    merged = lpdf.merge(rpdf, on="key", suffixes=("", "_r"))
    merged = merged[
        (merged["ts_r"] <= merged["ts"]) & (merged["ts_r"] >= merged["ts"] - W)
    ]
    want = sorted(
        (int(r["lid"]), int(r["ts_r"]),
         _canon(None if pd.isna(r["val"]) else float(r["val"])))
        for _, r in merged.iterrows()
    )
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_asof_composite_key_matches_merge_asof(spark, seed):
    """Composite (k1, k2) as-of keys against merge_asof(by=[k1, k2])."""
    rng = random.Random(1000 + seed)
    left = [
        (rng.randrange(3), rng.randrange(2), rng.randrange(TS_RANGE), lid)
        for lid in range(40)
    ]
    pairs = set()
    while len(pairs) < 40:
        pairs.add(
            (rng.randrange(3), rng.randrange(2), rng.randrange(TS_RANGE))
        )
    right = [
        (k1, k2, ts, round(rng.uniform(-5, 5), 3)) for (k1, k2, ts) in sorted(pairs)
    ]
    ldf = spark.createDataFrame(left, "k1 long, k2 long, ts long, lid long")
    rdf = spark.createDataFrame(right, "k1 long, k2 long, ts long, val double")
    got = (
        asof_join(ldf, rdf, on=["k1", "k2"], value_cols=["val"])
        .orderBy("lid")
        .collect()
    )
    lpdf = pd.DataFrame(left, columns=["k1", "k2", "ts", "lid"])
    rpdf = pd.DataFrame(right, columns=["k1", "k2", "ts", "val"])
    want = (
        pd.merge_asof(
            lpdf.sort_values("ts", kind="stable"),
            rpdf.sort_values("ts", kind="stable"),
            on="ts",
            by=["k1", "k2"],
            direction="backward",
        )
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for row, (_, orow) in zip(got, want.iterrows()):
        assert row["lid"] == orow["lid"]
        assert _canon(row["val_asof"]) == _canon(
            None if pd.isna(orow["val"]) else float(orow["val"])
        )
