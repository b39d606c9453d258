"""Funnel / retention / RRF: semantics pins + a pure-pandas differential.

The funnel differential reimplements the greedy windowFunnel contract
(anchor at earliest first-step event; each later step = earliest event of
that type strictly after the previous match, within the horizon) in plain
Python over randomized event logs, so the single-shuffle Spark aggregate
fold is checked against an independent oracle — not against itself.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from krnel_graph_spark.functions.behavior import (
    funnel,
    funnel_conversion,
    funnel_stages,
    retention_cohorts,
    rrf_fuse,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _events(spark, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    return spark.createDataFrame(pdf)


def _greedy_stage(evs, steps, within=None):
    """Reference implementation: evs = [(ts, type)] for ONE user."""
    evs = sorted(evs)
    stage, anchor, cur = 0, None, None
    for t, y in evs:
        if stage >= len(steps) or y != steps[stage]:
            continue
        if stage > 0 and not (t > cur):
            continue
        if stage > 0 and within is not None and t > anchor + dt.timedelta(seconds=within):
            continue
        stage += 1
        anchor = t if stage == 1 else anchor
        cur = t
    return stage


def test_funnel_basic_semantics(spark):
    s = ["a", "b", "c"]
    rows = [
        # u1 completes in order
        (1, T0, "a"), (1, T0 + dt.timedelta(hours=1), "b"),
        (1, T0 + dt.timedelta(hours=2), "c"),
        # u2: c before b -> stalls at stage 1 until a later b; no c after
        (2, T0, "a"), (2, T0 + dt.timedelta(hours=1), "c"),
        (2, T0 + dt.timedelta(hours=2), "b"),
        # u3: never does step a -> stage 0
        (3, T0, "b"), (3, T0 + dt.timedelta(hours=1), "c"),
    ]
    out = funnel(_events(spark, rows), s, ts_col="ts").toPandas()
    assert out["step"].tolist() == ["a", "b", "c"]
    assert out["users"].tolist() == [2, 2, 1]

    st = {
        r["user"]: r["stage"]
        for r in funnel_stages(_events(spark, rows), s, ts_col="ts").collect()
    }
    assert st == {1: 3, 2: 2, 3: 0}


def test_funnel_within_horizon(spark):
    s = ["a", "b"]
    rows = [
        # u1: b lands 2h after anchor — outside a 1h horizon
        (1, T0, "a"), (1, T0 + dt.timedelta(hours=2), "b"),
        # u2: inside
        (2, T0, "a"), (2, T0 + dt.timedelta(minutes=30), "b"),
    ]
    out = funnel(_events(spark, rows), s, within=3600).toPandas()
    assert out["users"].tolist() == [2, 1]
    # without the horizon both convert
    out2 = funnel(_events(spark, rows), s).toPandas()
    assert out2["users"].tolist() == [2, 2]


def test_funnel_strictly_after(spark):
    # step-2 event at the exact same timestamp as step 1 must NOT count
    rows = [(1, T0, "a"), (1, T0, "b")]
    out = funnel(_events(spark, rows), ["a", "b"]).toPandas()
    assert out["users"].tolist() == [1, 0]


def test_funnel_greedy_not_optimal_pin(spark):
    """Greedy anchors at the EARLIEST first-step event even when a later
    anchor would convert — the documented windowFunnel contract."""
    rows = [
        (1, T0, "a"),                                   # greedy anchor
        (1, T0 + dt.timedelta(hours=10), "a"),          # better anchor, unused
        (1, T0 + dt.timedelta(hours=10, minutes=30), "b"),
    ]
    out = funnel(_events(spark, rows), ["a", "b"], within=3600).toPandas()
    assert out["users"].tolist() == [1, 0]


def test_funnel_differential_random(spark):
    rng = random.Random(417)
    steps = ["s1", "s2", "s3", "s4"]
    types = steps + ["noise"]
    rows = []
    for u in range(60):
        for _ in range(rng.randint(0, 25)):
            rows.append(
                (
                    u,
                    T0 + dt.timedelta(seconds=rng.randint(0, 14 * 86400)),
                    rng.choice(types),
                )
            )
    for within in (None, 86400, 3 * 86400):
        got = {
            r["user"]: r["stage"]
            for r in funnel_stages(
                _events(spark, rows), steps, within=within
            ).collect()
        }
        per_user: dict[int, list] = {}
        for u, t, y in rows:
            if y in steps:
                per_user.setdefault(u, []).append((t, y))
        want = {
            u: _greedy_stage(evs, steps, within) for u, evs in per_user.items()
        }
        assert got == want, f"within={within}"
        # summary counts must be the stage histogram's tail sums
        summ = funnel(
            _events(spark, rows), steps, within=within
        ).toPandas()
        for i in range(len(steps)):
            assert summ["users"][i] == sum(
                1 for v in want.values() if v >= i + 1
            )


def test_funnel_conversion(spark):
    rows = [
        # u1: a -> b after 100s, c after 300s total
        (1, T0, "a"),
        (1, T0 + dt.timedelta(seconds=100), "b"),
        (1, T0 + dt.timedelta(seconds=300), "c"),
        # u2: a -> b after 200s, never c
        (2, T0, "a"),
        (2, T0 + dt.timedelta(seconds=200), "b"),
        # u3: only a
        (3, T0, "a"),
    ]
    out = funnel_conversion(_events(spark, rows), ["a", "b", "c"]).toPandas()
    assert out["step"].tolist() == ["a", "b", "c"]
    assert out["users"].tolist() == [3, 2, 1]
    assert out["mean_s_from_anchor"].tolist() == pytest.approx(
        [0.0, 150.0, 300.0]
    )
    # unreached steps emit no row
    out2 = funnel_conversion(_events(spark, rows), ["a", "c", "b"]).toPandas()
    # u1: a@0 -> c@300; no b after 300 -> step "b" has no reachers, no row
    assert out2["step"].tolist() == ["a", "c"]
    assert out2["users"].tolist() == [3, 1]
    rows3 = [(1, T0, "a")]
    out3 = funnel_conversion(_events(spark, rows3), ["a", "b"]).toPandas()
    assert out3["step"].tolist() == ["a"]
    assert out3["mean_s_from_anchor"].tolist() == [0.0]


def test_funnel_validation(spark):
    df = _events(spark, [(1, T0, "a")])
    with pytest.raises(ValueError):
        funnel(df, ["a"])
    with pytest.raises(ValueError):
        funnel(df, ["a", "a"])


def test_retention_cohorts(spark):
    monday = dt.datetime(2024, 3, 4, 9, 0)  # a Monday
    rows = [
        (1, monday, "x"),
        (1, monday + dt.timedelta(days=8), "x"),   # week 1
        (1, monday + dt.timedelta(days=21), "x"),  # week 3
        (2, monday + dt.timedelta(days=2), "x"),   # same cohort, week 0 only
        (3, monday + dt.timedelta(days=7), "x"),   # next cohort
        (3, monday + dt.timedelta(days=13), "x"),  # still offset 0
    ]
    out = retention_cohorts(_events(spark, rows)).toPandas()
    got = {
        (str(r.cohort_week), int(r.week_offset)): int(r.n_users)
        for r in out.itertuples()
    }
    assert got == {
        ("2024-03-04", 0): 2,
        ("2024-03-04", 1): 1,
        ("2024-03-04", 3): 1,
        ("2024-03-11", 0): 1,
    }


def test_retention_daily_granularity(spark):
    monday = dt.datetime(2024, 3, 4, 9, 0)
    rows = [
        (1, monday, "x"),
        (1, monday + dt.timedelta(days=2), "x"),   # day offset 2
        (2, monday + dt.timedelta(days=1), "x"),   # next cohort, offset 0
    ]
    out = retention_cohorts(_events(spark, rows), granularity="day").toPandas()
    got = {
        (str(r.cohort_week), int(r.week_offset)): int(r.n_users)
        for r in out.itertuples()
    }
    assert got == {
        ("2024-03-04", 0): 1,
        ("2024-03-04", 2): 1,
        ("2024-03-05", 0): 1,
    }
    with pytest.raises(ValueError):
        retention_cohorts(_events(spark, rows), granularity="month")


def test_event_transitions(spark):
    from krnel_graph_spark.functions.behavior import event_transitions

    rows = [
        (1, T0, "a"), (1, T0 + dt.timedelta(seconds=1), "b"),
        (1, T0 + dt.timedelta(seconds=2), "a"),
        (2, T0, "b"), (2, T0 + dt.timedelta(seconds=1), "b"),
        (3, T0, "a"),  # single event: no transition
    ]
    out = event_transitions(_events(spark, rows)).toPandas()
    got = {
        (r.from_type, r.to_type): r.n for r in out.itertuples()
    }
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}
    # deterministic tiebreak on colliding timestamps via order_cols
    pdf = pd.DataFrame(
        [(1, T0, 1, "x"), (1, T0, 2, "y"), (1, T0, 3, "z")],
        columns=["user_id", "ts", "eid", "event_type"],
    )
    df = spark.createDataFrame(pdf)
    out2 = event_transitions(df, order_cols=["eid"]).toPandas()
    got2 = {(r.from_type, r.to_type): r.n for r in out2.itertuples()}
    assert got2 == {("x", "y"): 1, ("y", "z"): 1}


def test_rrf_fuse(spark):
    a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)], "id long, s double")
    b = spark.createDataFrame([(2, 0.9), (4, 0.8)], "id long, t double")
    out = rrf_fuse([a, b], "id", ["s", "t"], k=60).toPandas()
    # id 2: rank 2 in a, rank 1 in b -> 1/62 + 1/61 (largest)
    assert out["id"].tolist()[0] == 2
    assert out.set_index("id")["n_lists"].to_dict() == {1: 1, 2: 2, 3: 1, 4: 1}
    two = out.set_index("id")["rrf_score"][2]
    assert two == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)
    # deterministic tie-break: equal scores rank by id asc
    c = spark.createDataFrame([(7, 1.0), (5, 1.0)], "id long, s double")
    d = spark.createDataFrame([(5, 2.0), (7, 1.0)], "id long, t double")
    o2 = rrf_fuse([c, d], "id", ["s", "t"], k=60).toPandas()
    # in c, ids 5 and 7 tie at 1.0 -> id asc gives 5 rank 1, 7 rank 2
    assert o2.set_index("id")["rrf_score"][5] == pytest.approx(
        1 / 61 + 1 / 61, abs=1e-6
    )
    assert o2.set_index("id")["rrf_score"][7] == pytest.approx(
        1 / 62 + 1 / 62, abs=1e-6
    )
    with pytest.raises(ValueError):
        rrf_fuse([a], "id", ["s"])
    with pytest.raises(ValueError):
        rrf_fuse([a, b], "id", ["s"])


def test_funnel_single_shuffle_plan(spark):
    """The funnel fold must not contain per-step joins: exactly one
    exchange below the final counter aggregation (the user groupBy)."""
    rows = [(1, T0, "a"), (1, T0 + dt.timedelta(hours=1), "b")]
    plan = funnel_stages(
        _events(spark, rows), ["a", "b"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_rrf_fuse_bounded_input_guard(spark):
    """The top-k-lists contract is enforced at runtime (r7): an input over
    max_list_rows raises instead of running a single-partition corpus
    sort; raising the bound (or None) restores the old behavior."""
    a = spark.range(30).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("s")
    )
    b = spark.range(30).select(
        F.col("id"), (F.col("id") * 3).cast("double").alias("t")
    )
    with pytest.raises(ValueError, match="max_list_rows"):
        rrf_fuse([a, b], "id", ["s", "t"], max_list_rows=10)
    assert rrf_fuse([a, b], "id", ["s", "t"], max_list_rows=30).count() == 30
    assert rrf_fuse([a, b], "id", ["s", "t"], max_list_rows=None).count() == 30


# --------------------------------------------------------------------- #
# ewma_smooth
# --------------------------------------------------------------------- #


def _ewma_ref(rows, alpha=0.3):
    """Pure-Python mirror: same (ts, id) order, raw double recurrence."""
    out = {}
    state = {}
    for u, _ts, eid, v in sorted(rows):
        e = v if u not in state else alpha * v + (1.0 - alpha) * state[u]
        state[u] = e
        out[eid] = e
    return out


def test_ewma_smooth_differential(spark):
    from krnel_graph_spark.functions.behavior import ewma_smooth

    import random

    rng = random.Random(3)
    rows = [
        (u, i, u * 1000 + i, round(rng.uniform(0, 100), 2))
        for u in range(5)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        [(u, f"2024-01-01 00:00:{i:02d}", eid, v) for u, i, eid, v in rows],
        "user_id long, ts string, event_id long, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma_smooth(
            df, "user_id", "ts", "value", "event_id"
        ).collect()
    }
    want = _ewma_ref([(u, i, eid, v) for u, i, eid, v in rows])
    assert len(got) == len(want) == 200
    # raw-double recurrence in fixed order -> bit-identical
    assert all(got[k] == want[k] for k in want)


def test_ewma_smooth_tie_break_and_cap(spark):
    from krnel_graph_spark.functions.behavior import ewma_smooth

    # Two events share a timestamp: event_id must break the tie.
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, 4.0),
            (1, "2024-01-01 00:00:00", 11, 8.0),
            (1, "2024-01-01 00:00:01", 12, 0.0),
        ],
        "user_id long, ts string, event_id long, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma_smooth(
            df, "user_id", "ts", "value", "event_id", alpha=0.5
        ).collect()
    }
    assert got[10] == 4.0
    assert got[11] == 0.5 * 8.0 + 0.5 * 4.0
    assert got[12] == 0.5 * 0.0 + 0.5 * got[11]

    capped = ewma_smooth(
        df, "user_id", "ts", "value", "event_id", alpha=0.5,
        max_events_per_user=2,
    ).collect()
    assert sorted(r["event_id"] for r in capped) == [10, 11]
