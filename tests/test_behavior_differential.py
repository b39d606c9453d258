"""Property-style differentials for the behavior-analytics operators.

Each operator is re-implemented in plain pandas/python here — an
independent formulation of the same contract — and compared against the
Spark result on randomized event logs (seeds pinned). This is the same
strategy `test_asof_differential.py` / `test_text_differential.py` use:
the oracle-SQL gate proves one fixed query; these prove the SEMANTICS
across many random inputs (r5 verdict item 7).
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from krnel_graph_spark.functions.behavior import (
    funnel,
    funnel_stages,
    retention_cohorts,
    rrf_fuse,
)

STEPS = ["signup", "view", "click", "purchase"]
EVENT_TYPES = STEPS + ["scroll", "logout"]
BASE = dt.datetime(2024, 3, 1)


def _random_log(seed: int, n_users: int = 1000, max_events: int = 12) -> pd.DataFrame:
    """Random event log: per-user random event streams with second-level
    timestamps (collisions across users are common; within a user the
    sampled offsets are deduplicated so event order is well-defined)."""
    rng = np.random.RandomState(seed)
    rows = []
    for u in range(n_users):
        n = rng.randint(1, max_events + 1)
        offs = np.unique(rng.randint(0, 40 * 86400, size=n))
        types = rng.choice(EVENT_TYPES, size=len(offs))
        for o, ty in zip(offs, types):
            rows.append((u, ty, BASE + dt.timedelta(seconds=int(o))))
    return pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])


def _pandas_funnel_stage(g: pd.DataFrame, steps, within_s) -> int:
    """Greedy windowFunnel on one user's events — an event-at-a-time
    restatement of the contract, independent of the Spark fold."""
    s, anchor, cur = 0, None, None
    for _, r in g.sort_values(["ts", "event_type"]).iterrows():
        if s >= len(steps) or r.event_type != steps[s]:
            continue
        if s > 0 and not (r.ts > cur):
            continue
        if s > 0 and within_s is not None and (
            r.ts - anchor
        ).total_seconds() > within_s:
            continue
        s += 1
        anchor = r.ts if s == 1 else anchor
        cur = r.ts
    return s


@pytest.mark.parametrize("seed,within", [(1, None), (2, 86400 * 3), (3, 3600)])
def test_funnel_differential(spark, seed, within):
    pdf = _random_log(seed)
    sdf = spark.createDataFrame(pdf)

    stages = {
        r["user"]: r["stage"]
        for r in funnel_stages(sdf, STEPS, within=within).collect()
    }
    expected_counts = [0] * len(STEPS)
    for u, g in pdf.groupby("user_id"):
        s = _pandas_funnel_stage(g, STEPS, within)
        assert stages.get(u, 0) == s, f"user {u}: spark {stages.get(u)} != {s}"
        for i in range(s):
            expected_counts[i] += 1

    got = funnel(sdf, STEPS, within=within).collect()
    assert [r["users"] for r in got] == expected_counts
    assert [r["step"] for r in got] == STEPS


@pytest.mark.parametrize("seed,granularity", [(11, "week"), (12, "day")])
def test_retention_differential(spark, seed, granularity):
    pdf = _random_log(seed, n_users=400)
    sdf = spark.createDataFrame(pdf)

    stride = {"week": 7, "day": 1}[granularity]

    def trunc(ts: pd.Timestamp) -> dt.date:
        d = ts.date()
        if granularity == "week":
            d = d - dt.timedelta(days=d.weekday())  # ISO Monday, as date_trunc
        return d

    expected: dict[tuple, int] = {}
    for _, g in pdf.groupby("user_id"):
        cohort = trunc(g.ts.min())
        for w in {trunc(t) for t in g.ts}:
            off = (w - cohort).days // stride
            expected[(cohort, off)] = expected.get((cohort, off), 0) + 1

    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(sdf, granularity=granularity).collect()
    }
    assert got == expected


def test_rrf_differential(spark):
    rng = np.random.RandomState(99)
    n = 80
    a = pd.DataFrame({"id": np.arange(n), "score_a": rng.rand(n)})
    b = pd.DataFrame({"id": rng.permutation(n * 2)[:n], "score_b": rng.rand(n)})
    k = 60

    def ranks(pdf, sc):
        ordered = pdf.sort_values([sc, "id"], ascending=[False, True])
        return {i: r + 1 for r, i in enumerate(ordered["id"])}

    ra, rb = ranks(a, "score_a"), ranks(b, "score_b")
    # Mirror the engine's op order: each term decimal-rounded to 10 places
    # BEFORE the sum, round-6 after — with HALF_UP at both steps, as Spark
    # (and SQL) rounds decimals; Python's round() is banker's and differs
    # on exact ties like 1/128 = 0.0078125.
    from decimal import ROUND_HALF_UP, Decimal

    def dround(x: float, places: int) -> Decimal:
        return Decimal(x).quantize(Decimal(1).scaleb(-places), ROUND_HALF_UP)

    expected = {}
    for i in set(ra) | set(rb):
        contribs = [dround(1.0 / (k + r[i]), 10) for r in (ra, rb) if i in r]
        expected[int(i)] = (float(dround(float(sum(contribs)), 6)), len(contribs))

    got = rrf_fuse(
        [spark.createDataFrame(a), spark.createDataFrame(b)],
        "id",
        ["score_a", "score_b"],
        k=k,
    ).collect()
    assert {r["id"]: (r["rrf_score"], r["n_lists"]) for r in got} == expected
    # output ordering contract: fused score desc, id asc
    keys = [(-r["rrf_score"], r["id"]) for r in got]
    assert keys == sorted(keys)


def test_funnel_hot_user_capped(spark):
    """Skew guard: a bot with far more events than the cap must not change
    other users' results, and its own stage comes from its earliest
    events (the greedy prefix)."""
    normal = _random_log(7, n_users=50)
    bot_ts = [BASE + dt.timedelta(seconds=i) for i in range(3000)]
    # The cap counts FUNNEL-TYPE events (non-funnel types are filtered
    # before it), so the bot floods with a funnel type.
    bot = pd.DataFrame(
        {
            "user_id": 10_000,
            "event_type": ["view"] * 2999 + ["signup"],
            "ts": bot_ts,
        }
    )
    pdf = pd.concat([normal, bot], ignore_index=True)
    sdf = spark.createDataFrame(pdf)

    capped = {
        r["user"]: r["stage"]
        for r in funnel_stages(sdf, STEPS, max_events_per_user=100).collect()
    }
    uncapped = {
        r["user"]: r["stage"]
        for r in funnel_stages(sdf, STEPS, max_events_per_user=None).collect()
    }
    for u in range(50):
        assert capped.get(u, 0) == uncapped.get(u, 0)
    # bot's signup is its 3000th event — beyond the cap — so the capped
    # run sees only pre-signup events; uncapped reaches stage 1.
    assert capped[10_000] == 0 and uncapped[10_000] == 1


def test_funnel_step_names_with_quotes(spark):
    """Step names ride as parameterized literals (r5 advice): quotes and
    backslashes in a step name must not break or alter the plan."""
    import pandas as pd

    steps = ["it's a start", 'then "this"', "end\\done"]
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "event_type": [steps[0], steps[1], steps[2], steps[0]],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:01",
                 "2024-01-01 00:02", "2024-01-01 00:00"]
            ),
        }
    )
    got = funnel(spark.createDataFrame(pdf), steps).collect()
    assert [r["step"] for r in got] == steps
    assert [r["users"] for r in got] == [2, 1, 1]


def test_session_cooccurrence_differential(spark):
    """Pandas reimplementation differential on a random log: gap-based
    session split, set-semantics pair counting."""
    from krnel_graph_spark.functions.behavior import session_cooccurrence

    pdf = _random_log(31, n_users=200, max_events=10)
    pdf["event_id"] = range(len(pdf))
    gap = 6 * 3600

    expected: dict[tuple, int] = {}
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        sess, last = 0, None
        sessions: dict[int, set] = {}
        for _, r in g.iterrows():
            if last is not None and (r.ts - last).total_seconds() > gap:
                sess += 1
            last = r.ts
            sessions.setdefault(sess, set()).add(r.event_type)
        for types in sessions.values():
            for a in types:
                for b in types:
                    if a < b:
                        expected[(a, b)] = expected.get((a, b), 0) + 1

    got = {
        (r["type_a"], r["type_b"]): r["n_sessions"]
        for r in session_cooccurrence(
            spark.createDataFrame(pdf), gap=gap, order_cols=["event_id"]
        ).collect()
    }
    assert got == expected
