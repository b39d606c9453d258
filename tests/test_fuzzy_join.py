"""fuzzy_join: blocked Levenshtein pairs vs a brute-force reference."""

from __future__ import annotations

import random

import pytest

from krnel_graph_spark.functions.dedup import fuzzy_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


WORDS = ["spark", "spork", "sparky", "shark", "quartz", "quart", "banana"]


@pytest.fixture()
def names(spark):
    rng = random.Random(11)
    rows = [
        (i, rng.choice("AB"), rng.choice(WORDS) + rng.choice(["", "s", "x"]))
        for i in range(40)
    ]
    return rows, spark.createDataFrame(rows, "id long, blk string, key string")


def test_fuzzy_self_pairs_matches_bruteforce(names):
    rows, df = names
    out = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_join(
            df, df, "key", "id", ["blk"], max_dist=2, self_pairs=True
        ).collect()
    }
    want = {}
    for i, (ia, ba, ka) in enumerate(rows):
        for ib, bb, kb in rows[i + 1 :]:
            if ba == bb and _lev(ka, kb) <= 2:
                lo, hi = min(ia, ib), max(ia, ib)
                want[(lo, hi)] = _lev(ka, kb)
    assert out == want
    assert want  # fixture must actually produce pairs


def test_fuzzy_two_table_and_validation(spark, names):
    rows, df = names
    other = spark.createDataFrame(
        [(100, "A", "spark"), (101, "B", "zzzzzz")],
        "id long, blk string, key string",
    )
    out = fuzzy_join(df, other, "key", "id", ["blk"], max_dist=1).collect()
    want = sum(
        1
        for (i, b, k) in rows
        if b == "A" and _lev(k, "spark") <= 1
    )
    assert len([r for r in out if r["id_b"] == 100]) == want
    assert not [r for r in out if r["id_b"] == 101]
    with pytest.raises(ValueError):
        fuzzy_join(df, df, "key", "id", [])


def test_fuzzy_plan_no_cartesian(names):
    _, df = names
    plan = (
        fuzzy_join(df, df, "key", "id", ["blk"], max_dist=2, self_pairs=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
