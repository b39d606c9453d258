"""Differential + edge-case tests for ``duplicate_window_stats`` against a
pure-Python reimplementation: window tiling, whole-doc windows for short
docs, within-doc self-repetition counting, cross-doc duplicate counting,
and blank-doc exclusion.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from krnel_graph_spark.functions.dedup import duplicate_window_stats

WIDTH, STRIDE = 4, 2


def _windows(text: str, width: int = WIDTH, stride: int = STRIDE) -> list[str]:
    toks = text.lower().split()
    if not toks:
        return []
    if len(toks) <= width:
        return [" ".join(toks)]
    n_wins = (len(toks) - width) // stride + 1
    return [" ".join(toks[s * stride : s * stride + width]) for s in range(n_wins)]


def _expected(docs: dict[int, str]) -> dict[int, tuple[int, int]]:
    per: dict[int, Counter] = {i: Counter(_windows(t)) for i, t in docs.items()}
    totals: Counter = Counter()
    for c in per.values():
        totals.update(c)
    out = {}
    for i, c in per.items():
        if not c:
            continue
        n = sum(c.values())
        dup = sum(k for w, k in c.items() if totals[w] > 1)
        out[i] = (n, dup)
    return out


def _run(spark, docs: dict[int, str]) -> dict[int, tuple[int, int]]:
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    rows = duplicate_window_stats(
        df, "text", "doc_id", width=WIDTH, stride=STRIDE
    ).collect()
    return {r["doc_id"]: (r["n_windows"], r["dup_windows"]) for r in rows}


def test_edge_cases(spark):
    docs = {
        0: "a b c d e f g h",          # 3 windows at width 4 stride 2
        1: "a b c d e f g h",          # exact dup of 0
        2: "x y z",                    # short: one whole-doc window
        3: "x y z",                    # short dup
        4: "",                         # blank: excluded
        5: "   \t\n ",                 # whitespace-only: excluded
        6: "p q r s p q r s p q r s",  # self-repetition
        7: "unique words only here never repeated anywhere else ever",
        8: "A B C D e f G h",          # case-normalized dup of 0
    }
    got = _run(spark, docs)
    exp = _expected(docs)
    assert got == exp
    assert 4 not in got and 5 not in got
    # doc 0/1/8 fully duplicated, doc 7 fully unique
    assert got[0] == (3, 3) and got[8] == (3, 3)
    n7, d7 = got[7]
    assert d7 == 0 and n7 == 3
    # self-repetition: "p q r s" windows repeat within doc 6
    assert got[6][1] > 0


def test_differential_random(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    docs = {}
    for i in range(200):
        n = rng.randint(0, 25)
        docs[i] = " ".join(rng.choice(vocab) for _ in range(n))
    # splice shared boilerplate into some docs
    boiler = "the quick brown fox jumps over the lazy dog"
    for i in range(0, 200, 7):
        docs[i] = docs[i] + " " + boiler
    got = _run(spark, docs)
    assert got == _expected(docs)


def test_dup_frac_column(spark):
    docs = {0: "a b c d", 1: "a b c d", 2: "q r s t"}
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in duplicate_window_stats(
            df, "text", "doc_id", width=WIDTH, stride=STRIDE
        ).collect()
    }
    assert rows[0]["dup_frac"] == pytest.approx(1.0)
    assert rows[2]["dup_frac"] == pytest.approx(0.0)


def test_bad_params(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicate_window_stats(df, "text", "doc_id", width=0)
    with pytest.raises(ValueError):
        duplicate_window_stats(df, "text", "doc_id", stride=0)
