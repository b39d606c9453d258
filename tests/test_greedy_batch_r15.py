"""r15 greedy-batching pins (kcenter_select / mmr_select).

The r15 optimization replaced one-TakeOrdered-job-per-pick with batched
rounds: one job collects top-(remaining + _GREEDY_PAD) candidates and
the driver accepts consecutive exact picks while the monotone-score
invariant holds (rejecting the batch tail otherwise). These tests pin
that the PICK SEQUENCE is identical

* across pad sizes (pad 0 forces tight batches and exercises the
  rejection/fresh-round path; the default pad accepts whole batches),
* against a brute-force greedy reference with the same determinism
  contract (round-6 HALF_UP shield, id-ascending tie-break),
* on data engineered to overturn the pre-update candidate order
  (tight clusters: after one pick, its cluster-mates collapse to the
  bottom — the exact scenario the acceptance bound must catch).
"""

import numpy as np
import pytest

import krnel_graph_spark.functions.similarity as sim
from decimal import ROUND_HALF_UP, Decimal


def _r6(x):
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def _unit(vecs):
    return vecs / np.linalg.norm(vecs, axis=1, keepdims=True)


def _kcenter_ref(vecs, ids, k):
    u = _unit(np.asarray(vecs, dtype="float64"))
    order = np.argsort(ids)
    first = order[0]
    picked = [(1, ids[first], None)]
    active = {i for i in range(len(ids)) if i != first}
    mind = {i: 1.0 - float(u[i] @ u[first]) for i in active}
    for rank in range(2, k + 1):
        if not active:
            break
        best = min(active, key=lambda i: (-_r6(mind[i]), ids[i]))
        picked.append((rank, ids[best], _r6(mind[best])))
        active.discard(best)
        for i in active:
            mind[i] = min(mind[i], 1.0 - float(u[i] @ u[best]))
    return picked


def _mmr_ref(vecs, ids, q, k, lam):
    u = _unit(np.asarray(vecs, dtype="float64"))
    qu = np.asarray(q, dtype="float64")
    qu = qu / np.linalg.norm(qu)
    rel = {i: float(u[i] @ qu) for i in range(len(ids))}
    maxsim = {i: 0.0 for i in range(len(ids))}
    active = set(range(len(ids)))
    picked = []
    for rank in range(1, k + 1):
        if not active:
            break
        score = {i: lam * rel[i] - (1.0 - lam) * maxsim[i] for i in active}
        best = min(active, key=lambda i: (-_r6(score[i]), ids[i]))
        picked.append((rank, ids[best], _r6(rel[best]), _r6(score[best])))
        active.discard(best)
        for i in active:
            maxsim[i] = max(maxsim[i], float(u[i] @ u[best]))
    return picked


def _clustered_df(spark):
    """5 tight clusters of 24 vectors each: picking any point collapses
    its 23 cluster-mates' scores, overturning the collected order."""
    rng = np.random.RandomState(11)
    centers = rng.standard_normal((5, 16))
    rows = []
    vid = 0
    for c in centers:
        for _ in range(24):
            v = c + 0.01 * rng.standard_normal(16)
            rows.append((vid, [float(x) for x in np.round(v, 6)]))
            vid += 1
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        np.array([r[1] for r in rows]),
        np.array([r[0] for r in rows]),
    )


@pytest.mark.parametrize("pad", [0, 1, 3])
def test_kcenter_batched_identical_across_pads(spark, pad, monkeypatch):
    df, vecs, ids = _clustered_df(spark)
    want = [
        tuple(r)
        for r in sim.kcenter_select(df, "embedding", "vec_id", 9)
        .orderBy("rank")
        .collect()
    ]
    monkeypatch.setattr(sim, "_GREEDY_PAD", pad)
    got = [
        tuple(r)
        for r in sim.kcenter_select(df, "embedding", "vec_id", 9)
        .orderBy("rank")
        .collect()
    ]
    assert got == want  # bit-exact: same ids, same sep doubles


def test_kcenter_batched_matches_bruteforce_on_clusters(spark):
    df, vecs, ids = _clustered_df(spark)
    want = _kcenter_ref(vecs, ids, 9)
    got = [
        (r["rank"], r["vec_id"], r["sep"])
        for r in sim.kcenter_select(df, "embedding", "vec_id", 9)
        .orderBy("rank")
        .collect()
    ]
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, g), (_, _, w) in zip(got[1:], want[1:]):
        assert g == pytest.approx(w, abs=2e-6)


@pytest.mark.parametrize("pad", [0, 1, 3])
def test_mmr_batched_identical_across_pads(spark, pad, monkeypatch):
    df, vecs, ids = _clustered_df(spark)
    q = [float(x) for x in np.round(vecs.mean(axis=0), 6)]
    want = [
        tuple(r)
        for r in sim.mmr_select(df, q, "embedding", "vec_id", k=10, lam=0.6)
        .orderBy("rank")
        .collect()
    ]
    monkeypatch.setattr(sim, "_GREEDY_PAD", pad)
    got = [
        tuple(r)
        for r in sim.mmr_select(df, q, "embedding", "vec_id", k=10, lam=0.6)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_mmr_batched_matches_bruteforce_on_clusters(spark):
    df, vecs, ids = _clustered_df(spark)
    q = [float(x) for x in np.round(vecs.mean(axis=0), 6)]
    want = _mmr_ref(vecs, ids, q, 10, 0.6)
    got = [
        (r["rank"], r["vec_id"], r["relevance"], r["mmr"])
        for r in sim.mmr_select(df, q, "embedding", "vec_id", k=10, lam=0.6)
        .orderBy("rank")
        .collect()
    ]
    assert [(a, b) for a, b, _, _ in got] == [
        (a, b) for a, b, _, _ in want
    ]
    for (_, _, gr, gm), (_, _, wr, wm) in zip(got, want):
        assert gr == pytest.approx(wr, abs=2e-6)
        assert gm == pytest.approx(wm, abs=2e-6)


def test_kcenter_k_exceeds_pool_still_exhausts(spark):
    df, _, _ = _clustered_df(spark)
    small = df.filter("vec_id < 5")
    out = sim.kcenter_select(small, "embedding", "vec_id", 50).collect()
    assert len(out) == 5
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(
        range(1, 6)
    )
