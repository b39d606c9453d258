"""SemDeDup (``semantic_dedup``) tests: duplicate collapse on seeded blobs
vs a global numpy union-find reference, min-id keeper rule, determinism,
and the ``keep_all`` passthrough of ``kmeans_assign``.
"""

from __future__ import annotations

import numpy as np
import pytest

from krnel_graph_spark.functions.dedup import semantic_dedup
from krnel_graph_spark.functions.similarity import kmeans_assign


def _blobs_with_dups(rng, n_blobs=3, per_blob=20, dim=8, dup_groups=4):
    """Well-separated blobs; some vectors duplicated EXACTLY (identical
    rows always share a k-means cell, so per-cluster dedup must agree
    with the global reference)."""
    rows = []
    vid = 0
    for b in range(n_blobs):
        center = np.zeros(dim)
        center[b % dim] = 50.0 * (b + 1)
        for _ in range(per_blob):
            v = center + rng.normal(0, 0.5, dim)
            rows.append((vid, v.tolist()))
            vid += 1
    # exact duplicate groups: copy existing vectors under new ids
    for g in range(dup_groups):
        src = rows[g * 7][1]
        for _ in range(2 + g % 2):
            rows.append((vid, list(src)))
            vid += 1
    return rows


def _global_reference(rows, threshold):
    """Global (non-clustered) union-find over cos > threshold pairs."""
    ids = np.array([r[0] for r in rows])
    v = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(v, axis=1)
    norms[norms == 0] = 1.0
    x = v / norms[:, None]
    sims = x @ x.T
    n = len(x)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] > threshold:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {int(ids[i]) for i in range(n) if find(i) == i}


@pytest.fixture(scope="module")
def dup_rows():
    return _blobs_with_dups(np.random.default_rng(3))


def test_duplicate_collapse_matches_global_reference(spark, dup_rows):
    # Exact duplicates (cos = 1 > .999) collapse; blob noise (cos of
    # distinct same-blob points ~ .9999 at radius .5/|c|=50... keep the
    # threshold ABOVE intra-blob cosine) — with centers at 50 and sigma
    # 0.5, distinct same-blob cosines stay below ~0.99995, so use a
    # threshold between that and 1.
    threshold = 0.99999
    df = spark.createDataFrame(dup_rows, "vec_id long, vec array<double>")
    out = semantic_dedup(
        df, "vec", "vec_id", n_clusters=3, threshold=threshold, n_iter=3
    )
    got = {r["vec_id"] for r in out.select("vec_id").collect()}
    exp = _global_reference(dup_rows, threshold)
    assert got == exp
    # every duplicated source id (multiple of 7 under dup_groups) survives
    assert 0 in got and 7 in got


def test_deterministic(spark, dup_rows):
    df = spark.createDataFrame(dup_rows, "vec_id long, vec array<double>")
    a = {
        r["vec_id"]
        for r in semantic_dedup(
            df, "vec", "vec_id", n_clusters=4, threshold=0.999, n_iter=2
        ).collect()
    }
    b = {
        r["vec_id"]
        for r in semantic_dedup(
            df, "vec", "vec_id", n_clusters=4, threshold=0.999, n_iter=2
        ).collect()
    }
    assert a == b


def test_no_dups_all_survive(spark):
    rng = np.random.default_rng(5)
    rows = [(i, (rng.normal(0, 1, 6) + (i % 3) * 40).tolist()) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    out = semantic_dedup(df, "vec", "vec_id", n_clusters=3, threshold=0.999999)
    assert out.count() == 30


def test_threshold_validation(spark):
    df = spark.createDataFrame([(0, [1.0])], "vec_id long, vec array<double>")
    with pytest.raises(ValueError):
        semantic_dedup(df, "vec", "vec_id", threshold=0.0)
    with pytest.raises(ValueError):
        semantic_dedup(df, "vec", "vec_id", threshold=1.5)


def test_kmeans_keep_all_columns(spark):
    rows = [(i, [float(i), 0.0], f"t{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>, tag string")
    out = kmeans_assign(df, "vec", "vec_id", k=2, n_iter=1, keep_all=True)
    assert set(out.columns) == {"vec_id", "vec", "tag", "cluster"}
    assert out.count() == 10
