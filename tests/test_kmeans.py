"""k-means assignment tests: nearest-centroid consistency (the output
cluster really is the argmin over the learned centroids), label recovery
on well-separated blobs, and determinism of the seeded fit."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions.similarity import kmeans_assign


@pytest.fixture(scope="module")
def blobs_df(spark):
    rng = np.random.default_rng(11)
    centers = np.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]])
    rows = []
    for i in range(600):
        c = i % 3
        v = centers[c] + rng.normal(0, 0.5, 3)
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_kmeans_recovers_blobs(spark, blobs_df):
    out = kmeans_assign(blobs_df, "embedding", "vec_id", k=3, n_iter=5).collect()
    assert len(out) == 600
    got = {r.vec_id: r.cluster for r in out}
    labels = {r.vec_id: r.label for r in blobs_df.select("vec_id", "label").collect()}
    # Each true blob maps to ONE k-means cluster (purity 1.0 on
    # well-separated blobs) and the three clusters are distinct.
    mapping = {}
    for vid, lab in labels.items():
        mapping.setdefault(lab, set()).add(got[vid])
    assert all(len(s) == 1 for s in mapping.values())
    assert len({next(iter(s)) for s in mapping.values()}) == 3
    # Distances are small within tight blobs.
    assert max(r.dist for r in out) < 5.0


def test_kmeans_assignment_is_nearest_centroid(spark, blobs_df):
    """Reconstruct centroids from the output groups; every row's cluster
    must be the argmin distance to those group means (Lloyd fixpoint
    consistency up to the last assignment pass)."""
    out = kmeans_assign(blobs_df, "embedding", "vec_id", k=3, n_iter=5)
    pdf = (
        out.join(blobs_df, "vec_id")
        .select("vec_id", "cluster", "dist", "embedding")
        .toPandas()
    )
    cents = {
        c: np.stack(g["embedding"].to_numpy()).mean(axis=0)
        for c, g in pdf.groupby("cluster")
    }
    keys = sorted(cents)
    cm = np.stack([cents[c] for c in keys])
    v = np.stack(pdf["embedding"].to_numpy())
    d = ((v[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
    nearest = np.array(keys)[d.argmin(axis=1)]
    frac = (nearest == pdf["cluster"].to_numpy()).mean()
    assert frac > 0.99
    # reported dist matches recomputed distance to the assigned centroid
    # (loosely: centroids here are recomputed from final assignments,
    # one Lloyd step past the matrix that produced `dist`).
    assert float(np.abs(np.sqrt(d.min(axis=1)) - pdf["dist"]).mean()) < 0.5


def test_kmeans_deterministic(spark, blobs_df):
    a = {r.vec_id: r.cluster
         for r in kmeans_assign(blobs_df, "embedding", "vec_id", k=3, n_iter=2).collect()}
    b = {r.vec_id: r.cluster
         for r in kmeans_assign(blobs_df, "embedding", "vec_id", k=3, n_iter=2).collect()}
    assert a == b


def test_kmeans_partitioning_invariant(spark, blobs_df):
    """The r11 determinism contract: Lloyd sums are exact int64
    micro-units and routing is the round-6 stable argmin, so the fit —
    clusters AND round-6 distances — is identical under any input
    partitioning (the float partial sums this replaced were
    partition-order-dependent)."""
    base = {(r.vec_id, r.cluster, r.dist)
            for r in kmeans_assign(
                blobs_df, "embedding", "vec_id", k=3, n_iter=3).collect()}
    for n_parts in (1, 7, 32):
        got = {(r.vec_id, r.cluster, r.dist)
               for r in kmeans_assign(
                   blobs_df.repartition(n_parts), "embedding", "vec_id",
                   k=3, n_iter=3).collect()}
        assert got == base


def test_kmeans_seed_sample_is_md5_portable(spark, blobs_df):
    """Seed centroids must follow the engine-portable md5 rule
    (md5('km:{seed}:' || id), id-ascending ties) so oracles can replay
    the sample from the raw table."""
    import hashlib

    rows = blobs_df.select("vec_id", "embedding").collect()
    ids = sorted(
        (int(hashlib.md5(f"km:7:{r.vec_id}".encode()).hexdigest()[:15], 16),
         r.vec_id)
        for r in rows
    )[:3]
    expect = {i for _, i in ids}
    out = kmeans_assign(blobs_df, "embedding", "vec_id", k=3, n_iter=0)
    # with n_iter=0 every centroid IS a seed vector: each seed id must
    # sit at distance 0 from its own cluster centroid
    d = {r.vec_id: r.dist for r in out.collect() if r.vec_id in expect}
    assert set(d) == expect and all(v == 0.0 for v in d.values())
