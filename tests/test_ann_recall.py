"""Recall of the approximate ANN paths vs the exact brute-force baseline.

Since r9 ann_lsh and ann_ivf ARE oracle-backed (deterministic plane /
centroid parameters replay as SQL literals); these tests remain the
mechanism guardrail — recall quality is not something a replayed oracle
can judge. Two layers:

* mechanism tests on *clustered* vectors (the workload ANN indexes are
  for): near-neighbors are genuinely close, so bucketing must recover
  them — recall ≥ 0.8 or the signature/probing/cell-routing broke;
* canary floors on the driver's embeddings table at the exact gate-query
  parameters. Those vectors are near-random (weak neighbor structure —
  the hard case), so the floors sit at the measured deterministic values
  minus a safety margin.
"""

import random

import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions import similarity

K = 10
N_QUERIES = 10


def _recall(approx_df, exact_pairs):
    approx = {(r["query_id"], r["doc_id"]) for r in approx_df.collect()}
    return len(approx & exact_pairs) / len(exact_pairs)


def _exact(emb, queries):
    out = similarity.cosine_topk(emb, queries, "embedding", "vec_id", k=K)
    return {(r["query_id"], r["doc_id"]) for r in out.collect()}


# ------------------------- clustered mechanism ------------------------- #


@pytest.fixture(scope="module")
def clustered(spark):
    """40 well-separated cluster centers × 12 members with small noise:
    each vector's true top-k are its cluster-mates."""
    rng = random.Random(3)
    rows = []
    vid = 0
    for _ in range(40):
        center = [rng.gauss(0, 1) for _ in range(32)]
        for _ in range(12):
            rows.append(
                (vid, [x + rng.gauss(0, 0.05) for x in center])
            )
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.cache()


def test_lsh_recall_clustered(clustered):
    queries = clustered.filter(F.col("vec_id") % 120 == 0)
    exact = _exact(clustered, queries)
    out = similarity.cosine_topk_lsh(
        clustered, queries, "embedding", "vec_id",
        k=K, dim=32, n_planes=6, multiprobe=7, n_tables=2,
    )
    r = _recall(out, exact)
    assert r >= 0.8, f"LSH recall@{K} on clustered data collapsed to {r:.2f}"


def test_lsh_recall_adversarial_sparse_buckets(clustered):
    """n_planes=12 / multiprobe=1 / one table: 4096 buckets over 480
    vectors. Recall must visibly degrade from the generous-parameter ≥0.8
    (so a bucketing bug can't hide behind multiprobe amplification) while
    the hyperplane locality itself still holds a 0.5 floor. Deterministic:
    fixed planes seed, fixed data."""
    queries = clustered.filter(F.col("vec_id") % 120 == 0)
    exact = _exact(clustered, queries)
    out = similarity.cosine_topk_lsh(
        clustered, queries, "embedding", "vec_id",
        k=K, dim=32, n_planes=12, multiprobe=1, n_tables=1,
    )
    r = _recall(out, exact)
    assert r < 0.8, f"sparse-bucket LSH recall {r:.2f} suspiciously high"
    assert r >= 0.5, f"sparse-bucket LSH recall collapsed to {r:.2f}"


def test_ivf_plan_size_independent_of_n_cells(clustered):
    """The centroid matrix must ride as a broadcast, not as plan literals:
    the physical plan at 256 cells must be the same size as at 16 (a
    literal-embedding regression scales the plan by n_cells × dim)."""
    queries = clustered.filter(F.col("vec_id") % 120 == 0)

    def plan_chars(n_cells):
        import re

        df = similarity.ivf_topk(
            clustered, queries, "embedding", "vec_id",
            k=K, n_cells=n_cells, nprobe=4,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # Normalize incidental numeric ids (plan/RDD/expr ids grow over
        # the session and can change digit count between the two calls).
        return len(re.sub(r"\d+", "#", plan))

    assert plan_chars(256) == plan_chars(16)


def test_ivf_recall_clustered(clustered):
    queries = clustered.filter(F.col("vec_id") % 120 == 0)
    exact = _exact(clustered, queries)
    out = similarity.ivf_topk(
        clustered, queries, "embedding", "vec_id", k=K, n_cells=16, nprobe=4
    )
    r = _recall(out, exact)
    assert r >= 0.8, f"IVF recall@{K} on clustered data collapsed to {r:.2f}"


# --------------------- gate-parameter canary floors --------------------- #


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_lsh_recall_gate_params(emb):
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _exact(emb, queries)
    out = similarity.cosine_topk_lsh(
        emb, queries, "embedding", "vec_id",
        k=K, dim=64, n_planes=6, multiprobe=7, n_tables=8,  # ann_lsh gate params
    )
    r = _recall(out, exact)
    assert r >= 0.75, f"gate-param LSH recall@{K} fell to {r:.2f} (was 0.82)"


def test_ivf_recall_gate_params(emb):
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _exact(emb, queries)
    out = similarity.ivf_topk(
        emb, queries, "embedding", "vec_id", k=K, nprobe=8  # ann_ivf gate params
    )
    r = _recall(out, exact)
    assert r >= 0.7, f"gate-param IVF recall@{K} fell to {r:.2f} (was 0.76)"


def test_lsh_results_validly_ranked(emb):
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = similarity.cosine_topk_lsh(
        emb, queries, "embedding", "vec_id", k=K, dim=64, n_planes=6
    )
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        cosines = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)


def test_lsh_explicit_planes_reject_table_knobs(clustered):
    planes = similarity.random_hyperplanes(32, 6)
    with pytest.raises(ValueError, match="planes"):
        similarity.cosine_topk_lsh(
            clustered, clustered.limit(1), "embedding", "vec_id",
            planes=planes, n_tables=4,
        )
    with pytest.raises(ValueError, match="planes"):
        similarity.cosine_topk_lsh(
            clustered, clustered.limit(1), "embedding", "vec_id",
            planes=planes, seed=11,
        )


def test_ivf_kmeans_refinement_reduces_quantization_error(clustered):
    """Lloyd iterations must reduce mean squared distance-to-assigned-
    centroid (the k-means objective) on clustered data, and the refined
    index must not lose recall."""
    import numpy as np

    vecs = np.stack([r["embedding"] for r in clustered.collect()])

    def seed_cmat():
        from pyspark.sql import functions as F2

        rows = (
            clustered.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
            .orderBy(F2.xxhash64(F2.col("cid"), F2.lit(7)))
            .limit(16)
            .collect()
        )
        return np.asarray([r["cv"] for r in rows], dtype=np.float64)

    def qerr(cm):
        d2 = (
            (vecs * vecs).sum(axis=1)[:, None]
            - 2.0 * (vecs @ cm.T)
            + (cm * cm).sum(axis=1)[None, :]
        )
        return float(d2.min(axis=1).mean())

    cm0 = seed_cmat()
    cm2 = similarity.kmeans_refine_centroids(clustered, "embedding", cm0, n_iter=2)
    assert qerr(cm2) < qerr(cm0) * 0.9, (
        f"refinement did not reduce quantization error: {qerr(cm0):.4f} -> {qerr(cm2):.4f}"
    )

    queries = clustered.filter(F.col("vec_id") % 120 == 0)
    exact = _exact(clustered, queries)
    out = similarity.ivf_topk(
        clustered, queries, "embedding", "vec_id",
        k=K, n_cells=16, nprobe=4, refine_iters=2,
    )
    assert _recall(out, exact) >= 0.8


def test_lsh_plan_size_independent_of_tables_and_planes(clustered):
    """Hyperplanes must ride as a broadcast, not plan literals: the plan at
    8 tables × 16 planes must match 1 table × 6 planes in size."""
    queries = clustered.filter(F.col("vec_id") % 120 == 0)

    def plan_chars(n_planes, n_tables):
        df = similarity.cosine_topk_lsh(
            clustered, queries, "embedding", "vec_id",
            k=K, dim=32, n_planes=n_planes, n_tables=n_tables,
        )
        return len(df._jdf.queryExecution().executedPlan().toString())

    small, big = plan_chars(6, 1), plan_chars(16, 8)
    # expr-id digits drift a few chars between plans; the literal-embedding
    # failure mode this guards against scales the plan by tables×planes×dim.
    assert big < small * 1.1


def test_recall_at_k_function(spark):
    from krnel_graph_spark.functions.similarity import recall_at_k

    exact = spark.createDataFrame(
        [("q1", 1), ("q1", 2), ("q1", 3), ("q2", 4), ("q2", 5)],
        "query_id string, vec_id long",
    )
    approx = spark.createDataFrame(
        [("q1", 1), ("q1", 3), ("q1", 99), ("q2", 8)],
        "query_id string, vec_id long",
    )
    got = {r["query_id"]: r["recall"] for r in recall_at_k(approx, exact).collect()}
    assert got["q1"] == pytest.approx(2 / 3)
    assert got["q2"] == pytest.approx(0.0)


def test_contrastive_triplets_structure(spark):
    from krnel_graph_spark.functions.similarity import (
        contrastive_triplets,
        cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    out = contrastive_triplets(
        emb, q, "embedding", "vec_id", neg_skip=4, n_negatives=3
    ).collect()
    assert len(out) == 5 * 3
    top = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["cosine"])
        for r in cosine_topk(emb, q, "embedding", "vec_id", k=7).collect()
    }
    for r in out:
        # positive is the rank-1 neighbor, negatives live in ranks 5-7
        assert (r["positive_id"], r["pos_cosine"]) == top[(r["query_id"], 1)]
        assert r["neg_rank"] in (5, 6, 7)
        assert (r["negative_id"], r["neg_cosine"]) == top[
            (r["query_id"], r["neg_rank"])
        ]
        # the hard negative really is a NEAR miss: below the positive,
        # but still among the corpus's most similar vectors
        assert r["neg_cosine"] <= r["pos_cosine"]


def test_contrastive_triplets_small_corpus_contract(spark):
    """Documented contract (r7 advice): a corpus too small to fill the
    hard-negative band (fewer than neg_skip+1 candidates) emits zero
    triplets rather than fabricating easy negatives."""
    from krnel_graph_spark.functions.similarity import contrastive_triplets

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter("vec_id < 3")
    out = contrastive_triplets(
        emb, emb, "embedding", "vec_id", neg_skip=4, n_negatives=3
    )
    assert out.count() == 0


def test_ivf_partitioning_invariant(emb):
    """The r9 portable sampling + round-6 routing shield must make
    ivf_topk's full output independent of input partitioning (the
    property the SQL oracle relies on)."""
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    a = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["cosine"])
        for r in similarity.ivf_topk(
            emb, queries, "embedding", "vec_id", k=K, nprobe=8
        ).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["cosine"])
        for r in similarity.ivf_topk(
            emb.repartition(13), queries.repartition(3),
            "embedding", "vec_id", k=K, nprobe=8,
        ).collect()
    )
    assert a == b
