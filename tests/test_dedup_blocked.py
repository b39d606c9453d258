"""Blocked (dgemm) exact cosine pairs must equal the per-pair baseline."""

import math
import random

import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions import dedup


@pytest.fixture()
def vectors(spark):
    rng = random.Random(7)
    rows = []
    for i in range(60):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, base))
        if i % 5 == 0:  # planted near-dups
            rows.append((1000 + i, [x + rng.uniform(-0.01, 0.01) for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _collect(df):
    return {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in df.collect()
    }


def test_blocked_matches_baseline(vectors):
    baseline = _collect(
        dedup.embedding_cosine_pairs(vectors, "embedding", "vec_id", threshold=0.8)
    )
    blocked = _collect(
        dedup.embedding_cosine_pairs_blocked(
            vectors, "embedding", "vec_id", threshold=0.8, num_blocks=4
        )
    )
    assert set(blocked) == set(baseline)
    assert len(baseline) > 0  # planted dups actually matched
    for key, cos in baseline.items():
        assert math.isclose(blocked[key], cos, abs_tol=1e-6)


def test_blocked_no_duplicate_or_self_pairs(vectors):
    out = dedup.embedding_cosine_pairs_blocked(
        vectors, "embedding", "vec_id", threshold=-1.0, num_blocks=3
    )
    pairs = [(r["doc_a"], r["doc_b"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))  # each unordered pair exactly once
    assert all(a < b for a, b in pairs)
    n = vectors.count()
    assert len(pairs) == n * (n - 1) // 2  # threshold -1 keeps every pair


def test_blocked_derives_num_blocks(vectors):
    """num_blocks=None derives B from the corpus count; results unchanged."""
    explicit = _collect(
        dedup.embedding_cosine_pairs_blocked(
            vectors, "embedding", "vec_id", threshold=0.8, num_blocks=4
        )
    )
    derived = _collect(
        dedup.embedding_cosine_pairs_blocked(
            vectors, "embedding", "vec_id", threshold=0.8, target_block_rows=16
        )
    )
    assert derived == explicit


def test_blocked_zero_norm_vectors(spark):
    """Zero vectors must not NaN-poison the block: they simply never pass a
    positive threshold, and other pairs are unaffected."""
    rows = [
        (0, [0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.001, 0.0]),
        (3, [0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = _collect(
        dedup.embedding_cosine_pairs_blocked(
            df, "embedding", "vec_id", threshold=0.5, num_blocks=2
        )
    )
    assert set(out) == {(1, 2)}


def test_drop_near_dups_removes_planted_clusters(spark):
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "completely different text about spark execution engines at scale",
        "a third unrelated document mentioning neither foxes nor engines",
    ]
    rows = []
    doc_id = 0
    for text in base:
        for variant in (text, text + " extra", text + " extra tail"):
            rows.append((doc_id, variant))
            doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.drop_near_dups(
        df, "text", "doc_id", num_perm=16, bands=8, jaccard_threshold=0.3
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # one keeper (min id) per planted cluster of three variants
    assert kept == [0, 3, 6]


def test_lsh_bucketed_pairs_subset_of_exact(vectors):
    """The hyperplane-bucketed approximate path returns a subset of the
    exact pair set (bucketing only prunes, never invents), recovers most
    planted near-dups, and its plan stays free of plane literals."""
    from krnel_graph_spark.functions.similarity import random_hyperplanes

    exact = _collect(
        dedup.embedding_cosine_pairs(vectors, "embedding", "vec_id", threshold=0.8)
    )
    approx_df = dedup.embedding_cosine_pairs(
        vectors, "embedding", "vec_id", threshold=0.8,
        planes=random_hyperplanes(8, 4),
    )
    approx = _collect(approx_df)
    assert set(approx) <= set(exact)
    assert len(approx) >= 0.5 * len(exact)  # 4 planes: coarse but working
    for key, cos in approx.items():
        assert math.isclose(exact[key], cos, abs_tol=1e-6)

    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # bucket UDF, not literal expressions


def test_clean_corpus_stages_monotone(spark):
    """Each cleanup stage only removes rows, survivors are a subset of the
    input ids, and every survivor clears the quality floor."""
    from pyspark.sql import functions as F

    from krnel_graph_spark.functions.text import quality_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = dedup.drop_exact_dups(docs, "text", "doc_id")
    near = dedup.drop_near_dups(exact, "text", "doc_id", num_perm=16, bands=4)
    clean = dedup.clean_corpus(
        docs, "text", "doc_id", num_perm=16, bands=4, min_quality=0.5
    )
    n_docs, n_exact, n_near, n_clean = (
        docs.count(), exact.count(), near.count(), clean.count()
    )
    assert n_docs >= n_exact >= n_near >= n_clean > 0

    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    clean_rows = clean.select(
        "doc_id", F.round(quality_score(F.col("text")), 6).alias("q")
    ).collect()
    assert {r["doc_id"] for r in clean_rows} <= ids
    assert all(r["q"] >= 0.5 for r in clean_rows)


# --------------------------------------------------------------------- #
# drop_near_dups keep_by (quality-keeper rule)                            #
# --------------------------------------------------------------------- #


def _near_dup_corpus(spark):
    base_a = "the quick brown fox jumps over the lazy dog again and again"
    base_b = "shuffle partitions broadcast hints adaptive execution skew salting bucketed scans"
    rows = [
        # near-dup group A (ids 1..3): id 2 has the best quality
        (1, base_a + " alpha", 0.2),
        (2, base_a + " beta", 0.9),
        (3, base_a + " gamma", 0.5),
        # unique docs
        (4, "completely different text about spark physical plans", 0.1),
        (5, "yet another unrelated document mentioning broadcast joins", 0.8),
        # near-dup group B (ids 6..7): tie on quality -> min id wins
        (6, base_b + " delta one", 0.7),
        (7, base_b + " delta two", 0.7),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, q double")


def test_keep_by_quality_driver(spark):
    from krnel_graph_spark.functions.dedup import drop_near_dups

    df = _near_dup_corpus(spark)
    kept = {
        r["doc_id"]
        for r in drop_near_dups(
            df, "text", "doc_id", num_perm=16, bands=8,
            jaccard_threshold=0.5, keep_by="q",
        ).collect()
    }
    # group A -> 2 (best q), group B -> 6 (tie, min id), uniques kept
    assert 2 in kept and 1 not in kept and 3 not in kept
    assert 6 in kept and 7 not in kept
    assert {4, 5} <= kept


def test_keep_by_quality_distributed_matches_driver(spark):
    from krnel_graph_spark.functions.dedup import drop_near_dups

    df = _near_dup_corpus(spark)
    kw = dict(num_perm=16, bands=8, jaccard_threshold=0.5, keep_by="q")
    a = {
        r["doc_id"]
        for r in drop_near_dups(df, "text", "doc_id", components="driver", **kw).collect()
    }
    b = {
        r["doc_id"]
        for r in drop_near_dups(
            df, "text", "doc_id", components="distributed", **kw
        ).collect()
    }
    assert a == b


def test_keep_by_none_unchanged(spark):
    from krnel_graph_spark.functions.dedup import drop_near_dups

    df = _near_dup_corpus(spark)
    kept = {
        r["doc_id"]
        for r in drop_near_dups(
            df, "text", "doc_id", num_perm=16, bands=8, jaccard_threshold=0.5
        ).collect()
    }
    # min-id rule: group A -> 1, group B -> 6
    assert 1 in kept and 2 not in kept and 3 not in kept
    assert 6 in kept and 7 not in kept


def test_clean_corpus_keep_by(spark):
    """clean_corpus(keep_by=...) keeps the best-scored near-dup member."""
    from krnel_graph_spark.functions.dedup import clean_corpus
    from pyspark.sql import functions as F

    base_a = (
        "the quick brown fox jumps over the lazy dog again and again with "
        "plenty of perfectly ordinary filler words to keep the quality up "
        "and the stopword ratio healthy for this long enough document"
    )
    rows = [
        (1, base_a + " alpha"),
        (2, base_a + " beta"),
        (3, "completely different prose about adaptive query planning in "
            "spark with the usual words and it is long enough to pass"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "q", F.when(F.col("doc_id") == 2, 0.9).otherwise(0.6)
    )
    kept = {
        r["doc_id"]
        for r in clean_corpus(
            df, "text", "doc_id", num_perm=16, bands=8,
            jaccard_threshold=0.5, min_quality=0.0, keep_by="q",
        ).collect()
    }
    assert 2 in kept and 1 not in kept
    assert 3 in kept


def test_dedup_weights_planted_clusters(spark):
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "completely different text about spark execution engines at scale",
        "a third unrelated document mentioning neither foxes nor engines",
    ]
    rows = []
    doc_id = 0
    for text in base:
        for variant in (text, text + " extra", text + " extra tail"):
            rows.append((doc_id, variant))
            doc_id += 1
    rows.append((doc_id, "a lone singleton document with fully novel words"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.dedup_weights(
            df, "text", "doc_id", num_perm=16, bands=8, jaccard_threshold=0.3
        ).collect()
    }
    # every input row reports — soft dedup drops nothing
    assert set(out) == set(range(10))
    for d in range(9):  # three planted clusters of three
        assert out[d]["cluster_size"] == 3
        assert out[d]["weight"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[9]["cluster_size"] == 1 and out[9]["weight"] == 1.0
    # expected training mass: each cluster contributes ~1 doc
    total = sum(r["weight"] for r in out.values())
    assert total == pytest.approx(4.0, abs=1e-4)
    # sqrt mode is gentler: 1/sqrt(3) per member
    sq = {
        r["doc_id"]: r["weight"]
        for r in dedup.dedup_weights(
            df, "text", "doc_id",
            num_perm=16, bands=8, jaccard_threshold=0.3, mode="sqrt",
        ).collect()
    }
    assert sq[0] == pytest.approx(3 ** -0.5, abs=1e-6)
    assert sq[9] == 1.0
    with pytest.raises(ValueError, match="mode"):
        dedup.dedup_weights(df, "text", "doc_id", mode="bogus")


def test_dedup_weights_fluent_twin(lazy_runner):
    ds = lazy_runner.from_parquet("/root/testdata/sf0.001/documents.parquet")
    op = ds.dedup_weights("text", num_perm=16, bands=4)
    pdf = lazy_runner.to_pandas(op)
    # row-aligned enrichment: parent columns + the two new ones, density kept
    assert {"cluster_size", "weight"} <= set(pdf.columns)
    assert len(pdf) == 500
    assert (pdf["weight"] <= 1.0).all() and (pdf["weight"] > 0).all()
    assert ((pdf["cluster_size"] == 1) == (pdf["weight"] == 1.0)).all()


def test_mmr_select_diversity_vs_pure_relevance(spark):
    from krnel_graph_spark.functions.similarity import cosine_topk, mmr_select

    # doc 0/1: near-copies maximally relevant; doc 2: relevant but in a
    # different direction; doc 3: irrelevant.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.998, 0.0, 0.01]),
        (2, [0.7, 0.7, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [1.0, 0.2, 0.0]
    # pure relevance would pick the redundant near-copy second...
    lam1 = [r["vec_id"] for r in mmr_select(df, q, "embedding", "vec_id", k=3, lam=1.0).collect()]
    assert lam1[:2] == [0, 1]
    # ...MMR at lam=0.5 demotes it in favor of the diverse direction
    got = mmr_select(df, q, "embedding", "vec_id", k=3, lam=0.5).collect()
    ids = [r["vec_id"] for r in got]
    assert ids[0] == 0 and ids[1] == 2
    assert [r["rank"] for r in got] == [1, 2, 3]
    # relevance column is plain cosine; mmr <= lam*relevance after rank 1
    assert got[0]["mmr"] == pytest.approx(0.5 * got[0]["relevance"], abs=1e-6)
    assert got[1]["mmr"] <= 0.5 * got[1]["relevance"] + 1e-9

    with pytest.raises(ValueError, match="lam"):
        mmr_select(df, q, "embedding", "vec_id", k=2, lam=1.5)
    with pytest.raises(ValueError, match="zero norm"):
        mmr_select(df, [0.0, 0.0, 0.0], "embedding", "vec_id", k=2)


def test_winnowing_guarantee_and_pairs(spark):
    from krnel_graph_spark.functions.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, "intro words here " + base + " trailing bits"),  # embedded copy
            (2, "completely different text about nothing shared with anyone"),
            (3, "tiny doc"),  # < k tokens: no grams
            (4, ""),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, "text", "doc_id", k=4, w=4)
    rows = fps.collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    assert 3 not in by_doc and 4 not in by_doc
    # winnowing guarantee: the 14-token shared run (>= w+k-1 = 7) must
    # yield at least one shared fingerprint VALUE between 0 and 1
    shared = {f for _, f in by_doc[0]} & {f for _, f in by_doc[1]}
    assert shared
    # density: ~one selection per window, far fewer than grams
    n_toks = len(base.split())
    assert len(by_doc[0]) <= n_toks - 4 + 1
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"]
             for r in winnow_pairs(docs, "text", "doc_id", min_shared=2).collect()}
    assert set(pairs) == {(0, 1)} and pairs[(0, 1)] >= 2
    import pytest as _p

    with _p.raises(ValueError, match="k and w"):
        winnow_fingerprints(docs, "text", "doc_id", k=0)


def test_winnow_pairs_fluent_twin(lazy_runner):
    ds = lazy_runner.from_parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = lazy_runner.to_pandas(ds.winnow_pairs("text", min_shared=2))
    assert list(pdf.columns) == ["doc_a", "doc_b", "n_shared"]
    assert len(pdf) > 0 and (pdf["doc_a"] < pdf["doc_b"]).all()
    assert (pdf["n_shared"] >= 2).all()


def test_winnow_pairs_pair_budget_guard(spark):
    """pair_budget raises (eagerly, at construction) when the fingerprint
    co-occurrence bound exceeds the budget, steering toward max_doc_freq;
    a sufficient budget — or the max_doc_freq drop lowering the bound —
    leaves output identical to the unguarded path."""
    from krnel_graph_spark.functions.dedup import winnow_pairs

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    docs = spark.createDataFrame(
        [(i, f"copy marker {i} " + base) for i in range(8)]
        + [(100, "entirely different text about nothing shared here at all")],
        "doc_id long, text string",
    )
    import pytest as _p

    with _p.raises(ValueError, match="max_doc_freq"):
        winnow_pairs(docs, "text", "doc_id", pair_budget=5)

    free = {(r["doc_a"], r["doc_b"]) for r in winnow_pairs(
        docs, "text", "doc_id").collect()}
    guarded = {(r["doc_a"], r["doc_b"]) for r in winnow_pairs(
        docs, "text", "doc_id", pair_budget=10_000).collect()}
    assert guarded == free and free  # 8 near-copies pair up

    # max_doc_freq drops the 8-doc boilerplate fingerprints BEFORE the
    # budget pre-pass, so the same tight budget now passes.
    few = winnow_pairs(
        docs, "text", "doc_id", max_doc_freq=4, pair_budget=5
    ).collect()
    assert len(few) == 0
