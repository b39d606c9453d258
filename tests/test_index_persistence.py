"""Save/load helpers for the persisted-index families (r12): the
write-side layout the scale docs promise (term/cell clustering for
row-group pruning), loud structural validation at load, and
search-identity through the round trip."""

from __future__ import annotations

import pytest

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_bm25_save_load_search_identity(spark, tmp_path):
    from krnel_graph_spark.functions.text import (
        bm25_index,
        bm25_index_load,
        bm25_index_save,
        bm25_search_index,
    )

    docs = spark.read.parquet(DOCS)
    idx = bm25_index(docs, "text", "doc_id")
    want = [
        tuple(r)
        for r in bm25_search_index(idx, "doc_id", "hash join spark", k=10).collect()
    ]
    base = str(tmp_path / "bm25")
    bm25_index_save(idx, base)
    got = [
        tuple(r)
        for r in bm25_search_index(
            bm25_index_load(spark, base), "doc_id", "hash join spark", k=10
        ).collect()
    ]
    assert got == want and len(got) == 10
    with pytest.raises(ValueError, match="postings"):
        bm25_index_load(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="missing frame"):
        bm25_index_save({"postings": idx["postings"]}, str(tmp_path / "x"))


def test_bm25_saved_postings_clustered_for_term_pruning(spark, tmp_path):
    """The saved postings must be term-clustered: a term-filtered read
    prunes parquet row groups via min/max stats, so the scan's
    PushedFilters carries the term predicate."""
    from krnel_graph_spark.functions.text import bm25_index, bm25_index_save

    docs = spark.read.parquet(DOCS)
    base = str(tmp_path / "bm25")
    bm25_index_save(bm25_index(docs, "text", "doc_id"), base)
    scan = spark.read.parquet(f"{base}/postings").filter("term = 'spark'")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "term" in plan


def test_ann_save_load_validates_and_matches(spark, tmp_path):
    from pyspark.sql import functions as F

    from krnel_graph_spark.functions.similarity import (
        ann_index,
        ann_index_load,
        ann_index_save,
        ann_search,
    )

    emb = spark.read.parquet(EMB)
    model, encoded = ann_index(
        emb, "embedding", "vec_id", n_cells=8, m=8, n_codes=32, refine_iters=0
    )
    queries = emb.filter(F.col("vec_id") < 5)
    want = [
        tuple(r)
        for r in ann_search(
            model, encoded, queries, "embedding", "vec_id", k=5, nprobe=3
        ).collect()
    ]
    base = str(tmp_path / "ann")
    ann_index_save(model, encoded, base)
    m2, e2 = ann_index_load(spark, base)
    got = [
        tuple(r)
        for r in ann_search(
            m2, e2, queries, "embedding", "vec_id", k=5, nprobe=3
        ).collect()
    ]
    assert sorted(got) == sorted(want) and len(got) > 0
    # fail-fast on a truncated model snapshot
    model.filter("kind = 'centroid'").write.mode("overwrite").parquet(
        f"{base}/model"
    )
    with pytest.raises(ValueError, match="codebook"):
        ann_index_load(spark, base)


def test_minhash_save_load_roundtrip(spark, tmp_path):
    from krnel_graph_spark.functions.dedup import (
        minhash_index,
        minhash_index_load,
        minhash_index_save,
    )

    docs = spark.read.parquet(DOCS).limit(100)
    idx = minhash_index(docs, "text", "doc_id", num_perm=16)
    path = str(tmp_path / "mh")
    minhash_index_save(idx, path)
    back = minhash_index_load(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, idx.collect())
    )
    idx.select("doc_id", "sig", "n_sh").write.mode("overwrite").parquet(path)
    with pytest.raises(ValueError, match="num_perm"):
        minhash_index_load(spark, path)


def test_kn3_save_load_scoring_identity(spark, tmp_path):
    from krnel_graph_spark.functions.text import (
        kneser_ney3_load,
        kneser_ney3_save,
        kneser_ney3_score,
        kneser_ney3_train,
    )

    docs = spark.read.parquet(DOCS).limit(200)
    lm = kneser_ney3_train(docs, "text")
    want = sorted(
        map(
            tuple,
            kneser_ney3_score(
                lm, docs, "text", "doc_id", discount="modified"
            ).collect(),
        )
    )
    base = str(tmp_path / "kn3")
    kneser_ney3_save(lm, base)
    for key in lm:
        if key.startswith("_pinned_"):
            lm[key].unpersist()
    got = sorted(
        map(
            tuple,
            kneser_ney3_score(
                kneser_ney3_load(spark, base), docs, "text", "doc_id",
                discount="modified",
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
