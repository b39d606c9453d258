"""Cross-corpus dedup: exact and near modes against hand-built corpora
where the overlap structure is known by construction (the sf0.01 gate
split has no exact cross-parity dups, so the exact path needs a corpus
that actually exercises removal)."""

from __future__ import annotations

import pytest

from krnel_graph_spark.functions.dedup import dedup_against

REF = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (2, "spark shuffles data between stages during wide transformations"),
    (4, "completely unrelated reference document about nothing at all"),
]
NEW = [
    (1, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 0
    (3, "The  Quick Brown fox jumps over the lazy dog today"),  # norm-dup of 0
    (5, "spark shuffles data between stages during wide transformations yes"),
    # ^ near-dup of 2 (one extra token)
    (7, "a genuinely fresh document with entirely new content here"),
    (9, ""),  # blank: unshingleable, must survive near mode
]


@pytest.fixture(scope="module")
def corpora(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    new = spark.createDataFrame(NEW, "doc_id long, text string")
    return new, ref


def test_exact_mode(spark, corpora):
    new, ref = corpora
    kept = sorted(
        r.doc_id for r in dedup_against(new, ref, "text", "doc_id", mode="exact").collect()
    )
    # 1 and 3 are (normalized-)exact copies of ref 0; 5 differs by a token
    assert kept == [5, 7, 9]


def test_near_mode(spark, corpora):
    new, ref = corpora
    kept = sorted(
        r.doc_id
        for r in dedup_against(
            new, ref, "text", "doc_id", mode="near",
            num_perm=16, bands=8, jaccard_threshold=0.5,
        ).collect()
    )
    # 1, 3 AND the one-token-off 5 all match; blank 9 survives (no shingles)
    assert kept == [7, 9]


def test_near_keeps_disjoint_corpora(spark, corpora):
    new, ref = corpora
    fresh = new.filter("doc_id = 7")
    kept = dedup_against(
        fresh, ref, "text", "doc_id", mode="near", num_perm=16, bands=8
    ).count()
    assert kept == 1
