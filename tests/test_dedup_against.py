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


def test_ref_index_parquet_roundtrip_identical(spark, corpora, tmp_path):
    """The incremental-pipeline contract: build the signature index
    once, persist it to parquet, and dedup reuse over the READ-BACK
    index must equal the inline path row-for-row — the ref corpus is
    never re-signatured."""
    from krnel_graph_spark.functions.dedup import minhash_index

    new, ref = corpora
    inline = sorted(
        r.doc_id
        for r in dedup_against(
            new, ref, "text", "doc_id", mode="near",
            num_perm=16, bands=8, jaccard_threshold=0.5,
        ).collect()
    )
    path = str(tmp_path / "ref_minhash_idx")
    minhash_index(ref, "text", "doc_id", num_perm=16).write.parquet(path)
    idx = spark.read.parquet(path)
    reused = sorted(
        r.doc_id
        for r in dedup_against(
            new, ref, "text", "doc_id", mode="near",
            num_perm=16, bands=8, jaccard_threshold=0.5,
            ref_index=idx,
        ).collect()
    )
    assert reused == inline == [7, 9]
    # one index serves any band layout dividing num_perm
    reused_b4 = sorted(
        r.doc_id
        for r in dedup_against(
            new, ref, "text", "doc_id", mode="near",
            num_perm=16, bands=4, jaccard_threshold=0.5,
            ref_index=idx,
        ).collect()
    )
    inline_b4 = sorted(
        r.doc_id
        for r in dedup_against(
            new, ref, "text", "doc_id", mode="near",
            num_perm=16, bands=4, jaccard_threshold=0.5,
        ).collect()
    )
    assert reused_b4 == inline_b4


def test_ref_index_rejected_for_exact_mode(spark, corpora):
    from krnel_graph_spark.functions.dedup import minhash_index

    new, ref = corpora
    idx = minhash_index(ref, "text", "doc_id", num_perm=16)
    with pytest.raises(ValueError, match="near"):
        dedup_against(
            new, ref, "text", "doc_id", mode="exact", ref_index=idx
        )

def test_ref_index_layout_mismatch_fails_loudly(spark, corpora):
    """A persisted index built with different num_perm/shingle_k must
    raise at execution, not silently slice a wrong band layout (which
    would degrade recall and KEEP near-duplicates)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from krnel_graph_spark.functions.dedup import minhash_index

    new, ref = corpora
    idx32 = minhash_index(ref, "text", "doc_id", num_perm=32)
    with pytest.raises(SparkRuntimeException, match="layout mismatch"):
        dedup_against(
            new, ref, "text", "doc_id", mode="near",
            num_perm=16, bands=8, ref_index=idx32,
        ).collect()

    idx_k5 = minhash_index(ref, "text", "doc_id", num_perm=16, shingle_k=5)
    with pytest.raises(SparkRuntimeException, match="layout mismatch"):
        dedup_against(
            new, ref, "text", "doc_id", mode="near",
            num_perm=16, bands=8, shingle_k=3, ref_index=idx_k5,
        ).collect()


def test_ref_index_bare_frame_width_guard(spark, corpora):
    """A bare (id, sig, n_sh) index without the param columns still gets
    the signature-width check; a matching bare index still works."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from krnel_graph_spark.functions.dedup import minhash_index

    new, ref = corpora
    bare = minhash_index(ref, "text", "doc_id", num_perm=16).select(
        "doc_id", "sig", "n_sh"
    )
    kept = sorted(
        r.doc_id
        for r in dedup_against(
            new, ref, "text", "doc_id", mode="near",
            num_perm=16, bands=8, jaccard_threshold=0.5, ref_index=bare,
        ).collect()
    )
    assert kept == [7, 9]
    # match on the MESSAGE, not the wrapper type: the executor-side
    # assert_true surfaces as SparkRuntimeException normally, but under
    # full-suite load the winning task failure is occasionally wrapped
    # differently (observed once in r13's suite run; passes alone) —
    # the guard firing with its message is the contract being pinned.
    with pytest.raises(Exception, match="layout mismatch") as excinfo:
        dedup_against(
            new, ref, "text", "doc_id", mode="near",
            num_perm=32, bands=8, ref_index=bare,
        ).collect()
    assert isinstance(excinfo.value, Exception)
    _ = SparkRuntimeException  # the usual concrete type, kept for readers


def test_minhash_index_append_union_equals_monolithic(spark, corpora):
    """append(index(A), B) == minhash_index(A ∪ B) as a row set, params
    taken from the index itself (not re-specified by the caller)."""
    from krnel_graph_spark.functions.dedup import (
        minhash_index,
        minhash_index_append,
    )

    new, ref = corpora
    day0 = ref.filter("doc_id % 2 = 0")
    day1 = ref.filter("doc_id % 2 = 1")
    idx = minhash_index(day0, "text", "doc_id", num_perm=16, shingle_k=3)
    appended = minhash_index_append(idx, day1, "text", "doc_id")
    mono = minhash_index(ref, "text", "doc_id", num_perm=16, shingle_k=3)
    got = sorted(map(tuple, appended.collect()))
    want = sorted(map(tuple, mono.collect()))
    assert got == want
    # and the appended index drives dedup_against identically
    kept_app = sorted(
        r.doc_id
        for r in dedup_against(
            new, ref, "text", "doc_id", mode="near",
            num_perm=16, bands=8, jaccard_threshold=0.5, ref_index=appended,
        ).collect()
    )
    kept_mono = sorted(
        r.doc_id
        for r in dedup_against(
            new, ref, "text", "doc_id", mode="near",
            num_perm=16, bands=8, jaccard_threshold=0.5, ref_index=mono,
        ).collect()
    )
    assert kept_app == kept_mono


def test_minhash_index_append_rejects_mixed_or_bare(spark, corpora):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from krnel_graph_spark.functions.dedup import (
        minhash_index,
        minhash_index_append,
    )

    _, ref = corpora
    idx16 = minhash_index(ref, "text", "doc_id", num_perm=16)
    idx32 = minhash_index(ref, "text", "doc_id", num_perm=32)
    # mixed layouts fail LAZILY (row-level assert at scan time — the
    # eager distinct() alternative costs a full extra signature pass)
    mixed = idx16.unionByName(idx32)
    with pytest.raises(SparkRuntimeException, match="mixed index layouts"):
        minhash_index_append(mixed, ref, "text", "doc_id").collect()
    bare = idx16.select("doc_id", "sig", "n_sh")
    with pytest.raises(ValueError, match="no layout to validate"):
        minhash_index_append(bare, ref, "text", "doc_id")
