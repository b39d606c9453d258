"""containment_pairs — asymmetric n-gram containment (doc-in-doc).

The discriminating case symmetric Jaccard structurally misses: a short
document fully embedded in a much longer one has Jaccard ≈ |A|/|B| but
containment exactly 1.0. The candidates= path (the 100-TB pair-bounded
verify) must agree with the exact inverted-index path on the candidate
set, regardless of pair orientation or duplicates in the candidate
frame.
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from krnel_graph_spark.functions import dedup

LONG = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four "
    "five six seven eight nine ten eleven twelve thirteen fourteen"
)
SHORT = "kilo lima mike november oscar papa quebec romeo"  # a LONG slice
OTHER = "completely different words nothing shared here at all moving on"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, LONG), (1, SHORT), (2, OTHER), (3, LONG + " tail tokens")],
        "doc_id long, text string",
    )


def test_containment_finds_doc_in_doc_where_jaccard_misses(docs):
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_pairs(
            docs, "text", "doc_id", threshold=0.9
        ).collect()
    }
    # SHORT is a verbatim slice of LONG: every shingle of 1 is in 0.
    assert cont[(0, 1)] == 1.0
    assert cont[(1, 3)] == 1.0
    # Jaccard at 0.5 misses the embedded pair (|A|/|B| is small) …
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert (0, 1) not in jac
    # … while the two near-identical long docs show up in both views.
    assert (0, 3) in jac and cont[(0, 3)] >= 0.9


def test_containment_threshold_filters(docs):
    out = dedup.containment_pairs(docs, "text", "doc_id", threshold=1.01)
    assert out.count() == 0  # nothing exceeds 1.0 + eps
    rows = dedup.containment_pairs(docs, "text", "doc_id", threshold=0.0)
    got = {(r["doc_a"], r["doc_b"]) for r in rows.collect()}
    assert (0, 2) not in got  # OTHER shares no shingle with anything


def test_containment_candidates_path_matches_exact(docs):
    exact = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_pairs(
            docs, "text", "doc_id", threshold=0.0
        ).collect()
    }
    # candidate frame: reversed orientation + a duplicate + a no-overlap
    # pair (must be absent from the output, not zero-scored)
    cand = docs.sparkSession.createDataFrame(
        [(1, 0), (1, 0), (3, 1), (0, 3), (2, 0)],
        "doc_a long, doc_b long",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_pairs(
            docs, "text", "doc_id", threshold=0.0, candidates=cand
        ).collect()
    }
    assert got == {k: exact[k] for k in [(0, 1), (1, 3), (0, 3)]}


def test_containment_candidates_from_minhash(docs):
    """The documented 100-TB composition: banded minhash candidates at a
    low threshold feed the pair-bounded exact containment verify."""
    cand = dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", jaccard_threshold=0.2
    ).select("doc_a", "doc_b")
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_pairs(
            docs, "text", "doc_id", threshold=0.9, candidates=cand
        ).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_pairs(
            docs, "text", "doc_id", threshold=0.9
        ).collect()
    }
    # banding may drop candidates (recall < 1) but must never invent or
    # mis-score a pair
    assert set(got) <= set(exact)
    for k, v in got.items():
        assert v == exact[k]


# --------------------------------------------------------------------- #
# cdc_chunk_dedup
# --------------------------------------------------------------------- #


def test_cdc_resyncs_after_insertion(spark):
    """The property fixed-width windows lack: an insertion near the doc
    head shifts every token position, but content-defined cut points
    re-sync, so most chunks of the shifted copy still dedup against the
    original."""
    from krnel_graph_spark.functions.dedup import cdc_chunk_dedup

    words = " ".join(f"w{(i * 7) % 97}" for i in range(200))
    df = spark.createDataFrame(
        [(0, words), (1, "inserted prefix " + words), (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           cdc_chunk_dedup(df, "text", "doc_id").collect()}
    # the unshifted original dedups fully against the shifted copy
    assert out[0]["dup_token_fraction"] == 1.0
    # the shifted copy recovers most of its tokens as dups (only the
    # chunk containing the insertion differs)
    assert out[1]["dup_token_fraction"] > 0.5
    assert out[1]["n_dup_chunks"] >= out[1]["n_chunks"] - 2
    # blank doc: zero chunks, fraction 0.0 (present, not dropped)
    assert out[2]["n_chunks"] == 0 and out[2]["dup_token_fraction"] == 0.0


def test_cdc_short_doc_single_chunk(spark):
    from krnel_graph_spark.functions.dedup import cdc_chunk_dedup

    df = spark.createDataFrame(
        [(0, "just three tokens"), (1, "unique words here entirely other")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           cdc_chunk_dedup(df, "text", "doc_id").collect()}
    assert out[0]["n_chunks"] == 1 and out[0]["n_tokens"] == 3
    assert out[0]["n_dup_chunks"] == 0


def test_cdc_partitioning_invariant(spark):
    from krnel_graph_spark.functions.dedup import cdc_chunk_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, cdc_chunk_dedup(docs, "text", "doc_id").collect()))
    b = sorted(map(tuple, cdc_chunk_dedup(
        docs.repartition(13), "text", "doc_id").collect()))
    assert a == b


def test_containment_pair_budget_guard(docs):
    import pytest

    # generous budget: guard job runs, result identical to unguarded
    base = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_pairs(
            docs, "text", "doc_id", threshold=0.9
        ).collect()
    }
    guarded = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_pairs(
            docs, "text", "doc_id", threshold=0.9, pair_budget=10_000_000
        ).collect()
    }
    assert guarded == base
    # hot-shingle corpus under a tiny budget: fails loudly, steering to
    # candidates= instead of silently running the blowup join
    with pytest.raises(ValueError, match="candidates="):
        dedup.containment_pairs(
            docs, "text", "doc_id", threshold=0.9, pair_budget=1
        ).collect()
