"""Bloom prefilter tests: no false negatives, measured pruning on
non-members, and dedup_against(bloom) output identical to the plain
anti-join path.
"""

from __future__ import annotations

from krnel_graph_spark.functions.dedup import (
    bloom_might_contain,
    build_bloom,
    dedup_against,
)


def test_no_false_negatives_and_prunes(spark):
    members = [(f"key-{i}",) for i in range(500)]
    df = spark.createDataFrame(members, "v string")
    bloom = build_bloom(df, "v", bits_per_key=10)
    probe = spark.createDataFrame(
        members + [(f"other-{i}",) for i in range(2000)], "v string"
    )
    got = probe.filter(bloom_might_contain(bloom, "v")).collect()
    vals = {r["v"] for r in got}
    # every member passes
    assert all(f"key-{i}" in vals for i in range(500))
    # non-members mostly pruned (FP rate ~1% at 10 bits/key, k=4)
    fps = sum(1 for v in vals if v.startswith("other-"))
    assert fps < 2000 * 0.05, fps


def test_dedup_against_bloom_equals_plain(spark):
    ref = spark.createDataFrame(
        [(i, f"shared document number {i}") for i in range(50)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100 + i, f"shared document number {i}") for i in range(25)]
        + [(200 + i, f"fresh unseen text {i}") for i in range(25)],
        "doc_id long, text string",
    )
    plain = {
        r["doc_id"]
        for r in dedup_against(new, ref, "text", "doc_id", mode="exact").collect()
    }
    bloomed = {
        r["doc_id"]
        for r in dedup_against(
            new, ref, "text", "doc_id", mode="exact", bloom_bits_per_key=10
        ).collect()
    }
    assert plain == bloomed == {200 + i for i in range(25)}


def test_dedup_against_near_bloom_equals_plain(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    alt = "shuffle partitions broadcast hints adaptive execution skew salting"
    ref = spark.createDataFrame(
        [(i, f"{base} ref variant {i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100 + i, f"{base} ref variant {i % 3}") for i in range(15)]
        + [(200 + i, f"{alt} fresh {i}") for i in range(15)],
        "doc_id long, text string",
    )
    kw = dict(mode="near", num_perm=16, bands=8, jaccard_threshold=0.5)
    plain = {
        r["doc_id"]
        for r in dedup_against(new, ref, "text", "doc_id", **kw).collect()
    }
    bloomed = {
        r["doc_id"]
        for r in dedup_against(
            new, ref, "text", "doc_id", bloom_bits_per_key=10, **kw
        ).collect()
    }
    assert plain == bloomed
    assert all(d >= 200 for d in plain)
