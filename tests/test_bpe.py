"""BPE training/encoding tests: the classic Sennrich example, greedy
rank-order application, reconstruction property, and determinism.
"""

from __future__ import annotations

from krnel_graph_spark.functions.text import bpe_encode, train_bpe


def _corpus(spark):
    rows = (
        [(i, "low") for i in range(5)]
        + [(i + 10, "lower") for i in range(2)]
        + [(i + 20, "newest") for i in range(6)]
        + [(i + 30, "widest") for i in range(3)]
    )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_bpe_classic_example(spark):
    """Sennrich's worked example: with freqs low:5 lower:2 newest:6
    widest:3 the frequent 'est</w>' suffix folds first — ties at count 9
    (('e','s'), ('s','t'), ('t','</w>')) break lexicographically."""
    df = _corpus(spark)
    merges = train_bpe(df, "text", n_merges=4, min_freq=1)
    assert merges[0] == ("e", "s")          # 9 occurrences, lexic. first
    assert merges[1] == ("es", "t")         # 9
    assert merges[2] == ("est", "</w>")     # 9
    assert len(merges) == 4


def test_bpe_encode_applies_merges(spark):
    df = _corpus(spark)
    merges = train_bpe(df, "text", n_merges=6, min_freq=1)
    enc = bpe_encode(df, "text", "doc_id", merges)
    pieces = [
        r["piece"]
        for r in enc.filter("doc_id = 20").orderBy("pos").collect()
    ]
    # 'newest' must end with the learned est</w> family merge
    assert any("est</w>" in p for p in pieces)
    # reconstruction: concatenated pieces minus the end marker = the word
    assert "".join(pieces).replace("</w>", "") == "newest"


def test_bpe_reconstruction_property(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "pack my box with five dozen jugs"),
        (2, "The   Quick\tBROWN fox"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, "text", n_merges=10, min_freq=1)
    enc = bpe_encode(df, "text", "doc_id", merges)
    by_doc = {}
    for r in enc.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["piece"]))
    for i, text in rows:
        norm = " ".join(text.lower().split())
        if not norm:
            assert i not in by_doc or by_doc[i] == []
            continue
        joined = "".join(p for _, p in sorted(by_doc[i]))
        assert joined.replace("</w>", " ").strip() == norm, i


def test_train_bpe_deterministic(spark):
    df = _corpus(spark)
    a = train_bpe(df, "text", n_merges=5, min_freq=1)
    b = train_bpe(df, "text", n_merges=5, min_freq=1)
    assert a == b
