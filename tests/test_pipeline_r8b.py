"""Late-r8 surface: C4 rule bundle, tokenizer fertility, corpus
divergence, Heaps-law vocab growth, and the centroid embedding filter.
Each test pins semantics against a hand-computed or numpy reference."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------- #
# c4_rules
# --------------------------------------------------------------------- #


def _c4_df(spark):
    rows = [
        # doc 0: two good lines, one droppable fragment
        (0, "This is a fine long sentence today.\nshort frag\n"
            "Another proper sentence with enough words here!"),
        # doc 1: javascript line + lorem ipsum page flag
        (1, "Please enable javascript to view this page today.\n"
            "A good clean sentence with many words inside."),
        (2, "Contains Lorem Ipsum filler text in this sentence here."),
        (3, "var x = { a: 1 };\nA perfectly good long sentence right here."),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_c4_line_filter(spark):
    from krnel_graph_spark.functions.text import c4_rules

    out = {
        r["doc_id"]: r
        for r in c4_rules(_c4_df(spark), "text").collect()
    }
    # doc 0: fragment dropped (no terminal punct + <5 words)
    assert out[0]["n_lines"] == 3 and out[0]["n_lines_kept"] == 2
    assert "short frag" not in out[0]["clean_text"]
    # doc 1: javascript line dropped even though it ends in '.'
    assert out[1]["n_lines_kept"] == 1
    assert "javascript" not in out[1]["clean_text"]
    # doc 4: empty page
    assert out[4]["n_lines"] == 1 and out[4]["n_lines_kept"] == 0
    assert out[4]["clean_text"] == ""


def test_c4_page_flags(spark):
    from krnel_graph_spark.functions.text import c4_rules

    out = {
        r["doc_id"]: r
        for r in c4_rules(_c4_df(spark), "text").collect()
    }
    assert not out[2]["r_lorem"] and not out[2]["c4_keep"]
    assert not out[3]["r_brace"] and not out[3]["c4_keep"]
    assert out[0]["r_lorem"] and out[0]["r_brace"]
    # doc 0 kept text has only 2 sentences -> fails min_sentences=3
    assert out[0]["n_sentences"] == 2 and not out[0]["c4_keep"]


def test_c4_keep_positive(spark):
    from krnel_graph_spark.functions.text import c4_rules

    df = spark.createDataFrame(
        [(0, "One good sentence stands right here today.\n"
             "Two more sentences follow with plenty of words. "
             "And a third one closes the paragraph nicely!")],
        "doc_id long, text string",
    )
    row = c4_rules(df, "text").collect()[0]
    assert row["n_sentences"] == 3 and row["c4_keep"]


# --------------------------------------------------------------------- #
# tokenizer_fertility
# --------------------------------------------------------------------- #


def test_tokenizer_fertility_values(spark):
    from krnel_graph_spark.functions.text import tokenizer_fertility

    df = spark.createDataFrame(
        [(0, "en", "hello world."), (1, "en", "a b"), (2, "fr", "déjà vu")],
        "doc_id long, lang string, text string",
    )
    out = {r["lang"]: r for r in tokenizer_fertility(df, "text", "lang").collect()}
    # en: "hello world." = 2 words, 3 subword tokens (hello, world, .)
    #     + "a b" = 2 words, 2 subwords; bytes 12 + 3
    assert out["en"]["n_docs"] == 2
    assert out["en"]["n_words"] == 4
    assert out["en"]["n_subwords"] == 5
    assert out["en"]["n_bytes"] == 15
    assert out["en"]["fertility"] == pytest.approx(5 / 4)
    # fr: déjà = 'd','j'(alnum runs) + 'é','à' punct-class singles
    assert out["fr"]["n_words"] == 2
    assert out["fr"]["n_bytes"] == len("déjà vu".encode())


def test_tokenizer_fertility_global_and_empty(spark):
    from krnel_graph_spark.functions.text import tokenizer_fertility

    df = spark.createDataFrame(
        [(0, ""), (1, None)], "doc_id long, text string"
    )
    row = tokenizer_fertility(df, "text").collect()[0]
    assert row["n_docs"] == 2 and row["n_words"] == 0
    assert row["fertility"] is None and row["bytes_per_token"] is None


# --------------------------------------------------------------------- #
# corpus_divergence
# --------------------------------------------------------------------- #


def _div(spark, a_texts, b_texts):
    from krnel_graph_spark.functions.curation import corpus_divergence

    a = spark.createDataFrame(
        [(i, t) for i, t in enumerate(a_texts)], "id long, text string"
    )
    b = spark.createDataFrame(
        [(i, t) for i, t in enumerate(b_texts)], "id long, text string"
    )
    return corpus_divergence(a, b, "text").collect()[0]


def test_divergence_identical_is_zero(spark):
    r = _div(spark, ["the cat sat", "on the mat"], ["the cat sat on the mat"])
    assert r["js_bits"] == pytest.approx(0.0, abs=1e-9)
    assert r["tv_dist"] == pytest.approx(0.0, abs=1e-9)
    assert r["n_types_shared"] == r["n_types_a"] == r["n_types_b"]


def test_divergence_disjoint_is_one(spark):
    r = _div(spark, ["aa bb cc"], ["xx yy zz"])
    assert r["js_bits"] == pytest.approx(1.0, abs=1e-9)
    assert r["tv_dist"] == pytest.approx(1.0, abs=1e-9)
    assert r["n_types_shared"] == 0


def test_divergence_matches_numpy(spark):
    a_texts = ["the cat sat on the mat", "the dog ran"]
    b_texts = ["the cat ran far away", "a bird flew over the mat"]
    r = _div(spark, a_texts, b_texts)

    def counts(texts):
        c = {}
        for t in texts:
            for w in t.lower().split():
                c[w] = c.get(w, 0) + 1
        return c

    ca, cb = counts(a_texts), counts(b_texts)
    na, nb = sum(ca.values()), sum(cb.values())
    js = tv = 0.0
    for w in set(ca) | set(cb):
        p, q = ca.get(w, 0) / na, cb.get(w, 0) / nb
        m = (p + q) / 2
        if p:
            js += 0.5 * p * math.log2(p / m)
        if q:
            js += 0.5 * q * math.log2(q / m)
        tv += 0.5 * abs(p - q)
    assert r["js_bits"] == pytest.approx(js, abs=1e-6)
    assert r["tv_dist"] == pytest.approx(tv, abs=1e-6)
    assert r["n_tokens_a"] == na and r["n_tokens_b"] == nb


# --------------------------------------------------------------------- #
# vocab_growth
# --------------------------------------------------------------------- #


def test_vocab_growth_monotone_and_deterministic(spark):
    from krnel_graph_spark.functions.text import vocab_growth

    rng = np.random.default_rng(7)
    rows = [
        (i, " ".join(f"w{rng.integers(0, 400)}" for _ in range(30)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(vocab_growth(df, "text", "doc_id").collect(),
                 key=lambda r: r["level"])
    assert len(out) == 8
    toks = [r["n_tokens"] for r in out]
    typs = [r["n_types"] for r in out]
    assert toks == sorted(toks) and typs == sorted(typs)
    assert out[-1]["n_docs"] == 300 and out[-1]["n_tokens"] == 9000
    # full-corpus types match exact distinct count
    expect_types = df.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).distinct().count()
    assert out[-1]["n_types"] == expect_types
    # identical at different parallelism
    out2 = sorted(
        vocab_growth(df.repartition(13), "text", "doc_id").collect(),
        key=lambda r: r["level"],
    )
    assert [tuple(r) for r in out2] == [tuple(r) for r in out]


def test_vocab_growth_beta_matches_polyfit(spark):
    from krnel_graph_spark.functions.text import vocab_growth

    rng = np.random.default_rng(11)
    # zipfian-ish vocabulary so beta is in the classic (0, 1) band
    rows = [
        (i, " ".join(f"w{min(int(rng.pareto(1.1)) , 5000)}"
                     for _ in range(40)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(vocab_growth(df, "text", "doc_id").collect(),
                 key=lambda r: r["level"])
    pts = [(r["n_tokens"], r["n_types"]) for r in out
           if r["n_tokens"] > 0 and r["n_types"] > 0]
    x = np.log10([p[0] for p in pts])
    y = np.log10([p[1] for p in pts])
    beta, log10k = np.polyfit(x, y, 1)
    assert out[0]["heaps_beta"] == pytest.approx(beta, abs=1e-4)
    assert out[0]["heaps_log10_k"] == pytest.approx(log10k, abs=1e-4)
    assert 0.0 < out[0]["heaps_beta"] < 1.0


# --------------------------------------------------------------------- #
# centroid_filter
# --------------------------------------------------------------------- #


def test_centroid_filter_matches_numpy(spark):
    from krnel_graph_spark.functions.similarity import centroid_filter

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    labels = [i % 2 for i in range(50)]
    df = spark.createDataFrame(
        [(i, vecs[i].tolist(), labels[i]) for i in range(50)],
        "vec_id long, embedding array<float>, label int",
    )
    ref = df.filter(F.col("label") == 0)
    out = {
        r["vec_id"]: r
        for r in centroid_filter(df, ref, "embedding", "vec_id", 0.3).collect()
    }
    centroid = np.round(
        vecs[np.array(labels) == 0].astype(np.float64).mean(axis=0), 6
    )
    for i in range(50):
        v = vecs[i].astype(np.float64)
        cos = v @ centroid / (np.linalg.norm(v) * np.linalg.norm(centroid))
        assert out[i]["centroid_cosine"] == pytest.approx(cos, abs=2e-6)
        assert out[i]["keep"] == (out[i]["centroid_cosine"] >= 0.3)


def test_centroid_filter_self_centroid(spark):
    from krnel_graph_spark.functions.similarity import centroid_filter

    df = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    # centroid of label-0 = the vector itself -> cosine 1.0
    out = {
        r["vec_id"]: r["centroid_cosine"]
        for r in centroid_filter(
            df, df.filter(F.col("label") == 0), "embedding", "vec_id"
        ).collect()
    }
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(0.0)


# --------------------------------------------------------------------- #
# fluent OpSpec twins: gopher_rules / c4_rules
# --------------------------------------------------------------------- #


def test_fluent_rule_bundles(lazy_runner):
    ds = lazy_runner.from_parquet("/root/testdata/sf0.001/documents.parquet")
    g = ds.gopher_rules("text")
    c = ds.c4_rules("text")
    gp = lazy_runner.to_pandas(g)
    cp = lazy_runner.to_pandas(c)
    assert {"n_words", "gopher_keep", "r_stopwords"} <= set(gp.columns)
    assert {"clean_text", "c4_keep", "n_lines_kept"} <= set(cp.columns)
    assert len(gp) == len(cp)
    # content-addressing: same spec -> same uuid; different params differ
    ds2 = lazy_runner.from_parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    assert ds2.gopher_rules("text").uuid == g.uuid
    assert ds2.c4_rules("text").uuid == c.uuid
    from krnel_graph_spark.operators.scale_ops import C4RulesOp

    assert C4RulesOp(dataset=ds2, text_column="text",
                     min_sentences=5).uuid != c.uuid


def test_fluent_rule_bundles_memoize(runner):
    ds = runner.from_parquet("/root/testdata/sf0.001/documents.parquet")
    op = ds.c4_rules("text")
    first = runner.to_pandas(op)
    import time

    t0 = time.time()
    again = runner.to_pandas(op)
    assert time.time() - t0 < 2.0
    assert (first["c4_keep"] == again["c4_keep"]).all()


# --------------------------------------------------------------------- #
# hash_embedding
# --------------------------------------------------------------------- #


def test_hash_embedding_matches_numpy(spark):
    from krnel_graph_spark.functions.text import hash_embedding
    import hashlib

    texts = ["the cat sat on the mat", "a b c a b a", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: np.array(r["embedding"])
        for r in hash_embedding(df, "text", "doc_id", dim=16).collect()
    }

    def md5_long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for i, t in enumerate(texts):
        v = np.zeros(16)
        for w in t.lower().split():
            b = md5_long(w) % 16
            v[b] += 1 if md5_long("sign:" + w) % 2 == 0 else -1
        n = np.linalg.norm(v)
        expect = np.round(v / n, 6) if n > 0 else v
        assert out[i] == pytest.approx(expect, abs=1e-9), i
    # blank doc -> exact zero vector, still present
    assert (out[2] == 0.0).all() and len(out) == 3


def test_hash_embedding_feeds_cosine_topk(spark):
    """The bridge works end-to-end: hashed embeddings rank a doc's
    nearest neighbor as its near-duplicate."""
    from krnel_graph_spark.functions.text import hash_embedding
    from krnel_graph_spark.functions.similarity import cosine_topk

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over a lazy dog",
        "completely different subject matter entirely here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    emb = hash_embedding(df, "text", "doc_id", dim=64)
    top = cosine_topk(
        emb, emb.filter(F.col("doc_id") == 0), "embedding", "doc_id", k=2
    ).collect()
    ranked = sorted(top, key=lambda r: r["rank"])
    # cosine_topk excludes self-matches: rank 1 = the near-dup
    assert ranked[0]["doc_id"] == 1
    assert ranked[1]["doc_id"] == 2
    assert ranked[0]["cosine"] > ranked[1]["cosine"]


# --------------------------------------------------------------------- #
# dedup_report
# --------------------------------------------------------------------- #


def test_dedup_report_histogram(spark):
    from krnel_graph_spark.functions.dedup import dedup_report

    dup = "the same long sentence repeated for the dedup test with words"
    texts = [dup, dup, dup,                       # one 3-cluster
             "another duplicated chunk of text right here okay",
             "another duplicated chunk of text right here okay",  # a pair
             "a totally unique document one",
             "a totally unique document two two",
             "a totally unique document three three three"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["cluster_size"]: r
        for r in dedup_report(df, "text", "doc_id").collect()
    }
    assert out[3]["n_clusters"] == 1 and out[3]["n_docs"] == 3
    assert out[2]["n_clusters"] == 1 and out[2]["n_docs"] == 2
    assert out[1]["n_clusters"] == 3 and out[1]["n_docs"] == 3
    assert sum(r["n_docs"] for r in out.values()) == len(texts)


def test_dedup_report_all_unique(spark):
    from krnel_graph_spark.functions.dedup import dedup_report

    df = spark.createDataFrame(
        [(i, f"unique text number {i} with filler words {i * 7}")
         for i in range(6)],
        "doc_id long, text string",
    )
    rows = dedup_report(df, "text", "doc_id").collect()
    assert len(rows) == 1
    assert rows[0]["cluster_size"] == 1 and rows[0]["n_docs"] == 6


# --------------------------------------------------------------------- #
# random_projection
# --------------------------------------------------------------------- #


def test_random_projection_matches_numpy(spark):
    from krnel_graph_spark.functions.vector import (
        random_projection,
        random_projection_signs,
    )

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(20, 32)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: np.array(r["projected"])
        for r in random_projection(
            df, "embedding", "vec_id", in_dim=32, out_dim=8
        ).collect()
    }
    R = np.array(random_projection_signs(32, 8))  # (out, in)
    expect = vecs.astype(np.float64) @ R.T / np.sqrt(8)
    for i in range(20):
        assert out[i] == pytest.approx(np.round(expect[i], 6), abs=1e-9)


def test_random_projection_preserves_distances(spark):
    """JL sanity: relative pairwise distances survive 64 -> 16 within
    loose distortion bounds on a random cloud."""
    from krnel_graph_spark.functions.vector import random_projection

    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(30, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: np.array(r["projected"])
        for r in random_projection(
            df, "embedding", "vec_id", in_dim=64, out_dim=16
        ).collect()
    }
    orig = vecs.astype(np.float64)
    ratios = []
    for a in range(0, 30, 7):
        for b in range(a + 1, 30, 5):
            d0 = np.linalg.norm(orig[a] - orig[b])
            d1 = np.linalg.norm(out[a] - out[b])
            ratios.append(d1 / d0)
    ratios = np.array(ratios)
    # Achlioptas sign projection at out_dim=16: distortion well inside
    # [0.4, 1.8] for a 30-point Gaussian cloud (loose, flake-proof band)
    assert (ratios > 0.4).all() and (ratios < 1.8).all()


# --------------------------------------------------------------------- #
# export_manifest
# --------------------------------------------------------------------- #


def test_export_manifest_detects_tamper(spark):
    from krnel_graph_spark.functions.sampling import export_manifest

    df = spark.createDataFrame(
        [(i, f"document body number {i}") for i in range(40)],
        "doc_id long, text string",
    )
    base = {r["shard"]: r for r in
            export_manifest(df, "text", "doc_id", num_shards=4).collect()}
    assert sum(r["n_rows"] for r in base.values()) == 40

    # corrupting one row flips exactly that shard's checksum
    tampered = df.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit("CORRUPTED")).otherwise(
            F.col("text")
        ),
    )
    after = {r["shard"]: r for r in
             export_manifest(tampered, "text", "doc_id", num_shards=4).collect()}
    diffs = [s for s in base
             if base[s]["checksum_xor"] != after[s]["checksum_xor"]]
    assert len(diffs) == 1
    # row/byte counts in the untouched shards are identical
    for s in base:
        if s not in diffs:
            assert tuple(base[s]) == tuple(after[s])


def test_export_manifest_order_independent(spark):
    from krnel_graph_spark.functions.sampling import export_manifest

    df = spark.createDataFrame(
        [(i, f"text {i} body") for i in range(30)],
        "doc_id long, text string",
    )
    a = sorted(tuple(r) for r in
               export_manifest(df, "text", "doc_id", 4).collect())
    b = sorted(tuple(r) for r in
               export_manifest(df.repartition(11), "text", "doc_id", 4).collect())
    assert a == b


def test_export_manifest_dropped_row_changes_count_and_xor(spark):
    from krnel_graph_spark.functions.sampling import export_manifest

    df = spark.createDataFrame(
        [(i, f"payload {i}") for i in range(24)],
        "doc_id long, text string",
    )
    base = {r["shard"]: r for r in
            export_manifest(df, "text", "doc_id", 3).collect()}
    dropped = {r["shard"]: r for r in
               export_manifest(df.filter(F.col("doc_id") != 5),
                               "text", "doc_id", 3).collect()}
    changed = [s for s in base
               if tuple(base[s]) != tuple(dropped.get(s, ()))]
    assert len(changed) == 1
    s = changed[0]
    assert base[s]["n_rows"] == dropped[s]["n_rows"] + 1
    assert base[s]["checksum_xor"] != dropped[s]["checksum_xor"]


# --------------------------------------------------------------------- #
# k_anonymity / schema_drift
# --------------------------------------------------------------------- #


def test_k_anonymity_histogram(spark):
    from krnel_graph_spark.functions.curation import k_anonymity

    rows = (
        [(i, "a", 1) for i in range(6)]          # class of 6: safe at k=5
        + [(10 + i, "a", 2) for i in range(3)]   # class of 3: at risk
        + [(20, "b", 1)]                         # singleton: at risk
    )
    df = spark.createDataFrame(rows, "id long, seg string, nat int")
    out = {r["class_size"]: r
           for r in k_anonymity(df, ["seg", "nat"], k=5).collect()}
    assert out[6]["n_classes"] == 1 and not out[6]["at_risk"]
    assert out[3]["n_classes"] == 1 and out[3]["at_risk"]
    assert out[1]["n_classes"] == 1 and out[1]["at_risk"]
    assert sum(r["n_rows"] for r in out.values()) == 10


def test_schema_drift_statuses_and_counts(spark):
    from krnel_graph_spark.functions.curation import schema_drift

    old = spark.createDataFrame(
        [(1, "x", 5), (2, None, 5), (3, "y", None)],
        "id long, a string, gone int",
    )
    new = spark.createDataFrame(
        [(1, "x", 1.5), (2, "x", 2.5)],
        "id long, a string, added double",
    )
    out = {r["col_name"]: r for r in schema_drift(old, new).collect()}
    assert out["gone"]["status"] == "removed"
    assert out["gone"]["type_old"] == "int" and out["gone"]["type_new"] is None
    assert out["added"]["status"] == "added"
    assert out["added"]["type_new"] == "double"
    assert out["id"]["status"] == "common"
    assert out["id"]["ndv_old"] == 3 and out["id"]["ndv_new"] == 2
    assert out["a"]["n_null_old"] == 1 and out["a"]["n_null_new"] == 0
    assert out["a"]["ndv_old"] == 2 and out["a"]["ndv_new"] == 1
    assert len(out) == 4


# --------------------------------------------------------------------- #
# unicode_normalize
# --------------------------------------------------------------------- #


def test_unicode_normalize_differential(spark):
    import unicodedata
    from krnel_graph_spark.functions.text import unicode_normalize

    texts = [
        "ﬁne ｆｕｌｌwidth ①",              # NFKC folds ligature/fullwidth/circled
        "curly ‘quotes’ and “more” — dash−minus",
        "zero​width‍ and nbsp",
        "ctrl\x07bell kept\ttab\nnewline",
        "plain ascii unchanged",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           unicode_normalize(df, "text", "doc_id").collect()}
    trans = str.maketrans({
        "‘": "'", "’": "'", "“": '"', "”": '"',
        "–": "-", "—": "-", "−": "-", " ": " ",
        "​": None, "‌": None, "‍": None, "﻿": None,
    })
    ctrl = {c: None for c in range(32) if chr(c) not in "\n\t"}
    for i, t in enumerate(texts):
        expect = unicodedata.normalize("NFKC", t).translate(trans).translate(ctrl)
        assert out[i]["text"] == expect, i
        assert out[i]["n_changed"] == int(expect != t)
    assert out[4]["n_changed"] == 0 and out[0]["n_changed"] == 1
    assert "\x07" not in out[3]["text"] and "\t" in out[3]["text"]


def test_unicode_normalize_idempotent(spark):
    from krnel_graph_spark.functions.text import unicode_normalize

    df = spark.createDataFrame(
        [(0, "ﬁ ‘x’ — ​ ｆ")], "doc_id long, text string"
    )
    once = unicode_normalize(df, "text", "doc_id").collect()[0]["text"]
    again = unicode_normalize(
        spark.createDataFrame([(0, once)], "doc_id long, text string"),
        "text", "doc_id",
    ).collect()[0]
    assert again["text"] == once and again["n_changed"] == 0


def test_unicode_normalize_oracle_precondition_ascii():
    """The r9 unicode_normalize oracle replays only the non-NFKC stages
    in SQL; its correctness on the gate corpus rests on NFKC being the
    identity there — i.e. documents.text is pure ASCII. Pin that
    precondition so a future testdata regen that introduces non-ASCII
    text fails loudly here instead of silently hash-mismatching."""
    import glob
    import duckdb

    paths = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    assert paths, "testdata missing"
    con = duckdb.connect()
    for p in paths:
        n = con.execute(
            "SELECT count(*) FROM read_parquet(?) "
            r"WHERE NOT regexp_matches(coalesce(text,''), '^[\x00-\x7f]*$')",
            [p],
        ).fetchone()[0]
        assert n == 0, f"non-ASCII text in {p}: {n} rows"


# --------------------------------------------------------------------- #
# margin_pairs
# --------------------------------------------------------------------- #


def test_margin_pairs_hub_filtered(spark):
    """A distinctive match survives; a hub (close to two candidates at
    once) fails the margin even though its absolute cosine is high."""
    from krnel_graph_spark.functions.similarity import margin_pairs

    a = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    b = spark.createDataFrame(
        [
            (10, [0.99, 0.1, 0.0]),   # distinctive match for query 0
            (11, [0.0, 0.2, 0.98]),
            (12, [0.1, 0.99, 0.0]),   # near-tie pair for query 1 (hub)
            (13, [0.12, 0.99, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["query_id"]: r
        for r in margin_pairs(
            a, b, "embedding", "vec_id",
            margin_threshold=0.05, min_cosine=0.5,
        ).collect()
    }
    assert out[0]["match_id"] == 10 and out[0]["keep"]
    assert out[0]["margin"] > 0.5
    # query 1's two candidates are nearly equidistant -> margin tiny
    assert not out[1]["keep"] and out[1]["margin"] < 0.05
    assert out[1]["cosine"] > 0.9  # absolute cosine alone would pass


def test_margin_pairs_single_candidate(spark):
    from krnel_graph_spark.functions.similarity import margin_pairs

    a = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    b = spark.createDataFrame(
        [(10, [0.9, 0.1])], "vec_id long, embedding array<float>"
    )
    row = margin_pairs(a, b, "embedding", "vec_id").collect()[0]
    # no runner-up: margin equals the cosine
    assert row["margin"] == row["cosine"] and row["keep"]


def test_margin_pairs_candidates_shortlist_matches_brute(spark):
    from krnel_graph_spark.functions.similarity import (
        cosine_topk,
        margin_pairs,
    )

    a = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.5, 0.5, 0.0])],
        "vec_id long, embedding array<float>",
    )
    b = spark.createDataFrame(
        [
            (10, [0.95, 0.05, 0.0]),
            (11, [0.9, 0.1, 0.0]),
            (12, [0.0, 0.98, 0.1]),
            (13, [0.1, 0.9, 0.2]),
        ],
        "vec_id long, embedding array<float>",
    )
    brute = {
        r["query_id"]: r
        for r in margin_pairs(a, b, "embedding", "vec_id").collect()
    }
    # an exact top-4 shortlist is a superset of the true top-2, so the
    # candidates path must reproduce the brute result row-for-row
    cands = cosine_topk(b, a, "embedding", "vec_id", k=4)
    short = {
        r["query_id"]: r
        for r in margin_pairs(
            a, b, "embedding", "vec_id", candidates=cands
        ).collect()
    }
    assert set(brute) == set(short)
    for q in brute:
        for f in ("match_id", "cosine", "margin", "keep"):
            assert brute[q][f] == short[q][f], (q, f)


def test_margin_pairs_candidates_missing_runner_up(spark):
    from krnel_graph_spark.functions.similarity import margin_pairs

    a = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    b = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.8, 0.2])],
        "vec_id long, embedding array<float>",
    )
    # shortlist that only surfaced ONE candidate: margin = cosine,
    # exactly the single-candidate brute semantics
    cands = spark.createDataFrame(
        [(0, 10, 0.993884)], "query_id long, doc_id long, cosine double"
    )
    row = margin_pairs(
        a, b, "embedding", "vec_id", candidates=cands
    ).collect()[0]
    assert row["match_id"] == 10
    assert row["margin"] == row["cosine"] and row["keep"]


def test_bpe_oracle_precondition_no_separator_char():
    """The r10 bpe_encode SQL oracle wraps symbols with chr(31); its
    replace-chain replay is sound only while the corpus never contains
    that byte. Pin the precondition across every testdata SF so a
    regen that introduces 0x1F fails loudly here."""
    import glob

    import duckdb

    paths = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    assert paths, "testdata missing"
    con = duckdb.connect()
    for p in paths:
        n = con.execute(
            "SELECT count(*) FROM read_parquet(?) "
            "WHERE contains(coalesce(text,''), chr(31))",
            [p],
        ).fetchone()[0]
        assert n == 0, f"0x1F separator byte in {p}: {n} rows"


def test_bpe_independent_trainer_matches_distributed(spark):
    """The gate oracle's from-scratch Python BPE trainer must learn the
    same merge list as the distributed train_bpe — the differential that
    makes the SQL encode replay an actual check of training."""
    import os

    import __spark_entry__ as em
    from krnel_graph_spark.functions import text as tx

    docs = em._docs(spark, "/root/testdata/sf0.001")
    dist = tx.train_bpe(docs, "text", n_merges=20, min_freq=2)
    old = os.environ.get(em._GATE_SF_DIR_ENV)
    os.environ[em._GATE_SF_DIR_ENV] = "/root/testdata/sf0.001"
    try:
        ind = em._bpe_merges_independent()
    finally:
        if old is None:
            os.environ.pop(em._GATE_SF_DIR_ENV, None)
        else:
            os.environ[em._GATE_SF_DIR_ENV] = old
    assert dist == ind


def test_margin_pairs_candidates_duplicate_rows_deduped(spark):
    from krnel_graph_spark.functions.similarity import margin_pairs

    a = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    b = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    # a multiprobe/multi-table shortlist that surfaced doc 10 TWICE:
    # without the dedupe doc 10 takes ranks 1 AND 2 and the margin
    # collapses to 0, silently dropping the true keep
    cands = spark.createDataFrame(
        [(0, 10, 0.993884), (0, 10, 0.993884), (0, 11, 0.707107)],
        "query_id long, doc_id long, cosine double",
    )
    row = margin_pairs(
        a, b, "embedding", "vec_id", candidates=cands, margin_threshold=0.1
    ).collect()[0]
    assert row["match_id"] == 10
    # margin vs the TRUE runner-up (doc 11), not the duplicate of doc 10
    assert row["margin"] == pytest.approx(0.993884 - 0.707107, abs=1e-5)
    assert row["keep"]


def test_cdc_chunk_dedup_rejects_bad_params(spark):
    from krnel_graph_spark.functions.dedup import cdc_chunk_dedup

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window"):
        cdc_chunk_dedup(df, "text", "doc_id", window=0)
    with pytest.raises(ValueError, match="modulus"):
        cdc_chunk_dedup(df, "text", "doc_id", modulus=0)


def test_data_budget_planned_but_missing_stratum(spark):
    from pyspark.sql import functions as F

    from krnel_graph_spark.functions.sampling import data_budget

    df = spark.createDataFrame(
        [("web", 10), ("web", 20), ("books", 100)],
        "source string, n_tok int",
    )
    out = {
        r["source"]: r
        for r in data_budget(
            df,
            "source",
            F.col("n_tok"),
            budget=1000,
            weights={"web": 0.5, "books": 0.3, "wiki": 0.2},
        ).collect()
    }
    # the planned-but-absent stratum still gets a row — silently
    # dropping it would hide the loudest planner failure
    assert set(out) == {"web", "books", "wiki"}
    wiki = out["wiki"]
    assert wiki["n_docs"] == 0 and wiki["n_tokens"] == 0
    assert wiki["target_tokens"] == 200
    assert wiki["epochs"] is None and wiki["over_cap"] is False
    # present strata unchanged by the outer join
    assert out["web"]["n_docs"] == 2 and out["web"]["n_tokens"] == 30


def test_kcenter_empty_input_keeps_id_type(spark):
    from krnel_graph_spark.functions.similarity import kcenter_select

    emb = spark.createDataFrame([], "name string, embedding array<float>")
    out = kcenter_select(emb, "embedding", "name", k=3)
    assert out.count() == 0
    assert dict(out.dtypes)["name"] == "string"

    # all-zero-norm corpus hits the same early return — schema must
    # still mirror the input id type
    zeros = spark.createDataFrame(
        [("a", [0.0, 0.0])], "name string, embedding array<float>"
    )
    out2 = kcenter_select(zeros, "embedding", "name", k=2)
    assert out2.count() == 0
    assert dict(out2.dtypes)["name"] == "string"


def test_schema_drift_approx_mode(spark):
    from krnel_graph_spark.functions.curation import schema_drift

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    old = docs.select("doc_id", "text", "lang")
    exact = {r["col_name"]: r for r in schema_drift(old, docs).collect()}
    approx = {
        r["col_name"]: r
        for r in schema_drift(old, docs, approx=True).collect()
    }
    assert set(exact) == set(approx)
    for c in exact:
        # statuses, types, and null counters stay exact; only NDVs
        # become HLL estimates (rsd 5% default)
        for f in ("status", "type_old", "type_new", "n_null_old",
                  "n_null_new"):
            assert exact[c][f] == approx[c][f], (c, f)
        if exact[c]["status"] == "common":
            for f in ("ndv_old", "ndv_new"):
                assert approx[c][f] == pytest.approx(
                    exact[c][f], rel=0.15
                ), (c, f)
    # the whole point of approx: the exact mode's Expand (one re-emit
    # per counted column) must be gone from the plan
    plan = schema_drift(old, docs, approx=True)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Expand" not in plan
    plan_exact = schema_drift(old, docs)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Expand" in plan_exact


# --------------------------------------------------------------------- #
# remove_duplicated_windows (r9)
# --------------------------------------------------------------------- #


def test_remove_dup_windows_excises_non_canonical(spark):
    from krnel_graph_spark.functions.dedup import remove_duplicated_windows

    w = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [
            (0, w + " tail1 tail2 tail3 tail4"),
            # the same 8-token passage, window-aligned at start 4
            (1, "p1 p2 p3 p4 " + w),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_windows(
            docs, "text", "doc_id", width=8, stride=4
        ).collect()
    }
    # doc 0 holds the canonical occurrence (min (id, start)) -> intact
    assert out[0]["clean_text"] == w + " tail1 tail2 tail3 tail4"
    assert out[0]["n_kept"] == out[0]["n_tokens"] == 12
    # doc 1 loses exactly the duplicated window's tokens
    assert out[1]["clean_text"] == "p1 p2 p3 p4"
    assert out[1]["n_tokens"] == 12 and out[1]["n_kept"] == 4


def test_remove_dup_windows_short_doc_fully_duplicated(spark):
    from krnel_graph_spark.functions.dedup import remove_duplicated_windows

    docs = spark.createDataFrame(
        [(0, "hello dup world"), (1, "hello dup world"), (2, "unique text")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_windows(
            docs, "text", "doc_id", width=8, stride=4
        ).collect()
    }
    assert out[0]["clean_text"] == "hello dup world"  # canonical copy
    assert out[1]["clean_text"] == "" and out[1]["n_kept"] == 0
    assert out[2]["clean_text"] == "unique text"


def test_remove_dup_windows_within_doc_repetition(spark):
    from krnel_graph_spark.functions.dedup import remove_duplicated_windows

    w = "r1 r2 r3 r4 r5 r6 r7 r8"
    docs = spark.createDataFrame(
        [(0, w + " " + w)], "doc_id long, text string"
    )
    row = remove_duplicated_windows(
        docs, "text", "doc_id", width=8, stride=4
    ).collect()[0]
    # the second occurrence (start 8) is excised; the first survives
    assert row["clean_text"] == w
    assert row["n_tokens"] == 16 and row["n_kept"] == 8


def test_remove_dup_windows_matches_stats_totals(spark):
    from krnel_graph_spark.functions.dedup import (
        duplicate_window_stats,
        remove_duplicated_windows,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    stats = duplicate_window_stats(docs, "text", "doc_id")
    surg = remove_duplicated_windows(docs, "text", "doc_id")
    # every doc the stats op flags with dup windows must lose tokens
    # (or hold only canonical occurrences); docs with zero dup windows
    # must come back intact
    s = {r["doc_id"]: r for r in stats.collect()}
    g = {r["doc_id"]: r for r in surg.collect()}
    assert set(s) == set(g)
    for d, row in g.items():
        if s[d]["dup_windows"] == 0:
            assert row["n_kept"] == row["n_tokens"], d


# --------------------------------------------------------------------- #
# data_budget
# --------------------------------------------------------------------- #


def test_data_budget_epoch_planner_contracts(spark):
    from krnel_graph_spark.functions.sampling import data_budget

    df = spark.createDataFrame(
        [
            (0, "wiki", "a b c d"),          # 4 tokens
            (1, "wiki", "e f g h"),          # 4 tokens
            (2, "web", "i j"),               # 2 tokens
            (3, "code", ""),                 # 0 tokens (blank)
            (4, "unlisted", "k l m"),        # absent from weights
        ],
        "doc_id long, source string, text string",
    )
    from krnel_graph_spark.functions import text as tx

    out = {
        r["source"]: r
        for r in data_budget(
            df,
            "source",
            tx.token_count("text"),
            budget=100,
            weights={"wiki": 0.5, "web": 0.25, "code": 0.25},
            epoch_cap=4.0,
        ).collect()
    }
    # wiki: 8 tokens available, target 50 -> 6.25 epochs, over cap
    assert out["wiki"]["n_docs"] == 2 and out["wiki"]["n_tokens"] == 8
    assert out["wiki"]["target_tokens"] == 50
    assert out["wiki"]["epochs"] == 6.25 and out["wiki"]["over_cap"]
    # web: 2 tokens, target 25 -> 12.5 epochs
    assert out["web"]["epochs"] == 12.5 and out["web"]["over_cap"]
    # code: zero tokens available -> epochs NULL, over_cap false (not null)
    assert out["code"]["target_tokens"] == 25
    assert out["code"]["epochs"] is None and out["code"]["over_cap"] is False
    # unlisted source: weight 0, target 0, epochs 0, not over cap
    assert out["unlisted"]["weight"] == 0.0
    assert out["unlisted"]["target_tokens"] == 0
    assert out["unlisted"]["epochs"] == 0.0 and not out["unlisted"]["over_cap"]


def test_data_budget_non_string_strata(spark):
    """Marker zero-rows must cast to the strata column's type: an int
    source column with weights keyed by int must not fail unionByName
    on a type mismatch (regression guard for the literal-typed marker)."""
    from pyspark.sql import functions as F

    from krnel_graph_spark.functions.sampling import data_budget

    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "src int, toks int"
    )
    rows = {
        r["source"]: r
        for r in data_budget(
            df, "src", F.col("toks"), budget=100,
            weights={1: 0.5, 2: 0.25, 3: 0.25},
        ).collect()
    }
    assert rows[1]["n_tokens"] == 30 and rows[2]["n_tokens"] == 5
    # planned-but-missing stratum 3 still surfaces, typed as int
    assert rows[3]["n_docs"] == 0 and rows[3]["epochs"] is None
