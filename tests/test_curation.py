"""Corpus-curation operators: group caps, PII scrubbing, domain stats,
sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions.curation import (
    domain_stats,
    group_cap,
    pii_scrub,
    sequence_pack,
    url_domain,
)


def test_group_cap_deterministic(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(3)],
        "k string, v long",
    )
    out = group_cap(df, "k", 5, "v")
    got = sorted((r["k"], r["v"]) for r in out.collect())
    assert got == [("a", i) for i in range(5)] + [("b", i) for i in range(3)]

    # Descending order via a second run on negated order column.
    out2 = group_cap(df.withColumn("neg", -F.col("v")), "k", 2, "neg")
    assert sorted(r["v"] for r in out2.filter("k='a'").collect()) == [8, 9]


def test_group_cap_no_internal_column_leak(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    assert group_cap(df, "k", 1, "v").columns == ["k", "v"]


@pytest.mark.parametrize(
    "raw,want",
    [
        ("mail me at john.doe+spam@sub.example.co.uk now",
         "mail me at <EMAIL> now"),
        ("call (415) 555-2671 or 415.555.2671",
         "call <PHONE> or <PHONE>"),
        ("ssn 123-45-6789 leaked", "ssn <SSN> leaked"),
        ("server 192.168.0.1 and 10.0.0.7", "server <IP> and <IP>"),
        ("no pii here 12345", "no pii here 12345"),
        ("a@b.io,9 weird", "<EMAIL>,9 weird"),
        # SSN-before-phone order: the 3-2-4 shape must NOT become <PHONE>.
        ("id 123-45-6789", "id <SSN>"),
    ],
)
def test_pii_scrub_patterns(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "text string")
    assert df.select(pii_scrub("text").alias("c")).first()["c"] == want


def test_url_domain_and_stats(spark):
    df = spark.createDataFrame(
        [("https://WWW.Example.COM/a/b?q=1",),
         ("http://sub.site.org:8080/path",),
         ("ftp://files.example.com/x",),
         ("www.example.com/bare",),
         ("not a url",)],
        "url string",
    )
    doms = [r["d"] for r in df.select(url_domain("url").alias("d")).collect()]
    assert doms == [
        "www.example.com", "sub.site.org", "files.example.com",
        "www.example.com", "not",  # regex takes first path-free token
    ]
    stats = {r["domain"]: r["n_pages"] for r in domain_stats(df, "url").collect()}
    assert stats["www.example.com"] == 2


def test_sequence_pack_offsets(spark):
    # tokens: 800, 800, 800, 100 -> offsets 0, 800, 1600, 2400
    # budget 1000 -> packs 0, 0, 1, 2
    df = spark.createDataFrame(
        [(1, 800), (2, 800), (3, 800), (4, 100)], "doc long, tok long"
    )
    out = sequence_pack(df, "doc", "tok", budget=1000)
    got = {r["doc"]: r["pack_id"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 2}


def test_sequence_pack_partitioned_independent(spark):
    df = spark.createDataFrame(
        [("x", 1, 600), ("x", 2, 600), ("y", 3, 600), ("y", 4, 600)],
        "src string, doc long, tok long",
    )
    out = sequence_pack(df, "doc", "tok", budget=1000, partition_by="src")
    got = {r["doc"]: r["pack_id"] for r in out.collect()}
    # Each src packs from offset 0: second doc of each starts at 600 -> pack 0.
    assert got == {1: 0, 2: 0, 3: 0, 4: 0}
    out2 = sequence_pack(df, "doc", "tok", budget=500, partition_by="src")
    got2 = {r["doc"]: r["pack_id"] for r in out2.collect()}
    assert got2 == {1: 0, 2: 1, 3: 0, 4: 1}


def test_sequence_pack_total_conservation(spark):
    """Every document lands in exactly one pack; pack ids are dense from 0
    per partition."""
    import random

    rng = random.Random(7)
    rows = [("s%d" % (i % 3), i, rng.randint(1, 400)) for i in range(200)]
    df = spark.createDataFrame(rows, "src string, doc long, tok long")
    out = sequence_pack(df, "doc", "tok", budget=1000, partition_by="src").cache()
    assert out.count() == 200
    for src in ("s0", "s1", "s2"):
        packs = sorted(
            r["pack_id"] for r in out.filter(F.col("src") == src)
            .select("pack_id").distinct().collect()
        )
        assert packs == list(range(len(packs)))  # dense, starts at 0
    out.unpersist()


# ---------------------------------------------------------------- #
# decontaminate                                                     #
# ---------------------------------------------------------------- #


def test_decontaminate_known_overlap(spark):
    from krnel_graph_spark.functions.curation import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap at all here"),
            (3, "quick brown fox jumps again and again and again today"),
            (4, None),
        ],
        "doc_id BIGINT, text STRING",
    )
    test = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps high")],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(train, test, "text", "doc_id", n=4).collect()
    }
    # test 4-grams include "the quick brown fox", "quick brown fox jumps"
    # -> doc 1 shares both; doc 3 shares only "quick brown fox jumps".
    assert out == {1: 2, 3: 1}


def test_decontaminate_no_broadcast_path_same_result(spark):
    from krnel_graph_spark.functions.curation import decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    test = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    a = sorted(
        map(tuple, decontaminate(train, test, "text", "doc_id", n=3).collect())
    )
    b = sorted(
        map(
            tuple,
            decontaminate(
                train, test, "text", "doc_id", n=3, broadcast_test=False
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


# ---------------------------------------------------------------- #
# repetition_stats (Gopher signals) — pandas differential           #
# ---------------------------------------------------------------- #


def _py_repetition(rows):
    import re

    out = {}
    for doc_id, text in rows:
        if text is None:
            out[doc_id] = (None, None, 0.0)
            continue
        lines = [l for l in text.split("\n") if l != ""]
        n_lines = len(lines)
        dup = 0.0 if n_lines == 0 else (n_lines - len(set(lines))) / n_lines
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        toks = norm.split(" ") if norm else [""]
        bgs = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        if not bgs:
            top = 0.0
        else:
            from collections import Counter

            top = max(Counter(bgs).values()) / len(bgs)
        out[doc_id] = (n_lines, dup, top)
    return out


def test_repetition_stats_differential(spark):
    from krnel_graph_spark.functions.text import repetition_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    extra = spark.createDataFrame(
        [
            (9001, ""),
            (9002, "\n\n\n"),
            (9003, "same line\nsame line\nsame line\nother"),
            (9004, "word"),
            (9005, "a b a b a b a b"),
            (9006, None),
            (9007, "  \t spaced\nout \n"),
        ],
        "doc_id BIGINT, text STRING",
    ).select("doc_id", "text")
    both = docs.select("doc_id", "text").unionByName(extra)
    got = {
        r["doc_id"]: (r["n_lines"], r["dup_line_frac"], r["top_bigram_frac"])
        for r in repetition_stats(both, "text", "doc_id").collect()
    }
    want = _py_repetition([(r["doc_id"], r["text"]) for r in both.collect()])
    assert set(got) == set(want)
    for k in want:
        gn, gd, gt = got[k]
        wn, wd, wt = want[k]
        assert gn == wn, (k, got[k], want[k])
        for g, w in ((gd, wd), (gt, wt)):
            if w is None:
                assert g is None, (k, got[k], want[k])
            else:
                assert abs(g - w) < 1e-12, (k, got[k], want[k])


# --------------------------------------------------------------------- #
# canonical_url / dedup_by_url                                            #
# --------------------------------------------------------------------- #


def test_canonical_url_cases(spark):
    from krnel_graph_spark.functions.curation import canonical_url

    cases = [
        ("HTTPS://WWW.Site.COM/Path/", "https://site.com/Path"),
        ("http://site.com/a?utm_source=x&b=1", "http://site.com/a?b=1"),
        ("http://site.com/a?utm_a=1&utm_b=2", "http://site.com/a"),
        ("http://site.com/a?b=1&fbclid=xyz#frag", "http://site.com/a?b=1"),
        ("http://site.com/a?ref=feed", "http://site.com/a"),
        ("http://site.com/#x", "http://site.com"),
        ("https://www.x.org", "https://x.org"),
        # path case preserved; params other than tracking preserved
        ("https://A.B/Q?page=2&utm_c=3", "https://a.b/Q?page=2"),
        # no scheme: host-lowering skipped, other steps still apply
        ("WWW.Site.com/a/#f", "WWW.Site.com/a"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "id long, url string"
    )
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonical_url("url").alias("c")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_dedup_by_url(spark):
    from krnel_graph_spark.functions.curation import dedup_by_url

    rows = [
        (1, "https://www.a.com/x"),
        (2, "HTTPS://A.com/x/"),      # canonical dup of 1
        (3, "https://a.com/y"),
        (4, None),                     # null urls always kept
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"] for r in dedup_by_url(df, "url", "id").collect()}
    assert got == {1, 3, 4, 5}


# --------------------------------------------------------------------- #
# paragraph_dedup
# --------------------------------------------------------------------- #


def _pd_rows(spark, docs):
    from krnel_graph_spark.functions.curation import paragraph_dedup

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = paragraph_dedup(df, "text", "doc_id")
    return {
        r["doc_id"]: (r["text"], r["n_paras"], r["n_kept"])
        for r in out.collect()
    }


def test_paragraph_dedup_first_occurrence_and_drop(spark):
    got = _pd_rows(
        spark,
        [(1, "A\nB\nC"), (2, "A\nD"), (3, "A\nB")],
    )
    # Doc 1 hosts the first occurrence of everything it contains.
    assert got[1] == ("A\nB\nC", 3, 3)
    # Doc 2 loses the boilerplate 'A', keeps its unique body.
    assert got[2] == ("D", 2, 1)
    # Doc 3 is ALL boilerplate -> dropped entirely (CCNet semantics).
    assert 3 not in got


def test_paragraph_dedup_reassembly_preserves_order(spark):
    got = _pd_rows(spark, [(1, "X\nY"), (2, "X\nZ\nY\nW")])
    # Survivors Z and W are non-contiguous in doc 2; original order kept.
    assert got[2] == ("Z\nW", 4, 2)


def test_paragraph_dedup_within_doc_repeat(spark):
    # A paragraph repeated INSIDE one doc keeps only its first slot.
    got = _pd_rows(spark, [(7, "P\nQ\nP")])
    assert got[7] == ("P\nQ", 3, 2)


def test_ngram_coverage_full_partial_zero(spark):
    from krnel_graph_spark.functions.curation import ngram_coverage

    train = spark.createDataFrame(
        [(0, "a b c d e f g h i j")], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [
            (10, "a b c d e f g h i j"),   # fully contained
            (11, "a b c d e f g h X Y"),   # one shared 8-gram of three
            (12, "p q r s t u v w x y"),   # disjoint
            (13, "too short"),             # < 8 tokens -> no row
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit"])
        for r in ngram_coverage(train, test, "text", "doc_id", n=8).collect()
    }
    assert got[10] == (3, 3)
    assert got[11] == (3, 1)
    assert got[12] == (3, 0)
    assert 13 not in got


def test_paragraph_dedup_identity_when_all_unique(spark):
    """If every paragraph is globally unique the op must be a lossless
    round-trip (text, count, and membership all preserved)."""
    from krnel_graph_spark.functions.curation import paragraph_dedup

    docs = [
        (i, "\n".join(f"doc{i} para{j} unique" for j in range(1 + i % 4)))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text"], r["n_paras"], r["n_kept"])
        for r in paragraph_dedup(df, "text", "doc_id").collect()
    }
    assert len(out) == 30
    for i, text in docs:
        np = 1 + i % 4
        assert out[i] == (text, np, np)


def test_paragraph_dedup_literal_separator(spark):
    """sep is a LITERAL, not a regex (r7 advice fix): '.' must split on
    periods only, not on every character."""
    from krnel_graph_spark.functions.curation import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "alpha.beta"), (2, "alpha.gamma")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_paras"], r["n_kept"])
        for r in paragraph_dedup(df, "text", "doc_id", sep=".").collect()
    }
    assert got[1] == ("alpha.beta", 2, 2)
    assert got[2] == ("gamma", 2, 1)  # only the shared 'alpha' dropped


def test_paragraph_dedup_empty_paragraphs_exempt(spark):
    """Blank lines are document structure, not boilerplate: every empty
    paragraph survives in every document (r7 advice fix)."""
    got = _pd_rows(
        spark,
        [(1, "A\n\nB"), (2, "C\n\nD\n\nE"), (3, "A\n\nB")],
    )
    assert got[1] == ("A\n\nB", 3, 3)
    assert got[2] == ("C\n\nD\n\nE", 5, 5)
    # doc 3's non-empty paras are dups, but its blank line survives
    assert got[3] == ("", 3, 1)


def test_span_corruption_layout_invariants(spark):
    from pyspark.sql import functions as F

    from krnel_graph_spark.functions.curation import span_corruption

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"w{i}" for i in range(100))),  # 5 full chunks
            (1, " ".join(f"w{i}" for i in range(47))),   # 2 chunks + tail 7
            (2, "a b"),                                  # shorter than a span
            (3, ""),                                     # blank
            (4, " ".join(f"w{i}" for i in range(3))),    # exactly one span
        ],
        "doc_id long, text string",
    )
    out = span_corruption(docs, "text", "doc_id", 0.15, 3, seed=0)
    rows = out.collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # chunk = floor(3/0.15) = 20: doc 0 -> 5 spans, doc 1 -> 3 (tail 7
    # fits a span), doc 2/3 -> none, doc 4 -> exactly one at offset 0
    assert {d: len(v) for d, v in by_doc.items()} == {0: 5, 1: 3, 4: 1}
    assert by_doc[4][0]["start"] == 0 and by_doc[4][0]["length"] == 3
    n_tok = {0: 100, 1: 47, 4: 3}
    for d, spans in by_doc.items():
        spans = sorted(spans, key=lambda r: r["span_id"])
        covered = set()
        for i, r in enumerate(spans):
            assert r["span_id"] == i
            # span lives inside its own chunk and inside the doc
            assert r["start"] >= i * 20
            assert r["start"] + r["length"] <= min((i + 1) * 20, n_tok[d]) or (
                # tail span: bounded by the doc end
                r["start"] + r["length"] <= n_tok[d]
            )
            span = set(range(r["start"], r["start"] + r["length"]))
            assert not span & covered  # non-overlap by construction
            covered |= span
    # determinism: identical layout on a re-run and order-insensitive
    again = sorted(map(tuple, span_corruption(
        docs, "text", "doc_id", 0.15, 3, seed=0).collect()))
    assert again == sorted(map(tuple, rows))
    # different seed moves offsets for at least one doc
    moved = sorted(map(tuple, span_corruption(
        docs, "text", "doc_id", 0.15, 3, seed=1).collect()))
    assert moved != again
    import pytest as _pytest

    with _pytest.raises(ValueError, match="noise_density"):
        span_corruption(docs, "text", "doc_id", 0.0, 3)
    with _pytest.raises(ValueError, match="mean_span"):
        span_corruption(docs, "text", "doc_id", 0.15, 0)


def test_span_corruption_text_t5_format(spark):
    from krnel_graph_spark.functions.curation import (
        span_corruption,
        span_corruption_text,
    )

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(47))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in span_corruption_text(docs, "text", "doc_id").collect()
    }
    spans = sorted(
        (r["span_id"], r["start"])
        for r in span_corruption(docs, "text", "doc_id").collect()
        if r["doc_id"] == 0
    )
    # inputs: every span start shows its sentinel; masked tokens absent
    toks = [f"w{i}" for i in range(47)]
    inp = out[0]["inputs"].split(" ")
    for sid, start in spans:
        assert f"<extra_id_{sid}>" in inp
        for p in range(start, start + 3):
            assert toks[p] not in inp
    # targets: sentinel-delimited masked spans + closing sentinel
    expected_tg = " ".join(
        f"<extra_id_{sid}> " + " ".join(toks[start : start + 3])
        for sid, start in spans
    ) + f" <extra_id_{len(spans)}>"
    assert out[0]["targets"] == expected_tg
    # reconstruction property: interleaving inputs and targets restores
    # the document
    merged = out[0]["inputs"]
    for sid, start in spans:
        merged = merged.replace(
            f"<extra_id_{sid}>", " ".join(toks[start : start + 3])
        )
    assert merged == " ".join(toks)
    # span-less and blank docs pass through with empty denoising targets
    assert out[2]["inputs"] == "a b" and out[2]["targets"] == "<extra_id_0>"
    assert out[3]["inputs"] == "" and out[3]["targets"] == "<extra_id_0>"


def test_span_corruption_fluent_twin(lazy_runner):
    ds = lazy_runner.from_parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = lazy_runner.to_pandas(ds.span_corruption("text"))
    assert {"inputs", "targets"} <= set(pdf.columns)
    assert len(pdf) == 500  # row-aligned: every doc reports
    assert pdf["targets"].str.endswith(">").all()
    # sentinel ids in targets are contiguous from 0
    assert (pdf["targets"].str.count("<extra_id_") >= 1).all()
