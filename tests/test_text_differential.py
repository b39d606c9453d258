"""Differential test: ``quality_score`` (and its component terms) against an
independent pandas/pure-Python reimplementation over a 1k-doc corpus of
random + adversarial documents (empty, whitespace-only, unicode-heavy,
punctuation walls, 100+-token long docs).

The gate only exercises the score through ``clean_corpus``'s >= 0.5 filter
boundary; this pins the full real-valued score. The reference
implementation mirrors the ENGINE'S spec, which uses Java regex semantics:
``\\s`` is ASCII-only (`` \\t\\n\\x0B\\f\\r``) — Python's unicode ``\\s``
would silently diverge on NBSP et al., so the mirror spells the class out.
"""

from __future__ import annotations

import math
import random
import re

import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions import text as tx

_WS = " \t\n\x0b\f\r"
_WS_RE = re.compile(f"[{re.escape(_WS)}]+")
_PUNCT_RE = re.compile(f"[^A-Za-z0-9{re.escape(_WS)}]")
STOP_EN = set(tx.STOPWORDS_EN)


def _normalize(s: str) -> str:
    return _WS_RE.sub(" ", s.lower()).strip(_WS)


def _token_count(s: str) -> int:
    t = s.strip(_WS)
    return 0 if t == "" else len(_WS_RE.split(t))


def _stopword_ratio(s: str) -> float:
    n = _token_count(s)
    if n == 0:
        return 0.0
    hits = sum(1 for t in _normalize(s).split(" ") if t in STOP_EN)
    return hits / n


def _punct_ratio(s: str) -> float:
    if len(s) == 0:
        return 0.0
    return len(_PUNCT_RE.findall(s)) / len(s)


def _mean_word_length(s: str) -> float:
    norm = _normalize(s)
    toks = norm.split(" ")
    n = len(toks)
    total = len(norm) - (n - 1)
    return 0.0 if n == 0 else total / n


def quality_score_ref(s: str | None) -> float | None:
    if s is None:
        return None
    length_term = min(_token_count(s) / 100.0, 1.0)
    stop_term = min(_stopword_ratio(s) * 4.0, 1.0)
    punct_term = 1.0 - min(_punct_ratio(s) * 4.0, 1.0)
    mwl = _mean_word_length(s)
    word_term = 1.0 if 3.0 <= mwl <= 10.0 else 0.5
    return (
        0.4 * length_term + 0.3 * stop_term + 0.15 * punct_term + 0.15 * word_term
    )


def _corpus() -> list[str | None]:
    rng = random.Random(20260814)
    words = (
        "the a and of to in is it that for quick brown fox jumps lazy dog "
        "data spark engine pipeline token quality score corpus document "
        "aaaa bb ccccccccccc supercalifragilistic x 42 3141"
    ).split()
    punct = list("!?.,;:()[]{}#$%&*@~^|\\/\"'`<>=+-_")
    unicode_bits = ["héllo", "naïve", "日本語のテキスト", "中文文档", "😀🚀",
                    "café", "Привет мир", "ñandú", "über"]
    docs: list[str | None] = [
        None, "", "   ", " \t\n\x0b\f\r ", ".", "!!!", "a", "the",
        "the the the", "...!!!???", " ", "x y",  # NBSP: non-space in Java \s
        " ".join(["the"] * 250),                            # long, all stopwords
        " ".join(["zzz"] * 150),                            # long, no stopwords
        "".join(punct) * 10,                                # punct wall
    ]
    while len(docs) < 1000:
        n = rng.randint(1, 120)
        parts = []
        for _ in range(n):
            roll = rng.random()
            if roll < 0.70:
                parts.append(rng.choice(words))
            elif roll < 0.85:
                parts.append(rng.choice(punct))
            elif roll < 0.95:
                parts.append(rng.choice(unicode_bits))
            else:
                parts.append(rng.choice(["  ", "\t", "\n"]))  # odd spacing
        docs.append(rng.choice(["", " ", ""]).join(parts) if rng.random() < 0.1
                    else " ".join(parts))
    return docs


def test_quality_score_differential(spark):
    docs = _corpus()
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i long, text string"
    )
    got = {
        r["i"]: r["q"]
        for r in df.select(
            "i", tx.quality_score("text").alias("q")
        ).collect()
    }
    n_checked = 0
    for i, d in enumerate(docs):
        want = quality_score_ref(d)
        if want is None:
            assert got[i] is None, f"doc {i}: expected null, got {got[i]}"
            continue
        assert got[i] == pytest.approx(want, abs=1e-9), (
            f"doc {i} {d[:60]!r}: spark={got[i]} ref={want}"
        )
        n_checked += 1
    assert n_checked >= 990  # the corpus is really exercised


def test_quality_component_terms_differential(spark):
    """Pin the building blocks individually so a future drift localizes."""
    docs = _corpus()[:300]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs) if d is not None],
        "i long, text string",
    )
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            tx.token_count("text").alias("tc"),
            tx.stopword_ratio("text").alias("sr"),
            tx.punct_ratio("text").alias("pr"),
            tx.mean_word_length("text").alias("mwl"),
        ).collect()
    }
    for i, d in enumerate(docs):
        if d is None:
            continue
        r = rows[i]
        assert r["tc"] == _token_count(d), f"token_count doc {i} {d[:40]!r}"
        assert r["sr"] == pytest.approx(_stopword_ratio(d), abs=1e-9), (
            f"stopword_ratio doc {i} {d[:40]!r}"
        )
        assert r["pr"] == pytest.approx(_punct_ratio(d), abs=1e-9), (
            f"punct_ratio doc {i} {d[:40]!r}"
        )
        assert r["mwl"] == pytest.approx(_mean_word_length(d), abs=1e-9), (
            f"mean_word_length doc {i} {d[:40]!r}"
        )


def test_quality_score_on_real_documents(spark):
    """Full-score differential over the driver-generated documents table."""
    import os

    import pandas as pd

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    df = spark.createDataFrame(pdf)
    got = {
        r["doc_id"]: r["q"]
        for r in df.select("doc_id", tx.quality_score("text").alias("q")).collect()
    }
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        want = quality_score_ref(text)
        g = got[doc_id]
        if want is None:
            assert g is None or (isinstance(g, float) and math.isnan(g))
        else:
            assert g == pytest.approx(want, abs=1e-9), f"doc {doc_id}"


def test_term_stats_differential(spark):
    import re
    from collections import Counter

    from krnel_graph_spark.functions.text import term_stats, top_terms

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "THE  cat\n\truns"),
            (3, ""),
            (4, None),
            (5, "   \t\n "),
            (6, "cat cat cat"),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {
        r["term"]: (r["tf"], r["df"])
        for r in term_stats(docs, "text", "doc_id").collect()
    }
    tf, df = Counter(), Counter()
    for _id, text in [(1, "the cat sat on the mat"), (2, "THE  cat\n\truns"),
                      (6, "cat cat cat")]:
        toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        tf.update(toks)
        df.update(set(toks))
    assert got == {t: (tf[t], df[t]) for t in tf}

    top = top_terms(docs, "text", "doc_id", k=2).collect()
    # cat: tf=5, the: tf=3
    assert [(r["term"], r["tf"], r["df"]) for r in top] == [
        ("cat", 5, 3),
        ("the", 3, 2),
    ]


def test_top_terms_tie_break_deterministic(spark):
    from krnel_graph_spark.functions.text import top_terms

    docs = spark.createDataFrame(
        [(1, "b a c"), (2, "c a b")], "doc_id BIGINT, text STRING"
    )
    top = top_terms(docs, "text", "doc_id", k=2).collect()
    assert [r["term"] for r in top] == ["a", "b"]  # tf all 2; term asc


# --------------------------------------------------------------------- #
# unigram_logprob                                                         #
# --------------------------------------------------------------------- #


def test_unigram_logprob_differential(spark):
    """Spark unigram LM score vs a pure-Python reimplementation."""
    import math
    from collections import Counter
    from decimal import Decimal

    from krnel_graph_spark.functions.text import unigram_logprob

    docs = {
        0: "a a b c",
        1: "a b",
        2: "c c c z",
        3: "",            # blank -> excluded
        4: "  \t ",       # blank -> excluded
        5: "A a B",       # normalized
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob_sum"])
        for r in unigram_logprob(df, "text", "doc_id").collect()
    }
    # reference
    toks = {i: t.lower().split() for i, t in docs.items() if t.strip()}
    counts = Counter(w for ts in toks.values() for w in ts)
    total = sum(counts.values())
    lp = {
        w: Decimal(str(round(math.log10(c / total), 6)))
        for w, c in counts.items()
    }
    exp = {
        i: (len(ts), float(sum(lp[w] for w in ts)))
        for i, ts in toks.items()
    }
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0], i
        assert got[i][1] == pytest.approx(exp[i][1], abs=1e-9), i


def test_unigram_logprob_ranking_sanity(spark):
    """A doc of corpus-common tokens scores higher (less negative) per
    token than a doc of rare tokens."""
    from krnel_graph_spark.functions.text import unigram_logprob

    rows = [(i, "common " * 20) for i in range(10)] + [(99, "rareword")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["logprob_sum"] / r["n_tokens"]
        for r in unigram_logprob(df, "text", "doc_id").collect()
    }
    assert got[0] > got[99]


def test_bigram_logprob_differential(spark):
    """ngram_logprob(n=2) vs a pure-Python reimplementation."""
    import math
    from collections import Counter
    from decimal import Decimal

    from krnel_graph_spark.functions.text import ngram_logprob

    docs = {
        0: "a b a b c",
        1: "a b",
        2: "x",          # fewer than 2 tokens -> excluded
        3: "",           # blank -> excluded
        4: "c a B a",    # normalization
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["logprob_sum"])
        for r in ngram_logprob(df, "text", "doc_id", n=2).collect()
    }
    toks = {i: t.lower().split() for i, t in docs.items() if len(t.split()) >= 2}
    grams = Counter(); ctxs = Counter()
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            grams[(a, b)] += 1
            ctxs[a] += 1  # context counted per gram start
    exp = {}
    for i, ts in toks.items():
        s = Decimal(0)
        for a, b in zip(ts, ts[1:]):
            s += Decimal(str(round(math.log10(grams[(a, b)] / ctxs[a]), 6)))
        exp[i] = (len(ts) - 1, float(s))
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0], i
        assert got[i][1] == pytest.approx(exp[i][1], abs=1e-9), i


def test_ngram_logprob_validation(spark):
    from krnel_graph_spark.functions.text import ngram_logprob

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ngram_logprob(df, "text", "doc_id", n=1)


# --------------------------------------------------------------------- #
# token_entropy
# --------------------------------------------------------------------- #


def test_token_entropy_closed_forms(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),      # uniform over 4 types -> 2 bits
            (2, "a a a a"),      # degenerate -> 0 bits
            (3, "a a b b"),      # uniform over 2 types -> 1 bit
            (4, "   "),          # blank -> dropped
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_types"], r["entropy"])
        for r in tx.token_entropy(df, "text", "doc_id").collect()
    }
    assert got[1] == (4, 4, 2.0)
    assert got[2] == (4, 1, 0.0)
    assert got[3] == (4, 2, 1.0)
    assert 4 not in got


def test_token_entropy_differential(spark):
    import decimal
    from collections import Counter

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "y9", "Zz"]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 60))))
        for i in range(80)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_types"], r["entropy"])
        for r in tx.token_entropy(df, "text", "doc_id").collect()
    }
    for i, text in docs:
        counts = Counter(_normalize(text).split(" "))
        n = sum(counts.values())
        # Mirror the engine: per-type c*log2(c) rounded HALF_UP to 8
        # places, decimal-summed, closed form rounded to 6.
        clogc = sum(
            decimal.Decimal(str(c * math.log2(c))).quantize(
                decimal.Decimal("1e-8"), rounding=decimal.ROUND_HALF_UP
            )
            for c in counts.values()
        )
        ent = decimal.Decimal(
            str(math.log2(n) - float(clogc) / n)
        ).quantize(decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP)
        assert got[i][0] == n and got[i][1] == len(counts)
        assert got[i][2] == pytest.approx(float(ent), abs=2e-6)


# --------------------------------------------------------------------- #
# dsir_weights
# --------------------------------------------------------------------- #


def test_dsir_weights_prefers_target_like_docs(spark):
    target = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat") for i in range(8)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),       # exactly target-like
            (2, "stock market index futures"),   # off-target
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in tx.dsir_weights(raw, target, "text", "doc_id").collect()
    }
    assert got[1] > got[2]
    assert got[1] > 0  # target-like doc scores above the raw baseline


def test_dsir_weights_gram_count(spark):
    raw = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, " ")],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_grams"]
        for r in tx.dsir_weights(raw, tgt, "text", "doc_id").collect()
    }
    # 3 unigrams + 2 bigrams; a single-token doc has no bigrams; blank
    # docs are excluded entirely.
    assert got == {1: 5, 2: 1}


# --------------------------------------------------------------------- #
# zipf_fit / compression_signals
# --------------------------------------------------------------------- #


def test_zipf_fit_recovers_power_law(spark):
    # Build a corpus whose term counts are EXACTLY c_i = floor(1000/i):
    # the log-log fit must come out near slope -1.
    rows = []
    for i in range(1, 21):
        rows.extend((j, f"w{i:02d}") for j in range(1000 // i))
    docs = [(k, " ".join(t for _, t in grp)) for k, grp in
            __import__("itertools").groupby(
                sorted(enumerate(t for _, t in rows), key=lambda x: x[0] // 50),
                key=lambda x: x[0] // 50)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = tx.zipf_fit(df, "text", "doc_id").first()
    assert out["n_terms"] == 20
    assert out["slope"] == pytest.approx(-1.0, abs=0.05)

    # Independent least-squares check with numpy on the exact counts.
    import numpy as np

    counts = sorted((1000 // i for i in range(1, 21)), reverse=True)
    lx = np.log10(np.arange(1, 21, dtype=float))
    ly = np.log10(np.array(counts, dtype=float))
    slope, intercept = np.polyfit(lx, ly, 1)
    assert out["slope"] == pytest.approx(slope, abs=1e-4)
    assert out["intercept"] == pytest.approx(intercept, abs=1e-4)


def test_zipf_fit_tie_break_deterministic(spark):
    # All terms tied -> ranking falls back to term text; result stable.
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e")], "doc_id long, text string"
    )
    a = tx.zipf_fit(df, "text", "doc_id").first()
    b = tx.zipf_fit(df, "text", "doc_id").first()
    assert a == b
    assert a["slope"] == 0.0  # flat counts -> zero slope


def test_compression_signals_matches_zlib(spark):
    import zlib

    docs = [
        (0, "abc" * 200),                      # highly compressible
        (1, "The quick brown fox jumps."),     # short prose
        (2, "päragraph ünïcode ßtreet"),       # multibyte UTF-8
        (3, ""),                               # empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_zlib"])
        for r in tx.compression_signals(df, "text", "doc_id").collect()
    }
    for i, t in docs:
        raw = t.encode("utf-8")
        assert got[i] == (len(raw), len(zlib.compress(raw, 6))), i
    # the repetitive doc must compress far below the prose doc's ratio
    assert got[0][1] / got[0][0] < 0.1


def test_corpus_report_known_corpus(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the cat sat on the mat"),   # exact dup of 0
            (2, "Le chat est sur le tapis et pour la vie"),
            (3, "   "),                      # blank
        ],
        "doc_id long, text string",
    )
    got = {
        r["metric"]: r["value"]
        for r in tx.corpus_report(df, "text", "doc_id").collect()
    }
    assert got["n_docs"] == 4.0
    assert got["n_tokens"] == 6 + 6 + 10
    assert got["blank_frac"] == 0.25
    # 4 docs, 3 distinct fingerprints (blank has its own) -> 1 dup
    assert got["dup_doc_frac"] == 0.25
    assert got["lang:en"] == 0.5
    assert got["lang:fr"] == 0.25
    assert got["lang:und"] == 0.25
    assert "zipf_slope" in got and "mean_quality" in got
    # 5 scalars + n_types + zipf + 3 langs
    assert len(got) == 10


def test_source_quality_report_known_corpus(spark):
    df = spark.createDataFrame(
        [
            (0, "a", "the cat sat on the mat"),
            (1, "a", "the cat sat on the mat"),  # within-source dup
            (2, "a", "   "),                     # blank
            (3, "b", "the cat sat on the mat"),  # same text, OTHER source
            (4, "b", "completely different words here"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r["source"]: r
        for r in tx.source_quality_report(df, "text", "source").collect()
    }
    a, b = got["a"], got["b"]
    assert (a["n_docs"], a["n_tokens"]) == (3, 12)
    assert a["blank_frac"] == pytest.approx(1 / 3, abs=1e-6)
    # 3 docs, 2 distinct fingerprints -> 1 within-source dup
    assert a["dup_doc_frac"] == pytest.approx(1 / 3, abs=1e-6)
    # source b's copy of the text is NOT a dup within b
    assert (b["n_docs"], b["dup_doc_frac"]) == (2, 0.0)
    assert 0.0 <= b["mean_quality"] <= 1.0


def test_compression_signals_string_id(spark):
    """The mapInPandas output schema derives the id field's type from
    the input schema (r7 advice fix) — string doc ids pass through."""
    df = spark.createDataFrame(
        [("d-0", "abc" * 50), ("d-1", "plain words")],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r["n_bytes"]
        for r in tx.compression_signals(df, "text", "doc_id").collect()
    }
    assert got == {"d-0": 150, "d-1": 11}
