"""r8 surface: mixture design, compliance screening, selection, and
packing-efficiency operators. Each test pins semantics against a
hand-computed or brute-force (numpy / Python re / zlib-style) reference."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------- #
# temperature_mixture
# --------------------------------------------------------------------- #


def _mix_df(spark, sizes):
    rows = []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_temperature_mixture_tau1_is_identity(spark):
    from krnel_graph_spark.functions.sampling import temperature_mixture

    df = _mix_df(spark, {"en": 400, "fr": 50, "sw": 10})
    assert temperature_mixture(df, "lang", "doc_id", tau=1.0).count() == 460


def test_temperature_mixture_flattens_head(spark):
    from krnel_graph_spark.functions.sampling import temperature_mixture

    df = _mix_df(spark, {"en": 2000, "sw": 100})
    out = (
        temperature_mixture(df, "lang", "doc_id", tau=2.0)
        .groupBy("lang")
        .count()
        .collect()
    )
    got = {r["lang"]: r["count"] for r in out}
    # smallest stratum kept whole; head thinned to (n/n_min)^(1/tau - 1)
    assert got["sw"] == 100
    expect_rate = (2000 / 100) ** (0.5 - 1.0)  # ~0.2236
    assert got["en"] == pytest.approx(2000 * expect_rate, rel=0.15)


def test_temperature_mixture_sharpens_for_tau_below_1(spark):
    from krnel_graph_spark.functions.sampling import temperature_mixture

    df = _mix_df(spark, {"en": 2000, "sw": 200})
    out = (
        temperature_mixture(df, "lang", "doc_id", tau=0.5)
        .groupBy("lang")
        .count()
        .collect()
    )
    got = {r["lang"]: r["count"] for r in out}
    # tau < 1 sharpens: the LARGEST stratum is kept whole and the tail
    # is thinned to (n/n_max)^(1/tau - 1) — previously every rate
    # silently clamped to >= 1 and the natural mix came back.
    assert got["en"] == 2000
    expect_rate = (200 / 2000) ** (2.0 - 1.0)  # 0.1
    assert got.get("sw", 0) == pytest.approx(200 * expect_rate, rel=0.5)
    assert got.get("sw", 0) < 200


def test_temperature_mixture_deterministic(spark):
    from krnel_graph_spark.functions.sampling import temperature_mixture

    df = _mix_df(spark, {"en": 500, "fr": 100})
    a = {r["doc_id"] for r in temperature_mixture(df, "lang", "doc_id", tau=3.0).collect()}
    b = {r["doc_id"] for r in temperature_mixture(
        df.repartition(7), "lang", "doc_id", tau=3.0).collect()}
    assert a == b


# --------------------------------------------------------------------- #
# blocklist_annotate
# --------------------------------------------------------------------- #


def test_blocklist_annotate_matches_and_case(spark):
    from krnel_graph_spark.functions.curation import blocklist_annotate

    df = spark.createDataFrame(
        [
            (0, "A SPAM offer with Casino games"),
            (1, "perfectly fine prose"),
            (2, "casino"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["matched"], r["blocked"])
        for r in blocklist_annotate(df, "text", ["Casino", "spam"]).collect()
    }
    assert got[0] == (["casino", "spam"], True)  # sorted, lowercased
    assert got[1] == ([], False)
    assert got[2] == (["casino"], True)


def test_blocklist_annotate_substring_semantics(spark):
    from krnel_graph_spark.functions.curation import blocklist_annotate

    df = spark.createDataFrame([(0, "classic art")], "doc_id long, text string")
    # documented trade-off: plain substring, no word boundaries
    r = blocklist_annotate(df, "text", ["ass"]).collect()[0]
    assert r["blocked"] is True


# --------------------------------------------------------------------- #
# pii_report
# --------------------------------------------------------------------- #


def test_pii_report_counts_match_python_re(spark):
    from krnel_graph_spark.functions.curation import PII_PATTERNS, pii_report

    docs = [
        (0, "a", "mail me at a@b.com or c@d.org"),
        (1, "a", "call 555-123-4567 ok"),
        (2, "b", "ssn 123-45-6789 ip 10.0.0.1"),
        (3, "b", "nothing here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {
        r["source"]: r.asDict()
        for r in pii_report(df, "text", "source").collect()
    }
    for src in ("a", "b"):
        texts = [t for _, s, t in docs if s == src]
        for kind, (pat, _tok) in PII_PATTERNS.items():
            hits = sum(len(re.findall(pat, t)) for t in texts)
            docs_k = sum(1 for t in texts if re.search(pat, t))
            assert got[src][f"hits_{kind}"] == hits, (src, kind)
            assert got[src][f"docs_{kind}"] == docs_k, (src, kind)
    assert got["a"]["docs_any_pii"] == 2
    assert got["b"]["docs_any_pii"] == 1


# --------------------------------------------------------------------- #
# leakage_safe_split
# --------------------------------------------------------------------- #


def test_leakage_safe_split_dup_content_atomic(spark):
    from krnel_graph_spark.functions.curation import leakage_safe_split

    rows = [(i, f"unique doc {i}") for i in range(200)]
    # 50 exact dups of doc 0's content (different ids, whitespace noise)
    rows += [(1000 + i, "  unique   DOC 0 ") for i in range(50)]
    rows += [(2000 + i, "unique doc 0") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(df, "text", "doc_id", test_fraction=0.5).collect()
    sides = {r["doc_id"]: r["split"] for r in out}
    dup_sides = {sides[i] for i in [0, *range(1000, 1050), *range(2000, 2005)]}
    assert len(dup_sides) == 1  # every copy on ONE side
    n_test = sum(1 for v in sides.values() if v == "test")
    assert 0.3 < n_test / len(sides) < 0.7


# --------------------------------------------------------------------- #
# packing_report
# --------------------------------------------------------------------- #


def test_packing_report_hand_computed(spark):
    from krnel_graph_spark.functions.curation import packing_report

    # tokens: 60, 60, 60, 30 with budget 100 (offset packing):
    # before = 0, 60, 120, 180 -> packs 0, 0, 1, 1
    # pack 0 holds 120 tokens (oversize), pack 1 holds 90.
    df = spark.createDataFrame(
        [(0, 60), (1, 60), (2, 60), (3, 30)], "doc_id long, n_tokens long"
    )
    r = packing_report(df, "doc_id", "n_tokens", budget=100).collect()[0]
    assert (r["n_docs"], r["n_packs"], r["n_tokens"]) == (4, 2, 210)
    assert r["capacity"] == 200
    assert r["fill_rate"] == pytest.approx(1.05)
    assert r["oversize_packs"] == 1


def test_packing_report_partitioned(spark):
    from krnel_graph_spark.functions.curation import packing_report

    # offset packing: doc 1 STARTS at offset 80 < 100, so it joins
    # pack 0 (one oversize pack of 160), and doc 2 starts src b's pack.
    df = spark.createDataFrame(
        [(0, "a", 80), (1, "a", 80), (2, "b", 10)],
        "doc_id long, src string, n_tokens long",
    )
    got = {
        r["src"]: (r["n_packs"], r["fill_rate"], r["oversize_packs"])
        for r in packing_report(
            df, "doc_id", "n_tokens", budget=100, partition_by="src"
        ).collect()
    }
    assert got["a"] == (1, pytest.approx(1.6), 1)
    assert got["b"] == (1, pytest.approx(0.1), 0)


# --------------------------------------------------------------------- #
# quality_buckets
# --------------------------------------------------------------------- #


def test_quality_buckets_thirds_and_ties(spark):
    from krnel_graph_spark.functions.text import quality_buckets

    # 7 scores; percent_rank = (rank-1)/6
    df = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate([1, 2, 2, 4, 5, 6, 7])],
        "doc_id long, ppl double",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in quality_buckets(df, "ppl").collect()
    }
    # pr: 0, 1/6, 1/6, 3/6, 4/6, 5/6, 6/6
    assert got[0] == "head"
    assert got[1] == got[2] == "head"       # tie shares the bucket
    assert got[3] == "middle"
    assert got[4] == "tail"                  # 4/6 >= 2/3
    assert got[5] == got[6] == "tail"


def test_quality_buckets_per_group(spark):
    from krnel_graph_spark.functions.text import quality_buckets

    df = spark.createDataFrame(
        [(0, "en", 1.0), (1, "en", 2.0), (2, "en", 3.0),
         (3, "fr", 100.0), (4, "fr", 200.0), (5, "fr", 300.0)],
        "doc_id long, lang string, ppl double",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in quality_buckets(df, "ppl", "lang").collect()
    }
    # each group ranked independently: fr's 100.0 is its head
    assert got[0] == "head" and got[3] == "head"
    assert got[2] == "tail" and got[5] == "tail"


def test_quality_buckets_validation(spark):
    from krnel_graph_spark.functions.text import quality_buckets

    df = spark.createDataFrame([(0, 1.0)], "doc_id long, s double")
    with pytest.raises(ValueError):
        quality_buckets(df, "s", cuts=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError):
        quality_buckets(df, "s", cuts=(0.7, 0.3), labels=("a", "b", "c"))


# --------------------------------------------------------------------- #
# kcenter_select
# --------------------------------------------------------------------- #


def _kcenter_ref(vecs, ids, k):
    """Brute-force greedy farthest-point with the same determinism
    contract (round-6 shield, id tie-break)."""
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x):
        return float(Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP))

    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    order = np.argsort(ids)
    first = order[0]
    picked = [(1, ids[first], None)]
    active = {i for i in range(len(ids)) if i != first}
    mind = {i: 1.0 - float(u[i] @ u[first]) for i in active}
    for rank in range(2, k + 1):
        if not active:
            break
        best = min(active, key=lambda i: (-r6(mind[i]), ids[i]))
        picked.append((rank, ids[best], r6(mind[best])))
        active.discard(best)
        for i in active:
            mind[i] = min(mind[i], 1.0 - float(u[i] @ u[best]))
    return picked


def test_kcenter_matches_bruteforce(spark):
    from krnel_graph_spark.functions.similarity import kcenter_select

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter("vec_id < 120")
    pdf = emb.toPandas().sort_values("vec_id")
    vecs = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    ids = pdf["vec_id"].to_numpy()
    want = _kcenter_ref(vecs, ids, 6)
    got = [
        (r["rank"], r["vec_id"], r["sep"])
        for r in kcenter_select(emb, "embedding", "vec_id", 6)
        .orderBy("rank")
        .collect()
    ]
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, g), (_, _, w) in zip(got[1:], want[1:]):
        assert g == pytest.approx(w, abs=2e-6)


def test_kcenter_k_exceeds_n(spark):
    from krnel_graph_spark.functions.similarity import kcenter_select

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter("vec_id < 4")
    out = kcenter_select(emb, "embedding", "vec_id", 10).collect()
    assert len(out) == 4  # stops when the pool is exhausted


# --------------------------------------------------------------------- #
# gopher_rules
# --------------------------------------------------------------------- #


def test_gopher_rules_reference_cases(spark):
    from krnel_graph_spark.functions.text import gopher_rules

    good = " ".join(
        "the quick brown fox and that dog have fun with everyone".split()
        * 6
    )  # 60 words, alpha-rich, stopword-rich
    docs = [
        (0, good),
        (1, "too short to pass the word count rule"),          # < 50 words
        (2, " ".join(["####"] * 60)),                           # symbols, no alpha
        (3, "\n".join(f"- bullet {i} item here" for i in range(10))),
        (4, "\n".join([f"line {i} trails off..." for i in range(10)])),
        (5, " ".join(["a"] * 60)),                              # mwl < 3
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df, "text").collect()}
    assert got[0]["gopher_keep"] is True
    assert got[1]["r_word_count"] is False
    assert got[2]["r_symbol_ratio"] is False
    assert got[2]["r_alpha_words"] is False
    assert got[3]["r_bullet_lines"] is False  # 10/10 lines bullet-led
    assert got[4]["r_ellipsis_lines"] is False  # 10/10 ellipsis-ended
    assert got[5]["r_word_length"] is False
    for i in range(1, 6):
        assert got[i]["gopher_keep"] is False


def test_gopher_rules_stopword_octet_distinct(spark):
    from krnel_graph_spark.functions.text import gopher_rules

    # 'the' repeated is ONE distinct stopword -> rule fails
    df = spark.createDataFrame(
        [(0, " ".join(["the word"] * 30)), (1, " ".join(["the and word"] * 20))],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["r_stopwords"] for r in gopher_rules(df, "text").collect()}
    assert got[0] is False and got[1] is True


# --------------------------------------------------------------------- #
# stupid_backoff_logprob
# --------------------------------------------------------------------- #


def _sb_ref(train_texts, score_docs, alpha=0.4):
    """Independent Python reference of the Stupid Backoff scorer with
    the same decimal rounding discipline."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal
    import math

    def toks(t):
        n = re.sub(r"\s+", " ", t.lower()).strip()
        return n.split(" ") if n else []

    c1, c2, c3 = Counter(), Counter(), Counter()
    for t in train_texts:
        ws = toks(t)
        c1.update(ws)
        c2.update(zip(ws, ws[1:]))
        c3.update(zip(ws, ws[1:], ws[2:]))
    N = float(sum(c1.values()))

    def r6(x):
        return Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP)

    out = {}
    for doc_id, t in score_docs:
        ws = toks(t)
        if not ws:
            continue
        s = Decimal(0)
        oov = 0
        for i, w in enumerate(ws):
            w1 = ws[i - 1] if i >= 1 else None
            w2 = ws[i - 2] if i >= 2 else None
            c1f = float(c1.get(w, 1))
            if w not in c1:
                oov += 1
            if i >= 2 and (w2, w1, w) in c3:
                lp = math.log10(c3[(w2, w1, w)] / c2[(w2, w1)])
            elif i >= 2 and (w1, w) in c2:
                lp = math.log10((alpha * c2[(w1, w)]) / c1[w1])
            elif i >= 2:
                lp = math.log10((alpha * alpha * c1f) / N)
            elif i == 1 and (w1, w) in c2:
                lp = math.log10(c2[(w1, w)] / c1[w1])
            elif i == 1:
                lp = math.log10((alpha * c1f) / N)
            else:
                lp = math.log10(c1f / N)
            s += r6(lp)
        out[doc_id] = (len(ws), oov, float(s))
    return out


def test_stupid_backoff_matches_reference(spark):
    from krnel_graph_spark.functions.text import stupid_backoff_logprob

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter("doc_id < 80")
    pdf = docs.select("doc_id", "text").toPandas()
    want = _sb_ref(pdf["text"].tolist(), pdf.itertuples(index=False))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["logprob_sum"])
        for r in stupid_backoff_logprob(docs, docs, "text", "doc_id").collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == want[k][1], k
        assert got[k][2] == pytest.approx(want[k][2], abs=1e-9), k


def test_stupid_backoff_oov_and_unseen_corpus(spark):
    from krnel_graph_spark.functions.text import stupid_backoff_logprob

    train = spark.createDataFrame(
        [(0, "the cat sat on the mat")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(1, "the cat purred loudly")], "doc_id long, text string"
    )
    r = stupid_backoff_logprob(train, score, "text", "doc_id").collect()[0]
    assert r["n_tokens"] == 4
    assert r["n_oov"] == 2  # purred, loudly unseen
    assert r["logprob_sum"] < 0


def test_stupid_backoff_frozen_lm_roundtrips_parquet(spark, tmp_path):
    from krnel_graph_spark.functions.text import (
        stupid_backoff_logprob,
        stupid_backoff_score,
        stupid_backoff_train,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter("doc_id < 80")
    want = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["logprob_sum"])
        for r in stupid_backoff_logprob(docs, docs, "text", "doc_id").collect()
    }
    # train once, persist the gram tables, re-read and score: the
    # frozen-LM artifact must reproduce the composed path exactly
    lm = stupid_backoff_train(docs, "text")
    for name, frame in lm.items():
        frame.write.mode("overwrite").parquet(str(tmp_path / name))
    reread = {
        name: spark.read.parquet(str(tmp_path / name)) for name in lm
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["logprob_sum"])
        for r in stupid_backoff_score(
            reread, docs, "text", "doc_id"
        ).collect()
    }
    assert got == want
