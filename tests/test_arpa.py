"""ARPA export (r13): an independent ARPA-backoff evaluator over the
exported rows must reproduce kneser_ney(3)_score's per-document logprob
sums — the proof that the stored-prob + backoff-weight encoding is
faithful to the engine's interpolated arithmetic — plus file-writer
roundtrip and validation pins."""

from __future__ import annotations

import decimal
import math

import pytest

TEXTS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat sat on the log again"),
    (3, "a new cat and a new dog"),
    (4, "zebra quark the cat"),
    (5, "the the the the"),
    (6, ""),
    (7, "single"),
    (8, "two words"),
]


def _toks(t):
    n = " ".join((t or "").lower().split())
    return n.split(" ") if n else None


class _ArpaEval:
    """Plain ARPA backoff lookup over exported rows — the consumer's
    arithmetic (stored prob if listed, else backoff-weight chain),
    nothing engine-specific."""

    def __init__(self, rows):
        self.p = {1: {}, 2: {}, 3: {}}
        self.bow = {1: {}, 2: {}}
        for r in rows:
            gram = tuple(w for w in (r["w1"], r["w2"], r["w3"]) if w is not None)
            o = r["order"]
            self.p[o][gram] = 10.0 ** r["log10_p"]
            if r["log10_bow"] is not None and o < 3:
                self.bow[o][gram] = 10.0 ** r["log10_bow"]

    def p1(self, w):
        return self.p[1].get((w,), self.p[1][("<unk>",)])

    def p2(self, v, w):
        if (v, w) in self.p[2]:
            return self.p[2][(v, w)]
        return self.bow[1].get((v,), 1.0) * self.p1(w)

    def p3(self, u, v, w):
        if (u, v, w) in self.p[3]:
            return self.p[3][(u, v, w)]
        return self.bow[2].get((u, v), 1.0) * self.p2(v, w)

    def doc_logprob(self, toks, max_order):
        total = decimal.Decimal(0)
        for j, w in enumerate(toks):
            if max_order == 3:
                if j >= 2:
                    p = self.p3(toks[j - 2], toks[j - 1], w)
                elif j == 1:
                    p = self.p2(toks[j - 1], w)
                else:
                    p = self.p1(w)
            else:
                p = self.p2(toks[j - 1], w) if j >= 1 else self.p1(w)
            # round-6 per-term like the engine, exact-decimal sum
            total += decimal.Decimal(str(math.log10(p))).quantize(
                decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
            )
        return float(total)


def _docs_df(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


@pytest.mark.parametrize("discount", [0.75, "modified"])
def test_kn3_arpa_reproduces_engine_scores(spark, discount):
    from krnel_graph_spark.functions.arpa import kneser_ney3_arpa_rows
    from krnel_graph_spark.functions.text import (
        kneser_ney3_score,
        kneser_ney3_train,
    )

    df = _docs_df(spark)
    lm = kneser_ney3_train(df, "text")
    rows = kneser_ney3_arpa_rows(lm, discount=discount).collect()
    ev = _ArpaEval(rows)
    got = {
        r.doc_id: r.logprob_sum
        for r in kneser_ney3_score(
            lm, df, "text", "doc_id", discount=discount
        ).collect()
    }
    for i, t in TEXTS:
        ts = _toks(t)
        if not ts:
            assert i not in got
            continue
        want = ev.doc_logprob(ts, max_order=3)
        # per-term drift <= a few 1e-6 (engine rounds log10(p) once;
        # the consumer multiplies two round-6 components on backoff)
        assert got[i] == pytest.approx(want, abs=3e-5 * len(ts)), (i, t)


def test_kn3_arpa_pruned_backs_off_through_unpruned_weights(spark):
    from krnel_graph_spark.functions.arpa import kneser_ney3_arpa_rows
    from krnel_graph_spark.functions.text import (
        kneser_ney3_score,
        kneser_ney3_train,
    )

    df = _docs_df(spark)
    lm = kneser_ney3_train(df, "text", min_count=2)
    rows = kneser_ney3_arpa_rows(lm).collect()
    # pruning bites: fewer 3-gram entries than 2-gram contexts+events
    n3 = sum(1 for r in rows if r["order"] == 3)
    lm_full = kneser_ney3_train(df, "text")
    n3_full = sum(
        1
        for r in kneser_ney3_arpa_rows(lm_full).collect()
        if r["order"] == 3
    )
    assert 0 < n3 < n3_full
    ev = _ArpaEval(rows)
    got = {
        r.doc_id: r.logprob_sum
        for r in kneser_ney3_score(lm, df, "text", "doc_id").collect()
    }
    for i, t in TEXTS:
        ts = _toks(t)
        if not ts:
            continue
        want = ev.doc_logprob(ts, max_order=3)
        assert got[i] == pytest.approx(want, abs=3e-5 * len(ts)), (i, t)


def test_kn_bigram_arpa_reproduces_engine_scores(spark):
    from krnel_graph_spark.functions.arpa import kneser_ney_arpa_rows
    from krnel_graph_spark.functions.text import (
        kneser_ney_score,
        kneser_ney_train,
    )

    df = _docs_df(spark)
    lm = kneser_ney_train(df, "text")
    rows = kneser_ney_arpa_rows(lm).collect()
    ev = _ArpaEval(rows)
    got = {
        r.doc_id: r.logprob_sum
        for r in kneser_ney_score(lm, df, "text", "doc_id").collect()
    }
    for i, t in TEXTS:
        ts = _toks(t)
        if not ts:
            continue
        want = ev.doc_logprob(ts, max_order=2)
        assert got[i] == pytest.approx(want, abs=3e-5 * len(ts)), (i, t)


def test_arpa_unigram_section_sums_to_one(spark):
    """Pc is uniform-interpolated, so the 1-gram section (vocab +
    <unk>) must sum to ~1 — the standard ARPA sanity every consumer
    checks first. (Stranded words that left no bigram counts score as
    <unk> in the engine and are deliberately unlisted; their mass IS
    the <unk>/uniform slot's.)"""
    from krnel_graph_spark.functions.arpa import kneser_ney3_arpa_rows
    from krnel_graph_spark.functions.text import kneser_ney3_train

    df = _docs_df(spark)
    lm = kneser_ney3_train(df, "text")
    rows = kneser_ney3_arpa_rows(lm).collect()
    uni = [r for r in rows if r["order"] == 1]
    # V counts vocab+1; listed words may be fewer (stranded words fold
    # into the uniform slot), so the listed sum is <= 1 and the gap is
    # exactly the stranded words' uniform shares.
    s = sum(10.0 ** r["log10_p"] for r in uni)
    assert 0.9 < s <= 1.0 + 1e-6
    assert any(r["w1"] == "<unk>" for r in uni)


def test_arpa_file_roundtrip(spark, tmp_path):
    from krnel_graph_spark.functions.arpa import (
        kneser_ney3_arpa_rows,
        kneser_ney3_export_arpa,
    )
    from krnel_graph_spark.functions.text import kneser_ney3_train

    df = _docs_df(spark)
    lm = kneser_ney3_train(df, "text")
    path = str(tmp_path / "model.arpa")
    kneser_ney3_export_arpa(lm, path)
    text = open(path, encoding="utf-8").read()
    assert text.startswith("\\data\\\n")
    assert text.rstrip().endswith("\\end\\")
    rows = kneser_ney3_arpa_rows(lm).collect()
    want_counts = {o: sum(1 for r in rows if r["order"] == o) for o in (1, 2, 3)}
    for o in (1, 2, 3):
        assert f"ngram {o}={want_counts[o]}" in text
    # every section line parses back: logp \t gram [\t bow]
    section = None
    seen = {1: 0, 2: 0, 3: 0}
    for line in text.splitlines():
        if line.endswith("-grams:"):
            section = int(line[1])
            continue
        if not line or line.startswith("\\") or section is None:
            continue
        parts = line.split("\t")
        float(parts[0])
        words = parts[1].split(" ")
        assert len(words) == section
        if section < 3:
            assert len(parts) == 3
            float(parts[2])
        else:
            assert len(parts) == 2
        seen[section] += 1
    assert seen == want_counts


def test_arpa_rows_validation(spark):
    from krnel_graph_spark.functions.arpa import (
        kneser_ney3_arpa_rows,
        kneser_ney_arpa_rows,
    )
    from krnel_graph_spark.functions.text import kneser_ney3_train

    df = _docs_df(spark)
    lm = kneser_ney3_train(df, "text")
    with pytest.raises(ValueError, match="missing frame"):
        kneser_ney3_arpa_rows({k: v for k, v in lm.items() if k != "mid"})
    with pytest.raises(ValueError, match="not a kneser_ney_train"):
        kneser_ney_arpa_rows(lm)  # wrong artifact family
    with pytest.raises(ValueError, match="discount"):
        kneser_ney3_arpa_rows(lm, discount=1.5)


def test_arpa_load_roundtrips_export_exactly(spark, tmp_path):
    """load(export(rows)) == rows as a row multiset, bit-for-bit: the
    round-6 doubles survive the %.6f print/parse."""
    from krnel_graph_spark.functions.arpa import (
        arpa_load,
        kneser_ney3_arpa_rows,
        kneser_ney3_export_arpa,
    )
    from krnel_graph_spark.functions.text import kneser_ney3_train

    df = _docs_df(spark)
    lm = kneser_ney3_train(df, "text")
    path = str(tmp_path / "rt.arpa")
    kneser_ney3_export_arpa(lm, path)
    want = kneser_ney3_arpa_rows(lm)
    got = arpa_load(spark, path)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_arpa_score_matches_native_scorers(spark):
    """The generic ARPA scorer over the engine's own export reproduces
    the native KN scorers — order 3 AND order 2 — within the round-6
    backoff-composition drift (the evaluator-test bound)."""
    from krnel_graph_spark.functions.arpa import (
        arpa_score,
        kneser_ney3_arpa_rows,
        kneser_ney_arpa_rows,
    )
    from krnel_graph_spark.functions.text import (
        kneser_ney3_score,
        kneser_ney3_train,
        kneser_ney_score,
        kneser_ney_train,
    )

    df = _docs_df(spark)
    lm3 = kneser_ney3_train(df, "text")
    got3 = {
        r.doc_id: (r.n_tokens, r.n_oov, r.logprob_sum)
        for r in arpa_score(
            kneser_ney3_arpa_rows(lm3), df, "text", "doc_id"
        ).collect()
    }
    want3 = {
        r.doc_id: (r.n_tokens, r.n_oov, r.logprob_sum)
        for r in kneser_ney3_score(lm3, df, "text", "doc_id").collect()
    }
    assert set(got3) == set(want3)
    for i in want3:
        assert got3[i][0] == want3[i][0]
        # OOV notions differ by design: the native scorer counts
        # zero-continuation-evidence words (n1back null — they SCORE as
        # <unk> even when listed as context words), the ARPA consumer
        # counts truly-unlisted unigrams. Consumer OOV is therefore a
        # subset; the PROBABILITIES still agree (a listed
        # zero-evidence word's p1 equals the <unk> value).
        assert got3[i][1] <= want3[i][1], i
        assert got3[i][2] == pytest.approx(
            want3[i][2], abs=3e-5 * want3[i][0]
        ), i
    # the subset relation is non-vacuous on this corpus: doc 4's
    # "zebra" is context-listed but continuation-free
    assert got3[4][1] < want3[4][1]

    lm2 = kneser_ney_train(df, "text")
    got2 = {
        r.doc_id: r.logprob_sum
        for r in arpa_score(
            kneser_ney_arpa_rows(lm2), df, "text", "doc_id"
        ).collect()
    }
    want2 = {
        r.doc_id: (r.n_tokens, r.logprob_sum)
        for r in kneser_ney_score(lm2, df, "text", "doc_id").collect()
    }
    for i in want2:
        assert got2[i] == pytest.approx(
            want2[i][1], abs=3e-5 * want2[i][0]
        ), i


def test_arpa_score_validation(spark):
    from krnel_graph_spark.functions.arpa import (
        arpa_score,
        kneser_ney3_arpa_rows,
    )
    from krnel_graph_spark.functions.text import kneser_ney3_train

    df = _docs_df(spark)
    rows = kneser_ney3_arpa_rows(kneser_ney3_train(df, "text"))
    no_unk = rows.filter(
        ~((rows["order"] == 1) & (rows["w1"] == "<unk>"))
    )
    with pytest.raises(ValueError, match="<unk>"):
        arpa_score(no_unk, df, "text", "doc_id")
    with pytest.raises(ValueError, match="max_order"):
        arpa_score(rows, df, "text", "doc_id", max_order=5)


def test_arpa_load_rejects_malformed(spark, tmp_path):
    from krnel_graph_spark.functions.arpa import arpa_load

    bad = tmp_path / "bad.arpa"
    bad.write_text(
        "\\data\\\nngram 1=1\n\n\\1-grams:\n-1.0\tthe\textra\tfield\n\\end\\\n"
    )
    with pytest.raises(ValueError, match="malformed"):
        arpa_load(spark, str(bad))
    empty = tmp_path / "empty.arpa"
    empty.write_text("\\data\\\n\\end\\\n")
    with pytest.raises(ValueError, match="no n-gram"):
        arpa_load(spark, str(empty))


def test_arpa_load_multi_batch_flush(spark, tmp_path, monkeypatch):
    """The batched createDataFrame path (big-model imports) loses no
    rows across flushes — exercised by shrinking the batch size below
    the model's row count."""
    from krnel_graph_spark.functions import arpa as arpa_mod
    from krnel_graph_spark.functions.text import kneser_ney3_train

    df = _docs_df(spark)
    lm = kneser_ney3_train(df, "text")
    path = str(tmp_path / "mb.arpa")
    arpa_mod.kneser_ney3_export_arpa(lm, path)
    want = arpa_mod.kneser_ney3_arpa_rows(lm)
    monkeypatch.setattr(arpa_mod, "_LOAD_BATCH_ROWS", 7)
    got = arpa_mod.arpa_load(spark, path)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_arpa_full_loop_file_scoring_identical(spark, tmp_path):
    """The complete portability loop — export to a .arpa FILE, load it
    back, score — produces byte-identical results to scoring the
    in-memory rows (round-6 values survive the print/parse, so the
    file is a lossless transport, not an approximation)."""
    from krnel_graph_spark.functions.arpa import (
        arpa_load,
        arpa_score,
        kneser_ney3_arpa_rows,
        kneser_ney3_export_arpa,
    )
    from krnel_graph_spark.functions.text import kneser_ney3_train

    df = _docs_df(spark)
    lm = kneser_ney3_train(df, "text")
    rows = kneser_ney3_arpa_rows(lm, discount="modified")
    path = str(tmp_path / "loop.arpa")
    kneser_ney3_export_arpa(lm, path, discount="modified")
    via_mem = {
        r.doc_id: (r.n_tokens, r.n_oov, r.logprob_sum)
        for r in arpa_score(rows, df, "text", "doc_id").collect()
    }
    via_file = {
        r.doc_id: (r.n_tokens, r.n_oov, r.logprob_sum)
        for r in arpa_score(
            arpa_load(spark, path), df, "text", "doc_id"
        ).collect()
    }
    assert via_mem == via_file
