"""Order-generic Kneser-Ney training (r14): the generic trainer at
order 3 must be row-for-row identical to the pinned kn3 ARPA exporter,
and at order 5 an INDEPENDENT Python implementation of interpolated KN
must reproduce the engine's per-document scores through the full
train → ARPA rows → arpa_score path."""

from __future__ import annotations

import decimal
import math
from collections import Counter

import pytest

TEXTS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat sat on the log again and again"),
    (3, "a new cat and a new dog sat on a new mat"),
    (4, "zebra quark the cat sat on the mat"),
    (5, "the the the the the the"),
    (6, ""),
    (7, "single"),
    (8, "two words"),
    (9, "the cat sat on the mat quietly today"),
]


def _toks(t):
    n = " ".join((t or "").lower().split())
    return n.split(" ") if n else None


class _PyKN:
    """Independent interpolated Kneser-Ney (Chen & Goodman 1998),
    plain dict counting — continuation counts from raw (k+1)-gram
    types, single discount, unseen contexts fall through with
    coefficient 1, uniform-interpolated bottom."""

    def __init__(self, docs, order, D=0.75):
        self.n, self.D = order, D
        raw = {k: Counter() for k in range(1, order + 1)}
        for t in docs:
            for k in range(1, order + 1):
                for i in range(len(t) - k + 1):
                    raw[k][tuple(t[i:i + k])] += 1
        self.raw = raw
        self.cc = {}
        for k in range(1, order):
            c = Counter()
            for g in raw[k + 1]:
                c[g[1:]] += 1
            self.cc[k] = c
        self.tot, self.n1f = {}, {}
        for k in range(2, order + 1):
            src = raw[order] if k == order else self.cc[k]
            tot, n1f = Counter(), Counter()
            for g, c in src.items():
                tot[g[:-1]] += c
                n1f[g[:-1]] += 1
            self.tot[k], self.n1f[k] = tot, n1f
        self.B = len(raw[2])
        self.Vc = len(self.cc[1])
        self.V = len(raw[1]) + 1

    def p1(self, w):
        if self.B == 0:
            return 1.0 / self.V
        nb = self.cc[1].get((w,), 0)
        return max(nb - self.D, 0.0) / self.B + (
            self.D * self.Vc / self.B
        ) * (1.0 / self.V)

    def p(self, k, g):
        if k == 1:
            return self.p1(g[-1])
        ctx = g[:-1]
        if ctx not in self.tot[k]:
            return self.p(k - 1, g[1:])
        src = self.raw[self.n] if k == self.n else self.cc[k]
        cnt = src.get(g, 0)
        tot, n1f = self.tot[k][ctx], self.n1f[k][ctx]
        return max(cnt - self.D, 0.0) / tot + (
            self.D * n1f / tot
        ) * self.p(k - 1, g[1:])

    def doc(self, toks):
        total = decimal.Decimal(0)
        for j in range(len(toks)):
            k = min(self.n, j + 1)
            val = math.log10(self.p(k, tuple(toks[j - k + 1:j + 1])))
            total += decimal.Decimal(str(val)).quantize(
                decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
            )
        return float(total)


def _docs_df(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


@pytest.mark.parametrize("min_count", [1, 2])
def test_generic_order3_matches_kn3_exporter(spark, min_count):
    """The generic trainer at order 3 is the SAME model as the pinned
    kn3 family: identical ARPA rows, row for row (the differential
    that anchors the generalization to the oracle-graded kn3 path)."""
    from krnel_graph_spark.functions.arpa import kneser_ney3_arpa_rows
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_train,
    )
    from krnel_graph_spark.functions.text import kneser_ney3_train

    df = _docs_df(spark)
    want = kneser_ney3_arpa_rows(
        kneser_ney3_train(df, "text", min_count=min_count)
    )
    got = kneser_ney_ngram_arpa_rows(
        kneser_ney_ngram_train(df, "text", order=3, min_count=min_count)
    )
    assert got.columns == want.columns
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_generic_order2_matches_kn2_exporter(spark):
    """The generic trainer at order 2 is the SAME model as the pinned
    bigram family: identical ARPA rows (modulo the kn2 exporter's
    always-null w3 pad column) — the anchor that lets the CLI route
    order-2 --min-count/--modified through the generic path."""
    from krnel_graph_spark.functions.arpa import kneser_ney_arpa_rows
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_train,
    )
    from krnel_graph_spark.functions.text import kneser_ney_train

    df = _docs_df(spark)
    want = kneser_ney_arpa_rows(kneser_ney_train(df, "text")).drop("w3")
    got = kneser_ney_ngram_arpa_rows(
        kneser_ney_ngram_train(df, "text", order=2)
    )
    assert got.columns == want.columns
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


@pytest.mark.parametrize("order", [2, 4, 5])
def test_order_n_scores_match_python_reference(spark, order):
    """train(order=N) → ARPA rows → arpa_score reproduces an
    independent Python interpolated-KN implementation per document
    (the full portability pipeline as the scoring path)."""
    from krnel_graph_spark.functions.arpa import arpa_score
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_train,
    )

    df = _docs_df(spark)
    lm = kneser_ney_ngram_train(df, "text", order=order)
    rows = kneser_ney_ngram_arpa_rows(lm)
    ref = _PyKN([t for _, s in TEXTS if (t := _toks(s))], order)
    got = {
        r.doc_id: (r.n_tokens, r.logprob_sum)
        for r in arpa_score(rows, df, "text", "doc_id").collect()
    }
    for i, s in TEXTS:
        ts = _toks(s)
        if not ts:
            assert i not in got
            continue
        assert got[i][0] == len(ts)
        # round-6 backoff composition drift: the consumer adds up to
        # N-1 rounded bows where the reference rounds once per term
        assert got[i][1] == pytest.approx(
            ref.doc(ts), abs=1e-4 * len(ts)
        ), (i, s)


def test_order5_pruned_backs_off_through_unpruned_weights(spark):
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_train,
    )

    df = _docs_df(spark)
    rows = kneser_ney_ngram_arpa_rows(
        kneser_ney_ngram_train(df, "text", order=5, min_count=2)
    ).collect()
    full = kneser_ney_ngram_arpa_rows(
        kneser_ney_ngram_train(df, "text", order=5)
    ).collect()
    n5 = sum(1 for r in rows if r["order"] == 5)
    n5_full = sum(1 for r in full if r["order"] == 5)
    assert 0 < n5 < n5_full
    # pruning only trims the TOP section; lower sections (the backoff
    # weights a consumer needs) are identical
    low = sorted(tuple(r) for r in rows if r["order"] < 5)
    low_full = sorted(tuple(r) for r in full if r["order"] < 5)
    assert low == low_full


def test_order5_unigram_section_sums_to_one(spark):
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_train,
    )

    df = _docs_df(spark)
    rows = kneser_ney_ngram_arpa_rows(
        kneser_ney_ngram_train(df, "text", order=5)
    ).collect()
    uni = [r for r in rows if r["order"] == 1]
    s = sum(10.0 ** r["log10_p"] for r in uni)
    assert 0.9 < s <= 1.0 + 1e-6
    assert any(r["w1"] == "<unk>" for r in uni)


def test_order5_arpa_file_roundtrip(spark, tmp_path):
    """export(order-5 artifact) → arpa_load is an exact row-multiset
    identity (round-6 survives the %.6f print/parse), and the loaded
    frame scores byte-identically to the in-memory rows."""
    from krnel_graph_spark.functions.arpa import arpa_load, arpa_score
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_export_arpa,
        kneser_ney_ngram_train,
    )

    df = _docs_df(spark)
    lm = kneser_ney_ngram_train(df, "text", order=5)
    rows = kneser_ney_ngram_arpa_rows(lm)
    path = str(tmp_path / "o5.arpa")
    kneser_ney_ngram_export_arpa(lm, path)
    back = arpa_load(spark, path)
    assert back.columns == rows.columns
    assert back.exceptAll(rows).count() == 0
    assert rows.exceptAll(back).count() == 0
    via_mem = {
        r.doc_id: (r.n_tokens, r.n_oov, r.logprob_sum)
        for r in arpa_score(rows, df, "text", "doc_id").collect()
    }
    via_file = {
        r.doc_id: (r.n_tokens, r.n_oov, r.logprob_sum)
        for r in arpa_score(back, df, "text", "doc_id").collect()
    }
    assert via_mem == via_file


def test_ngram_train_validation(spark):
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_train,
    )

    df = _docs_df(spark)
    with pytest.raises(ValueError, match="order"):
        kneser_ney_ngram_train(df, "text", order=1)
    with pytest.raises(ValueError, match="order"):
        kneser_ney_ngram_train(df, "text", order=9)
    with pytest.raises(ValueError, match="min_count"):
        kneser_ney_ngram_train(df, "text", order=4, min_count=0)
    lm = kneser_ney_ngram_train(df, "text", order=4)
    with pytest.raises(ValueError, match="missing frame"):
        kneser_ney_ngram_arpa_rows(
            {k: v for k, v in lm.items() if k != "top"}
        )
    with pytest.raises(ValueError, match="level-3"):
        kneser_ney_ngram_arpa_rows(
            {k: v for k, v in lm.items() if k != "cont3"}
        )
    with pytest.raises(ValueError, match="discount"):
        kneser_ney_ngram_arpa_rows(lm, discount=1.5)


# --------------------------------------------------------------------- #
# modified Kneser-Ney, order-generic (r14)                               #
# --------------------------------------------------------------------- #


def _mkn_d(counts, base=0.75):
    """Chen & Goodman closed-form per-class discounts from a count
    multiset — independent replica of the engine's _mkn3_discounts."""
    t = [0.0] * 4
    for c in counts:
        if 1 <= c <= 4:
            t[c - 1] += 1
    out = []
    for k in (1, 2, 3):
        if t[0] > 0 and (k == 1 or t[k - 1] > 0):
            y = t[0] / (t[0] + 2.0 * t[1])
            d = k - (k + 1) * y * t[k] / t[k - 1]
            out.append(max(0.0, min(d, float(k))))
        else:
            out.append(base)
    return out


class _PyMKN(_PyKN):
    """Modified-KN extension of the reference: per-class D1/D2/D3+ at
    every level (incl. the scalar-context bottom), same count tables."""

    def __init__(self, docs, order, base=0.75):
        super().__init__(docs, order, D=base)
        self.dd = {}
        for k in range(2, order + 1):
            src = self.raw[order] if k == order else self.cc[k]
            self.dd[k] = _mkn_d(src.values(), base)
        self.db = _mkn_d(self.cc[1].values(), base)
        b = [0.0, 0.0]
        b3p = 0.0
        for c in self.cc[1].values():
            if c == 1:
                b[0] += 1
            elif c == 2:
                b[1] += 1
            else:
                b3p += 1
        self.gamma_b = (
            self.db[0] * b[0] + self.db[1] * b[1] + self.db[2] * b3p
        )

    def _d(self, ds, c):
        return ds[0] if c == 1 else ds[1] if c == 2 else ds[2]

    def p1(self, w):
        if self.B == 0:
            return 1.0 / self.V
        nb = self.cc[1].get((w,), 0)
        return max(nb - self._d(self.db, nb), 0.0) / self.B + (
            self.gamma_b / self.B
        ) * (1.0 / self.V)

    def p(self, k, g):
        if k == 1:
            return self.p1(g[-1])
        ctx = g[:-1]
        if ctx not in self.tot[k]:
            return self.p(k - 1, g[1:])
        src = self.raw[self.n] if k == self.n else self.cc[k]
        cnt = src.get(g, 0)
        tot = self.tot[k][ctx]
        cls = [0.0, 0.0, 0.0]
        for gg, c in src.items():
            if gg[:-1] == ctx:
                cls[0 if c == 1 else 1 if c == 2 else 2] += 1
        ds = self.dd[k]
        gamma = ds[0] * cls[0] + ds[1] * cls[1] + ds[2] * cls[2]
        return max(cnt - self._d(ds, cnt), 0.0) / tot + (
            gamma / tot
        ) * self.p(k - 1, g[1:])


def test_generic_order3_modified_matches_kn3_exporter(spark):
    """discount='modified' at order 3 through the generic path is
    row-for-row the kn3 exporter's modified output — per-class
    discounts at every level including the bottom continuation."""
    from krnel_graph_spark.functions.arpa import kneser_ney3_arpa_rows
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_train,
    )
    from krnel_graph_spark.functions.text import kneser_ney3_train

    df = _docs_df(spark)
    want = kneser_ney3_arpa_rows(
        kneser_ney3_train(df, "text"), discount="modified"
    )
    got = kneser_ney_ngram_arpa_rows(
        kneser_ney_ngram_train(df, "text", order=3), discount="modified"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


@pytest.mark.parametrize("order", [2, 5])
def test_order_n_modified_matches_python_reference(spark, order):
    from krnel_graph_spark.functions.arpa import arpa_score
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_train,
    )

    df = _docs_df(spark)
    lm = kneser_ney_ngram_train(df, "text", order=order)
    rows = kneser_ney_ngram_arpa_rows(lm, discount="modified")
    ref = _PyMKN([t for _, s in TEXTS if (t := _toks(s))], order)
    got = {
        r.doc_id: r.logprob_sum
        for r in arpa_score(rows, df, "text", "doc_id").collect()
    }
    fixed = {
        r.doc_id: r.logprob_sum
        for r in arpa_score(
            kneser_ney_ngram_arpa_rows(lm), df, "text", "doc_id"
        ).collect()
    }
    differs = 0
    for i, s in TEXTS:
        ts = _toks(s)
        if not ts:
            continue
        assert got[i] == pytest.approx(
            ref.doc(ts), abs=1e-4 * len(ts)
        ), (i, s)
        if got[i] != pytest.approx(fixed[i], abs=1e-5):
            differs += 1
    # modified is not vacuous on this corpus
    assert differs > 0


def test_modified_requires_coc(spark):
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_train,
    )

    df = _docs_df(spark)
    lm = kneser_ney_ngram_train(df, "text", order=4)
    with pytest.raises(ValueError, match="coc"):
        kneser_ney_ngram_arpa_rows(
            {k: v for k, v in lm.items() if k != "coc"},
            discount="modified",
        )


def test_ngram_save_load_roundtrip(spark, tmp_path):
    """Persisted artifact → load → rows is identical to rows off the
    in-memory artifact (order read back from the scalars frame); a
    truncated snapshot fails loudly at LOAD."""
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_load,
        kneser_ney_ngram_save,
        kneser_ney_ngram_train,
    )

    df = _docs_df(spark)
    lm = kneser_ney_ngram_train(df, "text", order=4)
    path = str(tmp_path / "kn4_idx")
    kneser_ney_ngram_save(lm, path)
    back = kneser_ney_ngram_load(spark, path)
    want = kneser_ney_ngram_arpa_rows(lm, discount="modified")
    got = kneser_ney_ngram_arpa_rows(back, discount="modified")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    import shutil

    shutil.rmtree(f"{path}/cont3")
    with pytest.raises(ValueError, match="cont3"):
        kneser_ney_ngram_load(spark, path)


# --------------------------------------------------------------------- #
# per-level pruning (mid-r14) — KenLM lmplz --prune's shape              #
# --------------------------------------------------------------------- #


def _py_kept_sets(docs, order, prune):
    """Independent top-down kept-set recursion: level-k events above
    threshold ∪ prefixes of kept_{k+1}."""
    raw = {k: Counter() for k in range(1, order + 1)}
    for t in docs:
        for k in range(1, order + 1):
            for i in range(len(t) - k + 1):
                raw[k][tuple(t[i:i + k])] += 1
    cc = {}
    for k in range(2, order):
        c = Counter()
        for g in raw[k + 1]:
            c[g[1:]] += 1
        cc[k] = c
    kept = {}
    for k in range(order, 1, -1):
        src = raw[order] if k == order else cc[k]
        s = {g for g, c in src.items() if c > prune[k - 2]}
        if k < order:
            s |= {g[:-1] for g in kept[k + 1]}
        kept[k] = s
    return kept


@pytest.mark.parametrize("order,prune", [
    (3, (0, 1)),
    (5, (0, 0, 1, 1)),
    (5, (1, 1, 1, 1)),
])
def test_pruned_rows_are_kept_subset_of_unpruned(spark, order, prune):
    """prune thins the listings to exactly the kept-set recursion; kept
    rows are BIT-identical to the unpruned export (stats unpruned, no
    renormalization — the documented min_count-style semantics), and
    ARPA prefix closure survives."""
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_train,
    )

    df = _docs_df(spark)
    lm = kneser_ney_ngram_train(df, "text", order=order)
    full = kneser_ney_ngram_arpa_rows(lm).collect()
    pruned = kneser_ney_ngram_arpa_rows(lm, prune=prune).collect()

    wc = [f"w{i}" for i in range(1, order + 1)]

    def key(r):
        return (r["order"],) + tuple(r[w] for w in wc)

    full_by_key = {key(r): (r["log10_p"], r["log10_bow"]) for r in full}
    kept_ref = _py_kept_sets(
        [t for _, s in TEXTS if (t := _toks(s))], order, prune
    )
    listed = {k: set() for k in range(1, order + 1)}
    for r in pruned:
        o = r["order"]
        g = tuple(r[w] for w in wc[:o])
        listed[o].add(g)
        # value identity with the unpruned export
        assert (r["log10_p"], r["log10_bow"]) == full_by_key[key(r)]
    # section 1 never pruned: identical listing
    assert listed[1] == {
        (r["w1"],) for r in full if r["order"] == 1
    }
    for k in range(2, order + 1):
        assert listed[k] == kept_ref[k], k
        # strictly thinner somewhere when the threshold bites
        full_k = {
            tuple(r[w] for w in wc[:k]) for r in full if r["order"] == k
        }
        assert listed[k] <= full_k
    assert any(
        listed[k] < {
            tuple(r[w] for w in wc[:k]) for r in full if r["order"] == k
        }
        for k in range(2, order + 1)
    ), "prune thresholds never bit on this corpus"
    # prefix closure
    for k in range(2, order + 1):
        for g in listed[k]:
            assert g[:-1] in listed[k - 1], g


def test_pruned_model_never_scores_better(spark):
    """A pruned gram falls through to the already-discounted backoff:
    per-document logprob sums can only go down (kn3's min_count
    property, per-level-generic)."""
    from krnel_graph_spark.functions.arpa import arpa_score
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_train,
    )

    df = _docs_df(spark)
    lm = kneser_ney_ngram_train(df, "text", order=4)
    full = {
        r.doc_id: r.logprob_sum
        for r in arpa_score(
            kneser_ney_ngram_arpa_rows(lm), df, "text", "doc_id"
        ).collect()
    }
    pruned = {
        r.doc_id: r.logprob_sum
        for r in arpa_score(
            kneser_ney_ngram_arpa_rows(lm, prune=(1, 1, 1)),
            df, "text", "doc_id",
        ).collect()
    }
    assert pruned.keys() == full.keys()
    assert any(pruned[i] < full[i] - 1e-9 for i in full)
    for i in full:
        assert pruned[i] <= full[i] + 1e-9, i


def test_prune_validation_and_file_roundtrip(spark, tmp_path):
    from krnel_graph_spark.functions.arpa import arpa_load
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_export_arpa,
        kneser_ney_ngram_train,
    )

    df = _docs_df(spark)
    lm = kneser_ney_ngram_train(df, "text", order=4)
    with pytest.raises(ValueError, match="thresholds"):
        kneser_ney_ngram_arpa_rows(lm, prune=(1,))
    with pytest.raises(ValueError, match=">= 0"):
        kneser_ney_ngram_arpa_rows(lm, prune=(0, 0, -1))
    # all-zero prune degenerates to the unpruned export
    z = kneser_ney_ngram_arpa_rows(lm, prune=(0, 0, 0))
    f = kneser_ney_ngram_arpa_rows(lm)
    assert z.exceptAll(f).count() == 0 and f.exceptAll(z).count() == 0
    # pruned file roundtrip: header counts reflect the pruned sections
    want = kneser_ney_ngram_arpa_rows(lm, prune=(0, 1, 1))
    path = str(tmp_path / "p.arpa")
    kneser_ney_ngram_export_arpa(lm, path, prune=(0, 1, 1))
    back = arpa_load(spark, path)
    assert back.exceptAll(want).count() == 0
    assert want.exceptAll(back).count() == 0
