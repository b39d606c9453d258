"""Trigram Kneser-Ney (r12): pure-python differential reference,
pruning semantics, partition invariance, parquet artifact roundtrip,
and the OpSpec twin's content-address contract."""

from __future__ import annotations

import math

import pytest


def _kn3_brute(train_texts, score_docs, D=0.75, min_count=1, modified=False):
    import decimal
    from collections import Counter

    def toks(t):
        n = " ".join((t or "").lower().split())
        return n.split(" ") if n else None

    train_toks = [ts for ts in (toks(t) for t in train_texts) if ts]
    big = Counter()
    for ts in train_toks:
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] += 1
    n1back = Counter()
    for (a, b), c in big.items():
        n1back[b] += 1
    B, Vc = len(big), len(n1back)
    V = len({w for ts in train_toks for w in ts}) + 1

    tri_all = Counter()
    for ts in train_toks:
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            tri_all[(a, b, c)] += 1
    c_uv, n1f_uv = Counter(), Counter()
    mid = Counter()  # (v, w) -> distinct u count
    for (u, v, w), c in tri_all.items():
        c_uv[(u, v)] += c
        n1f_uv[(u, v)] += 1
        mid[(v, w)] += 1
    m_ctx, n1f_mid = Counter(), Counter()
    for (v, w), c in mid.items():
        m_ctx[v] += c
        n1f_mid[v] += 1
    # pruning drops rows from the LOOKUP table only
    tri = {g: c for g, c in tri_all.items() if c >= min_count}

    def _mkn(counts):
        t = [sum(1 for c in counts if c == k) for k in (1, 2, 3, 4)]
        out = []
        for k in (1, 2, 3):
            if t[0] > 0 and (k == 1 or t[k - 1] > 0):
                Y = t[0] / (t[0] + 2.0 * t[1])
                d = k - (k + 1) * Y * t[k] / t[k - 1]
                out.append(max(0.0, min(d, float(k))))
            else:
                out.append(D)
        return out

    if modified:
        dts = _mkn(list(tri_all.values()))
        dms = _mkn(list(mid.values()))
        dbs = _mkn(list(n1back.values()))
        nn = {}
        for (u, v, w), c in tri_all.items():
            cls = 0 if c == 1 else (1 if c == 2 else 2)
            nn.setdefault((u, v), [0, 0, 0])[cls] += 1
        mm = {}
        for (v, w), c in mid.items():
            cls = 0 if c == 1 else (1 if c == 2 else 2)
            mm.setdefault(v, [0, 0, 0])[cls] += 1
        bb = [0, 0, 0]
        for c in n1back.values():
            bb[0 if c == 1 else (1 if c == 2 else 2)] += 1

    def _dk(ds, c):
        return ds[0] if c == 1 else (ds[1] if c == 2 else ds[2])

    def pcont(w):
        if B > 0:
            c = n1back.get(w, 0)
            if modified:
                # r13: per-class discounts at the bottom level too —
                # one global context, so the backoff mass is a scalar
                gam = sum(d * n for d, n in zip(dbs, bb))
                return max(c - _dk(dbs, c), 0) / B + (gam / B) * (1.0 / V)
            return max(c - D, 0) / B + (D * Vc / B) * (1.0 / V)
        return 1.0 / V

    def p2(v, w):
        if v is not None and v in m_ctx:
            mc = m_ctx[v]
            c = mid.get((v, w), 0)
            if modified:
                gam = sum(d * n for d, n in zip(dms, mm[v]))
                return max(c - _dk(dms, c), 0) / mc + (gam / mc) * pcont(w)
            return max(c - D, 0) / mc + (D * n1f_mid[v] / mc) * pcont(w)
        return pcont(w)

    def p3(u, v, w):
        if u is not None and (u, v) in c_uv:
            cc = c_uv[(u, v)]
            c = tri.get((u, v, w), 0)
            if modified:
                gam = sum(d * n for d, n in zip(dts, nn[(u, v)]))
                return max(c - _dk(dts, c), 0) / cc + (gam / cc) * p2(v, w)
            return max(c - D, 0) / cc + (D * n1f_uv[(u, v)] / cc) * p2(v, w)
        return p2(v, w)

    out = {}
    for i, t in score_docs:
        ts = toks(t)
        if not ts:
            continue
        total = decimal.Decimal(0)
        n_oov = 0
        for j, w in enumerate(ts):
            v = ts[j - 1] if j >= 1 else None
            u = ts[j - 2] if j >= 2 else None
            p = p3(u, v, w)
            total += decimal.Decimal(str(math.log10(p))).quantize(
                decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
            )
            if n1back.get(w, 0) == 0:
                n_oov += 1
        out[i] = (len(ts), n_oov, float(total))
    return out


TEXTS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat sat on the log again"),
    (3, "a new cat and a new dog"),
    (4, "zebra quark the cat"),   # OOV-heavy
    (5, "the the the the"),        # degenerate repetition
    (6, ""),                        # blank -> dropped
    (7, "single"),                  # no bigram/trigram positions
    (8, "two words"),               # bigram but no trigram
]


def test_kn3_matches_pure_python(spark):
    from krnel_graph_spark.functions.text import kneser_ney3_logprob

    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.logprob_sum)
        for r in kneser_ney3_logprob(df, df, "text", "doc_id").collect()
    }
    want = _kn3_brute([t for _, t in TEXTS], TEXTS)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == want[i][1], i
        assert got[i][2] == pytest.approx(want[i][2], abs=1e-5), i


def test_kn3_pruning_matches_brute_and_changes_scores(spark):
    from krnel_graph_spark.functions.text import kneser_ney3_logprob

    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.logprob_sum)
        for r in kneser_ney3_logprob(
            df, df, "text", "doc_id", min_count=2
        ).collect()
    }
    want = _kn3_brute([t for _, t in TEXTS], TEXTS, min_count=2)
    for i in want:
        assert got[i] == (
            want[i][0],
            want[i][1],
            pytest.approx(want[i][2], abs=1e-5),
        ), i
    # pruning must actually bite: "the cat sat" appears twice (kept),
    # most other trigrams are hapax (pruned) -> some score changes
    unpruned = _kn3_brute([t for _, t in TEXTS], TEXTS, min_count=1)
    assert any(
        want[i][2] != pytest.approx(unpruned[i][2], abs=1e-9) for i in want
    )
    # pruned grams fall to the discounted backoff -> never a better score
    for i in want:
        assert want[i][2] <= unpruned[i][2] + 1e-9


def test_kn3_modified_discounts_match_pure_python(spark):
    """discount='modified' = Chen & Goodman three-discount KN (KenLM's
    default): D1/D2/D3+ estimated from the artifact's count-of-counts,
    per-count-class backoff weights — same discount-free artifact, a
    score-time flag."""
    from krnel_graph_spark.functions.text import kneser_ney3_logprob

    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.logprob_sum)
        for r in kneser_ney3_logprob(
            df, df, "text", "doc_id", discount="modified"
        ).collect()
    }
    want = _kn3_brute([t for _, t in TEXTS], TEXTS, modified=True)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == want[i][1], i
        assert got[i][2] == pytest.approx(want[i][2], abs=1e-5), i
    # and it genuinely differs from single-discount KN on this corpus
    fixed = _kn3_brute([t for _, t in TEXTS], TEXTS)
    assert any(
        want[i][2] != pytest.approx(fixed[i][2], abs=1e-9) for i in want
    )


def test_kn3_partition_invariance(spark):
    from krnel_graph_spark.functions.text import kneser_ney3_logprob

    texts = [
        (i, f"tok{i % 5} tok{(i + 2) % 7} tok{i % 3} tok{(i + 1) % 4} end")
        for i in range(60)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    train = df.filter("doc_id % 5 = 0")
    a = sorted(
        map(tuple, kneser_ney3_logprob(train, df, "text", "doc_id").collect())
    )
    b = sorted(
        map(
            tuple,
            kneser_ney3_logprob(
                train.repartition(7), df.repartition(11), "text", "doc_id"
            ).collect(),
        )
    )
    assert a == b
    want = _kn3_brute([t for i, t in texts if i % 5 == 0], texts)
    for row in a:
        assert row[3] == pytest.approx(want[row[0]][2], abs=1e-5)


def test_kn3_artifact_parquet_roundtrip(spark, tmp_path):
    """The six count frames survive a parquet write/read with identical
    scoring — the persist-once / score-forever production contract."""
    from krnel_graph_spark.functions.text import (
        kneser_ney3_score,
        kneser_ney3_train,
    )

    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    lm = kneser_ney3_train(df, "text")
    direct = sorted(
        map(tuple, kneser_ney3_score(lm, df, "text", "doc_id").collect())
    )
    direct_mod = sorted(
        map(
            tuple,
            kneser_ney3_score(
                lm, df, "text", "doc_id", discount="modified"
            ).collect(),
        )
    )
    frames = ("tri", "tctx", "mid", "vstats", "back", "scalars", "coc")
    for key in frames:
        lm[key].write.parquet(str(tmp_path / key))
    for key in lm:
        if key.startswith("_pinned_"):
            lm[key].unpersist()
    reloaded = {key: spark.read.parquet(str(tmp_path / key)) for key in frames}
    rt = sorted(
        map(tuple, kneser_ney3_score(reloaded, df, "text", "doc_id").collect())
    )
    assert direct == rt
    # modified smoothing from the SAME persisted artifact, no retrain
    rt_mod = sorted(
        map(
            tuple,
            kneser_ney3_score(
                reloaded, df, "text", "doc_id", discount="modified"
            ).collect(),
        )
    )
    assert direct_mod == rt_mod and rt_mod != rt


def test_kn3_rejects_bad_params(spark):
    from krnel_graph_spark.functions.text import (
        kneser_ney3_logprob,
        kneser_ney3_score,
        kneser_ney3_train,
    )

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        kneser_ney3_logprob(df, df, "text", "doc_id", discount=1.5)
    with pytest.raises(ValueError):
        kneser_ney3_train(df, "text", min_count=0)
    with pytest.raises(ValueError, match="missing frame"):
        kneser_ney3_score({"tri": df}, df, "text", "doc_id")


def test_kn3_fluent_twin(lazy_runner):
    ds = lazy_runner.from_parquet("/root/testdata/sf0.001/documents.parquet")
    train = ds.mask_rows(ds.col_categorical("lang").is_in({"en"}))
    op = ds.kneser_ney3_score(train, "text")
    assert op.uuid == ds.kneser_ney3_score(train, "text").uuid
    # a distinct op family from the bigram model, and pruning forks it
    assert op.uuid != ds.kneser_ney_score(train, "text").uuid
    assert op.uuid != ds.kneser_ney3_score(train, "text", min_count=2).uuid
    pdf = lazy_runner.to_pandas(op)
    assert {"n_tokens", "n_oov", "logprob_sum"} <= set(pdf.columns)
    assert len(pdf) == 500  # enrichment: every parent row reports
    scored = pdf[pdf["n_tokens"].notna()]
    assert (scored["logprob_sum"] < 0).all()


def test_kn3_modified_fluent_fork(lazy_runner):
    ds = lazy_runner.from_parquet("/root/testdata/sf0.001/documents.parquet")
    train = ds.mask_rows(ds.col_categorical("lang").is_in({"en"}))
    fixed = ds.kneser_ney3_score(train, "text")
    mod = ds.kneser_ney3_score(train, "text", smoothing="modified")
    assert fixed.uuid != mod.uuid
    with pytest.raises(ValueError, match="smoothing"):
        ds.kneser_ney3_score(train, "text", smoothing="kn")
    pdf = lazy_runner.to_pandas(mod)
    fdf = lazy_runner.to_pandas(fixed)
    scored = pdf[pdf["n_tokens"].notna()]
    assert (scored["logprob_sum"] < 0).all()
    assert not pdf["logprob_sum"].equals(fdf["logprob_sum"])


def test_kn3_modified_empty_train_falls_back(spark):
    """An empty (or all-blank) train corpus leaves NULL count-of-count
    sums; modified mode must fall back to the base discount and score
    everything at the uniform floor rather than raising."""
    train = spark.createDataFrame([(0, "")], "doc_id long, text string")
    score = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    from krnel_graph_spark.functions.text import kneser_ney3_logprob

    rows = kneser_ney3_logprob(
        train, score, "text", "doc_id", discount="modified"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_tokens == 3 and r.n_oov == 3
    assert r.logprob_sum == 3 * round(__import__("math").log10(1.0), 6)


def test_kn3_modified_pcont_per_class_is_not_vacuous(spark):
    """r13: the bottom continuation level applies per-class discounts
    too (the r12 verdict's documented fidelity gap). Two pins: (1) on a
    corpus whose back table HAS count classes (hapax continuations),
    the per-class bottom level produces different scores than the
    single-base-discount fallback; (2) a legacy artifact whose coc
    frame predates the b-columns still scores (falls back, doesn't
    raise)."""
    from krnel_graph_spark.functions.text import (
        kneser_ney3_score,
        kneser_ney3_train,
    )

    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    lm = kneser_ney3_train(df, "text")
    coc = lm["coc"].collect()[0]
    # TEXTS has hapax continuations, so the class split is real here
    assert coc["b1"] > 0 and coc["btot"] > coc["b1"]
    new = {
        r.doc_id: r.logprob_sum
        for r in kneser_ney3_score(
            lm, df, "text", "doc_id", discount="modified"
        ).collect()
    }
    legacy = dict(lm)
    legacy["coc"] = lm["coc"].drop("b1", "b2", "b3", "b4", "btot")
    old = {
        r.doc_id: r.logprob_sum
        for r in kneser_ney3_score(
            legacy, df, "text", "doc_id", discount="modified"
        ).collect()
    }
    assert set(new) == set(old)
    assert any(new[i] != old[i] for i in new), (
        "per-class bottom-level discounts changed nothing — vacuous"
    )
