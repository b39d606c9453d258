"""r11 surface: Pareto-frontier skyline selection, calibration bins,
and PMI collocations. Each pinned against a brute-force numpy/pure-
Python reference on hand-built frames, plus partition-invariance checks
(the property the distributed two-phase designs must preserve)."""

import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions.sampling import skyline_select, _pareto_survivors
from krnel_graph_spark.functions.metrics import calibration_bins
from krnel_graph_spark.functions.text import pmi_collocations


# --------------------------------------------------------------------- #
# skyline_select
# --------------------------------------------------------------------- #


def _brute_skyline(points, signs):
    pts = [tuple(s * v for s, v in zip(signs, p)) for p in points]
    out = []
    for i, p in enumerate(pts):
        dominated = any(
            all(qv >= pv for qv, pv in zip(q, p))
            and any(qv > pv for qv, pv in zip(q, p))
            for j, q in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append(i)
    return sorted(out)


def test_pareto_survivors_matches_brute_force():
    rng = np.random.RandomState(7)
    for n, d in [(1, 2), (40, 2), (200, 3), (500, 4)]:
        A = rng.randint(0, 12, size=(n, d)).astype("float64")
        got = sorted(_pareto_survivors(A, chunk=32).tolist())
        want = _brute_skyline(A.tolist(), [1.0] * d)
        # survivors are index SETS over identical points: dedupe via
        # the point values (duplicates all survive in both).
        assert sorted(map(tuple, A[got].tolist())) == sorted(
            map(tuple, A[want].tolist())
        )
        assert len(got) == len(want)


def test_pareto_survivors_fp_key_tie_boundary():
    """r13 ADVICE (medium): the normalized-sum sort key is only
    NON-strictly monotone in float64 — a strict raw-axis difference can
    round away in the row sum (absorption: 1.0 + 2^-54 == 1.0), tying
    the keys. The stable sort then places the DOMINATED row first, and
    without the tied-boundary reverse prune the BNL sweep accepted it
    as a survivor forever. Rows engineered so q dominates p strictly on
    axis 1 while key(p) == key(q) exactly."""
    eps = 2.0 ** -54  # below half-ulp of 1.0: 1.0 + eps rounds to 1.0
    p = [1.0, 0.0, 5.0]   # dominated by q (strictly smaller axis 1)
    q = [1.0, eps, 5.0]
    r = [0.0, 1.0, 0.0]   # sets axis-1 span to 1 so eps stays eps
    A = np.array([p, q, r])
    key = ((A - A.min(axis=0)) / (A.max(axis=0) - A.min(axis=0))).sum(axis=1)
    assert key[0] == key[1]  # the tie this test exists to exercise
    # chunk=1 forces p and q into different BNL blocks, p first (stable
    # sort, original-index tiebreak).
    got = sorted(_pareto_survivors(A, chunk=1).tolist())
    assert got == [1, 2], f"dominated fp-tied row survived: {got}"
    # and the big-chunk path (single all-pairs block) agrees
    assert sorted(_pareto_survivors(A, chunk=2048).tolist()) == [1, 2]


def test_pareto_survivors_duplicates_all_survive():
    A = np.array([[5.0, 5.0], [5.0, 5.0], [1.0, 1.0]])
    got = _pareto_survivors(A, chunk=2048).tolist()
    assert got == [0, 1]


def test_skyline_select_small_frame(spark):
    rows = [
        (0, 10, 1),  # frontier (max chars among low lines)
        (1, 10, 1),  # exact duplicate -> also survives
        (2, 9, 1),   # dominated by 0
        (3, 12, 3),  # frontier
        (4, 12, 4),  # dominated by 3 (same chars, more lines)
        (5, 1, 0),   # frontier (min lines)
        (6, None, 1),  # null criterion -> dropped
    ]
    df = spark.createDataFrame(rows, "id long, chars int, lines int")
    out = skyline_select(df, {"chars": "max", "lines": "min"})
    got = sorted(r.id for r in out.collect())
    assert got == [0, 1, 3, 5]


def test_skyline_select_partition_invariant(spark):
    rng = np.random.RandomState(11)
    rows = [
        (int(i), int(a), int(b), int(c))
        for i, (a, b, c) in enumerate(rng.randint(0, 50, size=(3000, 3)))
    ]
    df = spark.createDataFrame(rows, "id long, x int, y int, z int")
    crit = {"x": "max", "y": "max", "z": "min"}
    one = sorted(r.id for r in skyline_select(df.coalesce(1), crit).collect())
    many = sorted(
        r.id for r in skyline_select(df.repartition(13), crit, chunk=64).collect()
    )
    want = _brute_skyline(
        [(a, b, c) for _, a, b, c in rows], [1.0, 1.0, -1.0]
    )
    assert one == many == [rows[i][0] for i in want]


def test_skyline_select_rejects_bad_direction(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError):
        skyline_select(df, {"a": "up"})
    with pytest.raises(ValueError):
        skyline_select(df, {})


# --------------------------------------------------------------------- #
# calibration_bins
# --------------------------------------------------------------------- #


def test_calibration_bins_hand_computed(spark):
    rows = [
        (0.05, 1), (0.08, 0),          # bin 0: n=2, pos=1
        (0.55, 1), (0.52, 1), (0.58, 0),  # bin 5: n=3, pos=2
        (1.00, 1),                     # score == 1.0 folds into bin 9
        (0.95, 0),                     # bin 9
        (None, 1),                     # dropped
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r.bin: r for r in calibration_bins(df, "score", "label").collect()}
    assert set(got) == {0, 5, 9}
    assert got[0].n == 2 and got[0].n_pos == 1
    assert got[0].mean_score == round((0.05 + 0.08) / 2, 6)
    assert got[0].frac_pos == 0.5
    assert got[5].n == 3 and got[5].n_pos == 2
    assert got[5].mean_score == round((0.55 + 0.52 + 0.58) / 3, 6)
    assert got[9].n == 2 and got[9].n_pos == 1
    g = got[5]
    assert g.gap == round(abs(g.mean_score - g.frac_pos), 6)


def test_calibration_bins_partition_invariant(spark):
    rng = np.random.RandomState(3)
    rows = [(float(s), int(l)) for s, l in zip(rng.rand(2000), rng.randint(0, 2, 2000))]
    df = spark.createDataFrame(rows, "score double, label int")
    a = sorted(map(tuple, calibration_bins(df.coalesce(1), "score", "label").collect()))
    b = sorted(map(tuple, calibration_bins(df.repartition(17), "score", "label").collect()))
    assert a == b
    assert sum(r[1] for r in a) == 2000


def test_calibration_bins_rejects_zero_bins(spark):
    df = spark.createDataFrame([(0.5, 1)], "score double, label int")
    with pytest.raises(ValueError):
        calibration_bins(df, "score", "label", bins=0)


# --------------------------------------------------------------------- #
# pmi_collocations
# --------------------------------------------------------------------- #


def _brute_pmi(texts, min_count, top_k):
    toks = []
    for t in texts:
        norm = " ".join(t.lower().split())
        if norm:
            toks.append(norm.split(" "))
    uni, pair = {}, {}
    n1 = n2 = 0
    for ts in toks:
        n1 += len(ts)
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            pair[(a, b)] = pair.get((a, b), 0) + 1
            n2 += 1
    out = []
    for (a, b), c in pair.items():
        if c < min_count:
            continue
        pmi = round(math.log10((c * n1 * n1) / (n2 * uni[a] * uni[b])), 6)
        out.append((a, b, c, pmi))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:top_k]


def test_pmi_collocations_matches_pure_python(spark):
    texts = [
        "new york is big and new york is loud",
        "the quick brown fox and the quick brown dog",
        "new york again and again the quick end",
        "",
        "   ",
        "single",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.w1, r.w2, r.n_pair, r.pmi)
        for r in pmi_collocations(df, "text", min_count=2, top_k=10).collect()
    ]
    assert got == _brute_pmi(texts, 2, 10)


def test_pmi_collocations_min_count_floors_hapax(spark):
    df = spark.createDataFrame(
        [("alpha beta",), ("alpha beta",), ("gamma delta",)], "text string"
    )
    got = pmi_collocations(df, "text", min_count=2, top_k=10).collect()
    assert [(r.w1, r.w2) for r in got] == [("alpha", "beta")]


def test_pmi_collocations_partition_invariant(spark):
    texts = [f"tok{i % 7} tok{(i + 1) % 7} tok{i % 5} filler" for i in range(300)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    a = [tuple(r) for r in pmi_collocations(df.coalesce(1), "text", 3, 20).collect()]
    b = [tuple(r) for r in pmi_collocations(df.repartition(11), "text", 3, 20).collect()]
    assert a == b == _brute_pmi(texts, 3, 20)


# --------------------------------------------------------------------- #
# kneser_ney_logprob
# --------------------------------------------------------------------- #


def _kn_brute(train_texts, score_docs, D=0.75):
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
    c1, n1fwd, n1back = Counter(), Counter(), Counter()
    for (a, b), c in big.items():
        c1[a] += c
        n1fwd[a] += 1
        n1back[b] += 1
    B = len(big)
    Vc = len(n1back)
    V = len({w for ts in train_toks for w in ts}) + 1

    def pcont(w):
        if B > 0:
            return max(n1back.get(w, 0) - D, 0) / B + (D * Vc / B) * (1.0 / V)
        return 1.0 / V

    out = {}
    for i, t in score_docs:
        ts = toks(t)
        if not ts:
            continue
        total = decimal.Decimal(0)
        n_oov = 0
        for j, w in enumerate(ts):
            w1 = ts[j - 1] if j >= 1 else None
            if w1 is not None and w1 in c1:
                cc = c1[w1]
                p = max(big.get((w1, w), 0) - D, 0) / cc + (
                    D * n1fwd[w1] / cc
                ) * pcont(w)
            else:
                p = pcont(w)
            total += decimal.Decimal(str(math.log10(p))).quantize(
                decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
            )
            if n1back.get(w, 0) == 0:
                n_oov += 1
        out[i] = (len(ts), n_oov, float(total))
    return out


def test_kneser_ney_matches_pure_python(spark):
    from krnel_graph_spark.functions.text import kneser_ney_logprob

    texts = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "a new cat and a new dog"),
        (3, "zebra quark the cat"),      # OOV-heavy continuations
        (4, "the the the the"),          # degenerate repetition
        (5, ""),                          # blank -> dropped
        (6, "single"),                    # 1 token, no bigram position
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.logprob_sum)
        for r in kneser_ney_logprob(df, df, "text", "doc_id").collect()
    }
    want = _kn_brute([t for _, t in texts], texts)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == want[i][1], i
        assert got[i][2] == pytest.approx(want[i][2], abs=1e-5), i


def test_kneser_ney_split_train_and_invariance(spark):
    from krnel_graph_spark.functions.text import kneser_ney_logprob

    texts = [(i, f"tok{i % 5} tok{(i + 2) % 7} tok{i % 3} end") for i in range(60)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    train = df.filter("doc_id % 5 = 0")
    a = sorted(
        map(tuple, kneser_ney_logprob(train, df, "text", "doc_id").collect())
    )
    b = sorted(
        map(
            tuple,
            kneser_ney_logprob(
                train.repartition(7), df.repartition(11), "text", "doc_id"
            ).collect(),
        )
    )
    assert a == b
    want = _kn_brute(
        [t for i, t in texts if i % 5 == 0], texts
    )
    assert len(a) == len(want)
    for row in a:
        assert row[3] == pytest.approx(want[row[0]][2], abs=1e-5)


def test_kneser_ney_rejects_bad_discount(spark):
    from krnel_graph_spark.functions.text import kneser_ney_logprob

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        kneser_ney_logprob(df, df, "text", "doc_id", discount=1.5)


# --------------------------------------------------------------------- #
# OpSpec / fluent twins
# --------------------------------------------------------------------- #


def test_skyline_select_fluent_twin(lazy_runner):
    ds = lazy_runner.from_parquet("/root/testdata/sf0.001/documents.parquet")
    op = ds.skyline_select({"n_chars": "max"})
    pdf = lazy_runner.to_pandas(op)
    # 1-axis frontier = all rows tied at the max n_chars; ids original.
    assert len(pdf) >= 1
    assert pdf["n_chars"].nunique() == 1
    # uuid stability: same spec -> same content address
    assert op.uuid == ds.skyline_select({"n_chars": "max"}).uuid
    assert op.uuid != ds.skyline_select({"n_chars": "min"}).uuid


def test_calibration_bins_fluent_twin(lazy_runner):
    ds = lazy_runner.from_parquet("/root/testdata/sf0.001/documents.parquet")
    # Score/label semantics over a [0,1] score column are pinned by the
    # functions-layer unit tests; here pin that the op round-trips
    # through the runner and the bin table is bounded. n_chars >= 1
    # everywhere, so every row folds into the top bin.
    op = ds.calibration_bins("n_chars", "n_chars", bins=10)
    pdf = lazy_runner.to_pandas(op)
    assert set(pdf.columns) >= {"bin", "n", "n_pos", "mean_score", "frac_pos", "gap"}
    assert len(pdf) <= 10


def test_pmi_collocations_fluent_twin(lazy_runner):
    ds = lazy_runner.from_parquet("/root/testdata/sf0.001/documents.parquet")
    op = ds.pmi_collocations("text", min_count=3, top_k=20)
    pdf = lazy_runner.to_pandas(op)
    assert list(pdf.columns)[:4] == ["w1", "w2", "n_pair", "pmi"] or {
        "w1", "w2", "n_pair", "pmi"
    } <= set(pdf.columns)
    assert len(pdf) <= 20
    assert (pdf["n_pair"] >= 3).all()
    # rank order is (pmi desc, w1, w2)
    key = list(zip(-pdf["pmi"], pdf["w1"], pdf["w2"]))
    assert key == sorted(key)
    # the op path releases its two vocab-sized count-table pins after
    # the bounded top-k collect. Lazy mode intentionally keeps ONE
    # localCheckpoint barrier per op result (top_k rows, ContextCleaner
    # reclaimed), so the assertion is: nothing persisted except
    # checkpoint barriers — the count tables (InMemoryRelation persists)
    # must all be gone.
    spark = lazy_runner.spark

    def _cached(tag=""):
        out = {}
        it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            e = it.next()
            out[e.getKey()] = e.getValue().toString()
        return out

    before = set(_cached())
    lazy_runner.to_pandas(ds.pmi_collocations("text", min_count=4, top_k=5))
    for rid, desc in _cached().items():
        if rid not in before:
            assert "localCheckpoint" in desc, f"leaked cached table: {desc}"


def test_kneser_ney_fluent_twin(lazy_runner):
    ds = lazy_runner.from_parquet("/root/testdata/sf0.001/documents.parquet")
    train = ds.mask_rows(ds.col_categorical("lang").is_in({"en"}))
    op = ds.kneser_ney_score(train, "text")
    pdf = lazy_runner.to_pandas(op)
    assert {"n_tokens", "n_oov", "logprob_sum"} <= set(pdf.columns)
    assert len(pdf) == 500  # enrichment: every parent row reports
    scored = pdf[pdf["n_tokens"].notna()]
    assert (scored["logprob_sum"] < 0).all()


# --------------------------------------------------------------------- #
# r11 hardening: edge-case guards
# --------------------------------------------------------------------- #


def test_skyline_rejects_non_numeric_and_missing_columns(spark):
    df = spark.createDataFrame([(1, "x")], "a int, s string")
    with pytest.raises(ValueError, match="non-numeric"):
        skyline_select(df, {"s": "max"})
    with pytest.raises(ValueError, match="not in dataframe"):
        skyline_select(df, {"zzz": "max"})
    with pytest.raises(ValueError, match="chunk"):
        skyline_select(df, {"a": "max"}, chunk=0)


def test_calibration_bins_clamps_out_of_range_scores(spark):
    df = spark.createDataFrame(
        [(-0.3, 1), (0.5, 0), (1.7, 1)], "score double, label int"
    )
    got = {r.bin: r.n for r in calibration_bins(df, "score", "label").collect()}
    # mis-scaled scores pile into the edge bins, never phantom bins
    assert got == {0: 1, 5: 1, 9: 1}


def test_pmi_rejects_bad_params(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(df, "text", min_count=0)
    with pytest.raises(ValueError, match="top_k"):
        pmi_collocations(df, "text", top_k=0)


def test_pareto_survivors_hypothesis_property():
    """Any point set: survivors == brute-force frontier (as value
    multisets), regardless of chunk size."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        pts=st.lists(
            st.tuples(
                st.integers(0, 8), st.integers(0, 8), st.integers(0, 8)
            ),
            min_size=1,
            max_size=120,
        ),
        chunk=st.sampled_from([1, 2, 7, 64]),
    )
    def check(pts, chunk):
        A = np.asarray(pts, dtype="float64")
        got = _pareto_survivors(A, chunk=chunk)
        want = _brute_skyline(pts, [1.0, 1.0, 1.0])
        assert sorted(map(tuple, A[got].tolist())) == sorted(
            tuple(map(float, pts[i])) for i in want
        )

    check()


def test_pareto_survivors_anticorrelated_worst_case_memory_bounded():
    """Fully anti-correlated axes: the frontier IS the whole input.
    The exact BNL sweep must return everything without materializing
    an n x n dominance cube (20k points, chunk 1024 -> peak temp
    arrays are chunk^2-bounded ~2 MB, not 3.2 GB)."""
    n = 20_000
    x = np.arange(n, dtype="float64")
    A = np.stack([x, -x], axis=1)
    got = _pareto_survivors(A, chunk=1024)
    assert len(got) == n
    # and a near-worst mixed case still matches brute force
    rng = np.random.RandomState(5)
    B = np.stack([x[:400], -x[:400] + rng.randint(0, 3, 400)], axis=1)
    got2 = sorted(_pareto_survivors(B, chunk=64).tolist())
    assert got2 == _brute_skyline(B.tolist(), [1.0, 1.0])


def test_pareto_2d_fast_path_matches_brute_and_scales():
    """d <= 2 dispatches to the O(n log n) sort path: exact on ties/
    duplicates, and 1M fully incomparable points finish instantly."""
    import time

    rng = np.random.RandomState(13)
    for _ in range(20):
        n = rng.randint(1, 150)
        A = rng.randint(0, 6, size=(n, 2)).astype("float64")
        got = sorted(map(tuple, A[_pareto_survivors(A, 16)].tolist()))
        want = _brute_skyline(A.tolist(), [1.0, 1.0])
        assert got == sorted(tuple(A[i]) for i in want)
    n = 1_000_000
    x = np.arange(n, dtype="float64")
    A = np.stack([x, -x], axis=1)
    t0 = time.time()
    assert len(_pareto_survivors(A, chunk=2048)) == n
    assert time.time() - t0 < 5.0


def test_skyline_global_limit_raises_loudly(spark):
    """Anti-correlated d>=3 axes: the global task refuses to grind a
    quadratic sweep past global_limit and names the regime."""
    from py4j.protocol import Py4JJavaError

    n = 3000
    df = spark.range(n).selectExpr(
        "id", "cast(id as double) as x", "cast(-id as double) as y",
        "cast(id % 7 as double) as z"
    )
    crit = {"x": "max", "y": "max", "z": "max"}
    with pytest.raises(Exception) as exc:
        skyline_select(df, crit, global_limit=1000).collect()
    assert "anti-correlated" in str(exc.value)
    # and the default limit leaves normal frontiers untouched
    assert skyline_select(df.limit(100), crit).count() == 100


def test_skyline_limit_fires_in_local_phase_too(spark):
    """r12 (ADVICE): one giant incomparable partition must fail fast in
    the LOCAL prune — on its per-partition frontier survivors — rather
    than grinding its quadratic sweep before the global check can run.
    A single coalesced partition guarantees the raise can only come
    from the local phase (nothing has reached the global task yet when
    the survivor count first exceeds the limit)."""
    n = 3000
    df = spark.range(n).selectExpr(
        "id", "cast(id as double) as x", "cast(-id as double) as y",
        "cast(id % 7 as double) as z"
    ).coalesce(1)
    crit = {"x": "max", "y": "max", "z": "max"}
    with pytest.raises(Exception) as exc:
        skyline_select(df, crit, global_limit=500).collect()
    assert "local phase" in str(exc.value)


# --------------------------------------------------------------------- #
# persistable index artifacts: bm25_index + kneser_ney_train
# --------------------------------------------------------------------- #

DOCS_SF = "/root/testdata/sf0.001/documents.parquet"


def test_bm25_index_parquet_roundtrip_identical(spark, tmp_path):
    """The sparse-retrieval index contract (the bm25 twin of
    minhash_index/ann_index): build the postings once, persist to
    parquet, and searching the READ-BACK index equals the inline
    corpus-scanning path row-for-row."""
    from krnel_graph_spark.functions.text import (
        bm25_index,
        bm25_search,
        bm25_search_index,
    )

    docs = spark.read.parquet(DOCS_SF)
    inline = [
        tuple(r) for r in bm25_search(
            docs, "text", "doc_id", "hash join spark", k=15
        ).collect()
    ]
    idx = bm25_index(docs, "text", "doc_id")
    base = str(tmp_path / "bm25_idx")
    for name, frame in idx.items():
        frame.write.parquet(f"{base}/{name}")
    reread = {
        name: spark.read.parquet(f"{base}/{name}") for name in idx
    }
    reused = [
        tuple(r) for r in bm25_search_index(
            reread, "doc_id", "hash join spark", k=15
        ).collect()
    ]
    assert reused == inline and len(inline) == 15
    with pytest.raises(ValueError, match="missing frame"):
        bm25_search_index({"postings": reread["postings"]}, "doc_id", "x")
    with pytest.raises(ValueError, match="no terms"):
        bm25_search_index(reread, "doc_id", "   ")


def test_kneser_ney_train_parquet_roundtrip_identical(spark, tmp_path):
    """Frozen-LM contract: persist the four count frames, score a
    corpus against the READ-BACK artifact, equal the inline path —
    and one artifact serves any discount (score-time knob)."""
    from krnel_graph_spark.functions.text import (
        kneser_ney_logprob,
        kneser_ney_score,
        kneser_ney_train,
    )

    docs = spark.read.parquet(DOCS_SF).limit(200)
    train = docs.filter("doc_id % 3 = 0")
    inline = sorted(
        tuple(r)
        for r in kneser_ney_logprob(train, docs, "text", "doc_id").collect()
    )
    lm = kneser_ney_train(train, "text")
    base = str(tmp_path / "kn_lm")
    for name, frame in lm.items():
        frame.write.parquet(f"{base}/{name}")
    reread = {name: spark.read.parquet(f"{base}/{name}") for name in lm}
    reused = sorted(
        tuple(r)
        for r in kneser_ney_score(reread, docs, "text", "doc_id").collect()
    )
    assert reused == inline and len(inline) > 0
    # different discount, same artifact: output changes, no retrain
    other = sorted(
        tuple(r)
        for r in kneser_ney_score(
            reread, docs, "text", "doc_id", discount=0.4
        ).collect()
    )
    assert other != reused
    with pytest.raises(ValueError, match="missing frame"):
        kneser_ney_score({"big": reread["big"]}, docs, "text", "doc_id")


def test_bm25_index_merge_equals_rebuild(spark):
    """Incremental ingest contract: index only the NEW half, merge with
    the old index, and search results equal a from-scratch rebuild of
    the full corpus — old text never re-tokenized."""
    from krnel_graph_spark.functions.text import (
        bm25_index,
        bm25_index_merge,
        bm25_search_index,
    )

    docs = spark.read.parquet(DOCS_SF)
    old = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    merged = bm25_index_merge(
        bm25_index(old, "text", "doc_id"), bm25_index(new, "text", "doc_id")
    )
    full = bm25_index(docs, "text", "doc_id")
    q = "hash join spark"
    got = [tuple(r) for r in bm25_search_index(merged, "doc_id", q, k=15).collect()]
    want = [tuple(r) for r in bm25_search_index(full, "doc_id", q, k=15).collect()]
    assert got == want and len(got) == 15
    with pytest.raises(ValueError, match="missing frame"):
        bm25_index_merge({"postings": full["postings"]}, full)
    # overlapping doc sets would double-count postings/df_t/n_docs:
    # the default validate pass must fail loudly, not corrupt scores
    with pytest.raises(ValueError, match="overlap"):
        bm25_index_merge(full, bm25_index(new, "text", "doc_id"))
    # structurally-disjoint pipelines can skip the validation job
    skipped = bm25_index_merge(
        full, bm25_index(new, "text", "doc_id"), validate=False
    )
    assert set(skipped) == {"postings", "term_df", "stats"}


def test_calibration_bins_drops_nan_scores(spark):
    """A NaN score must be dropped like a null — not folded into an
    edge bin as a phantom row with NULL mean/gap."""
    rows = [(float("nan"), 1), (0.95, 0), (0.91, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r.bin: r for r in calibration_bins(df, "score", "label").collect()}
    assert set(got) == {9}
    assert got[9].n == 2 and got[9].mean_score is not None


def test_skyline_rejects_interval_types(spark):
    """'interval day to second' starts with 'int' — the type guard
    must still reject it (isinstance, not string prefixes)."""
    df = spark.range(3).selectExpr(
        "id", "make_dt_interval(0, 0, 0, id) as iv"
    )
    with pytest.raises(ValueError, match="non-numeric"):
        skyline_select(df, {"iv": "max"})
