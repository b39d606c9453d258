"""Product-quantization ANN tests: reconstruction quality scales with
codebook size, ADC recall against exact L2 top-k, and deterministic
training/encoding."""

from __future__ import annotations

import numpy as np
import pytest

from krnel_graph_spark.functions.similarity import pq_encode, pq_topk, pq_train


@pytest.fixture(scope="module")
def vecs_df(spark):
    rng = np.random.default_rng(5)
    # 12 loose clusters in 16-dim so neighbors are meaningful but not trivial
    centers = rng.normal(0, 5, (12, 16))
    rows = []
    for i in range(800):
        v = centers[i % 12] + rng.normal(0, 1.0, 16)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _exact_topk(rows, qids, k):
    ids = np.array([r[0] for r in rows])
    mat = np.stack([np.array(r[1]) for r in rows])
    out = {}
    for q in qids:
        qv = mat[ids == q][0]
        d = ((mat - qv) ** 2).sum(1)
        order = np.lexsort((ids, d))
        out[q] = set(ids[order][:k])
    return out


def test_pq_recall_against_exact(spark, vecs_df):
    books = pq_train(vecs_df, "embedding", m=4, n_codes=64, n_iter=8)
    enc = pq_encode(vecs_df, "embedding", "vec_id", books)
    queries = vecs_df.filter("vec_id < 8")
    exact = _exact_topk(
        [(r.vec_id, r.embedding) for r in vecs_df.collect()], list(range(8)), 10
    )

    def recall(rows):
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, set()).add(r.doc_id)
        assert len(by_q) == 8 and all(len(v) == 10 for v in by_q.values())
        return sum(len(by_q[q] & exact[q]) / 10 for q in by_q) / len(by_q)

    adc = recall(
        pq_topk(enc, queries, books, "embedding", "vec_id", k=10).collect()
    )
    assert adc >= 0.4  # raw 8-byte codes: coarse but useful
    refined = recall(
        pq_topk(
            enc, queries, books, "embedding", "vec_id", k=10,
            refine=vecs_df, refine_factor=6,
        ).collect()
    )
    assert refined >= 0.9  # exact re-rank of the ADC shortlist
    assert refined >= adc


def test_pq_reconstruction_improves_with_codes(spark, vecs_df):
    x = np.stack([np.array(r.embedding) for r in vecs_df.collect()])

    def recon_err(books):
        m, _, sub = books.shape
        err = 0.0
        for j in range(m):
            xs = x[:, j * sub : (j + 1) * sub]
            cm = books[j]
            d2 = ((xs * xs).sum(1)[:, None] - 2 * (xs @ cm.T)
                  + (cm * cm).sum(1)[None, :])
            err += d2.min(1).sum()
        return err

    small = pq_train(vecs_df, "embedding", m=4, n_codes=8, n_iter=6)
    big = pq_train(vecs_df, "embedding", m=4, n_codes=128, n_iter=6)
    assert recon_err(big) < recon_err(small) * 0.5


def test_pq_deterministic(spark, vecs_df):
    b1 = pq_train(vecs_df, "embedding", m=4, n_codes=16, n_iter=4)
    b2 = pq_train(vecs_df, "embedding", m=4, n_codes=16, n_iter=4)
    assert np.array_equal(b1, b2)
    e1 = {r.doc_id: tuple(r.codes)
          for r in pq_encode(vecs_df, "embedding", "vec_id", b1).collect()}
    e2 = {r.doc_id: tuple(r.codes)
          for r in pq_encode(vecs_df, "embedding", "vec_id", b2).collect()}
    assert e1 == e2
    assert all(len(c) == 4 and all(0 <= x < 16 for x in c) for c in e1.values())


def test_ivfpq_recall_and_refine(spark, vecs_df):
    """IVF-PQ (residual-encoded cells + per-(query,cell) ADC LUTs) must
    reach solid recall on clustered data, improve with exact re-rank, and
    never return a self-match or a (query, doc) duplicate."""
    from krnel_graph_spark.functions.similarity import ivfpq_topk

    queries = vecs_df.filter("vec_id < 8")
    rows = [(r["vec_id"], r["embedding"]) for r in vecs_df.collect()]
    want = _exact_topk(rows, range(8), 10)
    # exclude the query itself from the exact truth, as ivfpq does
    want = {q: s - {q} for q, s in want.items()}

    got_pdf = ivfpq_topk(
        vecs_df, queries, "embedding", "vec_id",
        k=10, n_cells=12, nprobe=4, m=4, n_codes=64,
    ).toPandas()
    assert not got_pdf.duplicated(["query_id", "doc_id"]).any()
    assert not (got_pdf.query_id == got_pdf.doc_id).any()
    assert (got_pdf.groupby("query_id").size() == 10).all()

    def recall(pdf):
        r = 0.0
        for q in range(8):
            approx = set(pdf[pdf.query_id == q].doc_id)
            r += len(approx & want[q]) / len(want[q] & set(range(800)))
        return r / 8

    base = recall(got_pdf)
    assert base >= 0.5, base

    refined = ivfpq_topk(
        vecs_df, queries, "embedding", "vec_id",
        k=10, n_cells=12, nprobe=4, m=4, n_codes=64,
        refine=vecs_df, refine_factor=4,
    ).toPandas()
    assert recall(refined) >= base - 1e-9
    assert recall(refined) >= 0.7, recall(refined)


def test_ivfpq_deterministic(spark, vecs_df):
    from krnel_graph_spark.functions.similarity import ivfpq_topk

    queries = vecs_df.filter("vec_id < 4")
    a = ivfpq_topk(
        vecs_df, queries, "embedding", "vec_id", k=5, n_cells=8, m=4, n_codes=32
    ).toPandas()
    b = ivfpq_topk(
        vecs_df, queries, "embedding", "vec_id", k=5, n_cells=8, m=4, n_codes=32
    ).toPandas()
    assert a.equals(b)


def test_ann_index_parquet_roundtrip_identical(spark, vecs_df, tmp_path):
    """The retrieval-pipeline contract (the minhash_index twin): train +
    encode once, persist BOTH frames, and ann_search over the READ-BACK
    index must equal the inline ivfpq_topk row-for-row — codebooks are
    never retrained, the float corpus never re-encoded."""
    from krnel_graph_spark.functions.similarity import (
        ann_index,
        ann_search,
        ivfpq_topk,
    )

    queries = vecs_df.filter("vec_id < 4")
    inline = ivfpq_topk(
        vecs_df, queries, "embedding", "vec_id",
        k=5, n_cells=8, nprobe=3, m=4, n_codes=32, refine_iters=1,
        refine=vecs_df, refine_factor=4,
    ).orderBy("query_id", "rank").collect()

    model, encoded = ann_index(
        vecs_df, "embedding", "vec_id",
        n_cells=8, m=4, n_codes=32, refine_iters=1,
    )
    mp, ep = str(tmp_path / "model"), str(tmp_path / "encoded")
    model.write.parquet(mp)
    encoded.write.parquet(ep)
    reused = ann_search(
        spark.read.parquet(mp), spark.read.parquet(ep), queries,
        "embedding", "vec_id", k=5, nprobe=3,
        refine=vecs_df, refine_factor=4,
    ).orderBy("query_id", "rank").collect()
    assert [tuple(r) for r in reused] == [tuple(r) for r in inline]
    assert len(inline) == 20


def test_ann_search_rejects_inconsistent_model(spark, vecs_df):
    """A truncated / mixed-snapshot model frame must raise, not silently
    search a wrong layout."""
    import pytest

    from krnel_graph_spark.functions.similarity import ann_index, ann_search

    queries = vecs_df.filter("vec_id < 2")
    model, encoded = ann_index(
        vecs_df, "embedding", "vec_id", n_cells=8, m=4, n_codes=32,
        refine_iters=0,
    )
    truncated = model.filter("kind != 'centroid' OR i < 4")
    with pytest.raises(ValueError, match="centroid set inconsistent"):
        ann_search(truncated, encoded, queries, "embedding", "vec_id", k=3)
    no_codes = model.filter("kind = 'centroid'")
    with pytest.raises(ValueError, match="codebook set inconsistent"):
        ann_search(no_codes, encoded, queries, "embedding", "vec_id", k=3)
    with pytest.raises(ValueError, match="empty model"):
        ann_search(
            model.filter("1=0"), encoded, queries, "embedding", "vec_id",
        )


def test_ann_index_append_equals_monolithic_encode(spark, vecs_df):
    """Day-N ingest contract: encode only the NEW vectors with the
    existing model, union with the old encoded frame, and searches
    equal the monolithic encode row-for-row — codebooks never
    retrained, old vectors never re-encoded."""
    from krnel_graph_spark.functions.similarity import (
        ann_index,
        ann_index_append,
        ann_search,
    )

    old = vecs_df.filter("vec_id % 2 = 0")
    new = vecs_df.filter("vec_id % 2 = 1")
    model, encoded_old_full = ann_index(
        vecs_df, "embedding", "vec_id", n_cells=8, m=4, n_codes=32,
        refine_iters=1,
    )
    # model trained on the FULL corpus sample in both paths; encode the
    # halves separately through the append API
    enc_a = ann_index_append(model, old, "embedding", "vec_id")
    enc_b = ann_index_append(model, new, "embedding", "vec_id")
    merged = enc_a.unionByName(enc_b)

    queries = vecs_df.filter("vec_id < 4")
    got = ann_search(
        model, merged, queries, "embedding", "vec_id", k=5, nprobe=3
    ).orderBy("query_id", "rank").collect()
    want = ann_search(
        model, encoded_old_full, queries, "embedding", "vec_id", k=5, nprobe=3
    ).orderBy("query_id", "rank").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(want) == 20


def test_l2_topk_matches_numpy_brute_force(spark, vecs_df):
    from krnel_graph_spark.functions.similarity import l2_topk

    rows = [(r.vec_id, r.embedding) for r in vecs_df.collect()]
    ids = np.array([r[0] for r in rows])
    mat = np.stack([np.array(r[1], dtype=np.float64) for r in rows])
    exact = {}
    for q in range(5):
        qv = mat[ids == q][0]
        # replicate l2_topk's round-6 + (distance, id) tie order and
        # self-exclusion
        d6 = np.round(np.sqrt(((mat - qv) ** 2).sum(1)), 6)
        keep = ids != q
        order = np.lexsort((ids[keep], d6[keep]))
        exact[q] = set(ids[keep][order][:10])
    out = l2_topk(
        vecs_df, vecs_df.filter("vec_id < 5"), "embedding", "vec_id", k=10
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, set()).add(r.doc_id)
    assert len(by_q) == 5
    for q, got in by_q.items():
        assert got == exact[q]


def test_recall_probe_mechanics(spark, vecs_df):
    """The monitor's deterministic contracts: probing ALL cells with an
    exact re-rank recovers ground truth exactly (recall 1.0 — candidate
    set is the whole corpus, re-rank is the same round-6 L2 as the
    ground-truth side), a partial probe stays in [0, 1], below_band is
    consistent with the band on both, and the row shape is stable.
    (Whether a particular drift lowers recall is data-dependent — the
    sf0.01 gate query demonstrates that narrative; this test pins only
    what is guaranteed.)"""
    from pyspark.sql import functions as F

    from krnel_graph_spark.functions.similarity import (
        ann_index,
        ann_index_append,
        recall_probe,
    )

    day0 = vecs_df.filter("vec_id % 2 = 0").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    model, enc0 = ann_index(
        day0, "embedding", "vec_id", n_cells=8, m=4, n_codes=32,
        refine_iters=0,
    )
    batch = vecs_df.filter("vec_id % 2 = 1").select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x * F.lit(3.0) + F.lit(2.0),
        ).alias("embedding"),
    )
    enc1 = ann_index_append(model, batch, "embedding", "vec_id")
    encoded = enc0.unionByName(enc1)
    corpus = day0.unionByName(batch)
    probes = batch.filter("vec_id < 40")

    def run(nprobe, refine_factor, band):
        row = recall_probe(
            model, encoded, probes, corpus, "embedding", "vec_id",
            k=10, nprobe=nprobe, refine_factor=refine_factor, band=band,
        ).collect()[0]
        assert row.k == 10 and row.n_queries == 20
        assert 0.0 <= row.min_recall <= row.mean_recall <= 1.0
        assert row.below_band == (row.mean_recall < band)
        return row

    # all-cells probe + shortlist covering the whole corpus == exact
    full = run(nprobe=8, refine_factor=100, band=0.99)
    assert full.mean_recall == 1.0 and full.min_recall == 1.0
    assert not full.below_band
    run(nprobe=2, refine_factor=4, band=0.99)


def test_recall_probe_rejects_empty_probe_set(spark, vecs_df):
    from pyspark.sql import functions as F

    from krnel_graph_spark.functions.similarity import ann_index, recall_probe

    day0 = vecs_df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    model, enc = ann_index(
        day0, "embedding", "vec_id", n_cells=4, m=4, n_codes=16,
        refine_iters=0,
    )
    with pytest.raises(ValueError, match="empty probe set"):
        recall_probe(
            model, enc, day0.filter("vec_id < 0"), day0,
            "embedding", "vec_id",
        )


def test_ann_index_retrain_output_identity(spark, vecs_df):
    """retrain IS a fresh ann_index build at the old model's recorded
    config — frame-for-frame identical (no separate retrain arithmetic
    to drift out of sync), and the config is read from the artifact, not
    re-specified by the caller."""
    from pyspark.sql import functions as F

    from krnel_graph_spark.functions.similarity import (
        ann_index,
        ann_index_retrain,
    )

    day0 = vecs_df.filter("vec_id % 2 = 0").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = vecs_df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    old_model, _ = ann_index(
        day0, "embedding", "vec_id", n_cells=8, m=4, n_codes=32,
        seed=11, refine_iters=1, sample_rows=512,
    )
    new_model, new_enc = ann_index_retrain(
        old_model, corpus, "embedding", "vec_id"
    )
    want_model, want_enc = ann_index(
        corpus, "embedding", "vec_id", n_cells=8, m=4, n_codes=32,
        seed=11, refine_iters=1, sample_rows=512,
    )
    assert new_model.exceptAll(want_model).count() == 0
    assert want_model.exceptAll(new_model).count() == 0
    assert new_enc.exceptAll(want_enc).count() == 0
    assert want_enc.exceptAll(new_enc).count() == 0
    # the recorded config survived the retrain (geometry can't silently
    # change under the serving layer)
    got = new_model.select(
        "n_cells", "m", "n_codes", "seed", "refine_iters", "sample_rows"
    ).limit(1).collect()[0]
    assert tuple(got) == (8, 4, 32, 11, 1, 512)


def test_ann_index_retrain_seed_override_and_legacy_model(spark, vecs_df):
    from pyspark.sql import functions as F

    from krnel_graph_spark.functions.similarity import (
        ann_index,
        ann_index_retrain,
    )

    corpus = vecs_df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    old_model, _ = ann_index(
        corpus, "embedding", "vec_id", n_cells=4, m=4, n_codes=16,
        seed=7, refine_iters=0,
    )
    # seed override: a DIFFERENT sample/codebook fit
    m_a, _ = ann_index_retrain(old_model, corpus, "embedding", "vec_id")
    m_b, _ = ann_index_retrain(
        old_model, corpus, "embedding", "vec_id", seed=99
    )
    assert m_a.filter("kind = 'centroid'").exceptAll(
        m_b.filter("kind = 'centroid'")
    ).count() > 0
    assert m_b.select("seed").limit(1).collect()[0][0] == 99
    # a pre-r13 artifact without the sample_rows column still retrains
    # (falls back to the build default)
    legacy = old_model.drop("sample_rows")
    m_c, _ = ann_index_retrain(legacy, corpus, "embedding", "vec_id")
    assert m_c.select("sample_rows").limit(1).collect()[0][0] == 4096

    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty model"):
        ann_index_retrain(
            old_model.filter("kind = 'nope'"), corpus, "embedding", "vec_id"
        )


def test_recall_probe_precomputed_exact_identical(spark, vecs_df):
    """recall_probe(exact=) — the multi-probe ground-truth share the
    retrain gate uses — must be output-identical to the default path."""
    from pyspark.sql import functions as F

    from krnel_graph_spark.functions.similarity import (
        ann_index,
        l2_topk,
        recall_probe,
    )

    corpus = vecs_df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    model, enc = ann_index(
        corpus, "embedding", "vec_id", n_cells=8, m=4, n_codes=32,
        refine_iters=0,
    )
    probes = corpus.filter("vec_id < 12")
    default = recall_probe(
        model, enc, probes, corpus, "embedding", "vec_id", k=5, nprobe=4
    ).collect()[0]
    shared = recall_probe(
        model, enc, probes, corpus, "embedding", "vec_id", k=5, nprobe=4,
        exact=l2_topk(corpus, probes, "embedding", "vec_id", k=5),
    ).collect()[0]
    assert default.asDict() == shared.asDict()
