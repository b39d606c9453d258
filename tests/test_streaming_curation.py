"""Streaming-readiness of the curation / sampling surface.

The scrub, sample, and vocabulary operators are pure expressions or
stateless filters (plus standard aggregations), so the SAME code must run
unchanged on a readStream source and agree with the batch plan — the
batch/stream unification that makes a 100-TB backfill and its live
continuation one pipeline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions.curation import pii_scrub
from krnel_graph_spark.functions.sampling import hash_sample
from krnel_graph_spark.functions.text import normalize_text, whitespace_tokens

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def spark():
    from krnel_graph_spark.runners.spark_runner import get_spark

    return get_spark("test-streaming-curation")


def _stream_docs(spark):
    from krnel_graph_spark.streaming.events import stream_events_from_parquet

    return stream_events_from_parquet(spark, DOCS)


def _drain(df, name, mode="append"):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


def test_scrub_and_sample_stream_equals_batch(spark):
    def pipeline(df):
        return hash_sample(df, "doc_id", 0.3, seed=11).select(
            "doc_id", pii_scrub("text").alias("clean")
        )

    batch = sorted(tuple(r) for r in pipeline(spark.read.parquet(DOCS)).collect())
    q = _drain(pipeline(_stream_docs(spark)), "scrub_sample")
    try:
        q.awaitTermination(60)
        got = sorted(
            tuple(r) for r in spark.table("scrub_sample").collect()
        )
        assert got == batch and len(got) > 0
    finally:
        q.stop()


def test_streaming_term_counts_equals_batch(spark):
    """Vocabulary counting as a streaming aggregation (complete mode):
    explode + groupBy runs incrementally with partial state per term."""

    def terms(df):
        toks = F.when(
            normalize_text(F.col("text")) == "", F.array().cast("array<string>")
        ).otherwise(whitespace_tokens(F.col("text")))
        return (
            df.select(F.explode(toks).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )

    batch = sorted(tuple(r) for r in terms(spark.read.parquet(DOCS)).collect())
    q = _drain(terms(_stream_docs(spark)), "stream_terms", mode="complete")
    try:
        q.awaitTermination(60)
        got = sorted(tuple(r) for r in spark.table("stream_terms").collect())
        assert got == batch and len(got) > 0
    finally:
        q.stop()


def test_chunk_documents_stream_equals_batch(spark):
    """chunk_documents is pure expressions (tokenize -> posexplode ->
    slice), so the identical call must run on a readStream source and
    emit exactly the batch chunks."""
    from krnel_graph_spark.functions.text import chunk_documents

    def pipeline(df):
        return chunk_documents(df, "text", "doc_id", chunk_size=16, overlap=4)

    batch = sorted(tuple(r) for r in pipeline(spark.read.parquet(DOCS)).collect())
    q = _drain(pipeline(_stream_docs(spark)), "chunk_stream")
    try:
        q.awaitTermination(60)
        got = sorted(tuple(r) for r in spark.table("chunk_stream").collect())
        assert got == batch and len(got) > 0
    finally:
        q.stop()


def test_dedup_against_stream_new_static_ref(spark):
    """Incremental dedup in its natural habitat: the 'new docs' side is a
    STREAM, the reference corpus is static. Exact mode is a stream-static
    LEFT ANTI join on fingerprints — supported natively, same code path
    as batch."""
    from krnel_graph_spark.functions.dedup import dedup_against

    ref = spark.read.parquet(DOCS).filter("doc_id % 2 = 0")

    def pipeline(new_df):
        return dedup_against(new_df, ref, "text", "doc_id", mode="exact").select(
            "doc_id"
        )

    batch = sorted(
        r.doc_id
        for r in pipeline(
            spark.read.parquet(DOCS).filter("doc_id % 2 = 1")
        ).collect()
    )
    q = _drain(
        pipeline(_stream_docs(spark).filter("doc_id % 2 = 1")), "dedup_stream"
    )
    try:
        q.awaitTermination(60)
        got = sorted(r.doc_id for r in spark.table("dedup_stream").collect())
        assert got == batch and len(got) > 0
    finally:
        q.stop()


def test_canonical_url_and_bloom_stream_equals_batch(spark):
    """canonical_url is a pure expression chain and the bloom probe a
    stateless Arrow UDF over a broadcast — both run unchanged on a
    stream and agree with batch."""
    from krnel_graph_spark.functions.curation import canonical_url
    from krnel_graph_spark.functions.dedup import (
        bloom_might_contain,
        build_bloom,
    )

    batch_docs = spark.read.parquet(DOCS)
    ref = batch_docs.filter(F.col("doc_id") % 3 == 0).select(
        F.md5("text").alias("fp")
    )
    bloom = build_bloom(ref, "fp", bits_per_key=10)

    def pipeline(df):
        return df.select(
            "doc_id",
            canonical_url(
                F.concat(F.lit("HTTPS://WWW."), F.col("source"), F.lit(".x.com/p/"))
            ).alias("curl"),
            bloom_might_contain(bloom, F.md5("text")).alias("maybe_dup"),
        )

    batch = {tuple(r) for r in pipeline(batch_docs).collect()}
    q = _drain(pipeline(_stream_docs(spark)), "curl_stream")
    q.awaitTermination(60)
    got = {tuple(r) for r in spark.table("curl_stream").collect()}
    assert got == batch
    assert any(r[2] for r in got)  # the ref third really flags


def test_quarantine_stream_equals_batch(spark):
    """The data-quality gate is scan-side predicates only, so the SAME
    rule dict must run unchanged on a readStream source: the live
    continuation of a validated backfill is one pipeline."""
    from krnel_graph_spark.functions.expectations import quarantine

    rules = {
        "has_text": "length(text) > 0",
        "id_in_range": "doc_id < 400",
        "en_only": "lang = 'en'",
    }
    batch_clean, batch_bad = quarantine(spark.read.parquet(DOCS), rules)
    want_clean = {r["doc_id"] for r in batch_clean.collect()}
    want_bad = {
        (r["doc_id"], ",".join(sorted(r["__failed_rules"])))
        for r in batch_bad.collect()
    }

    s_clean, s_bad = quarantine(_stream_docs(spark), rules)
    q1 = _drain(s_clean.select("doc_id"), "q_clean")
    q2 = _drain(
        s_bad.select(
            "doc_id", F.array_join(F.array_sort("__failed_rules"), ",")
            .alias("fr")
        ),
        "q_bad",
    )
    q1.awaitTermination(60)
    q2.awaitTermination(60)
    got_clean = {r["doc_id"] for r in spark.sql("SELECT * FROM q_clean").collect()}
    got_bad = {
        (r["doc_id"], r["fr"])
        for r in spark.sql("SELECT * FROM q_bad").collect()
    }
    assert got_clean == want_clean and len(want_clean) > 0
    assert got_bad == want_bad and len(want_bad) > 0


def test_rule_bundles_stream_equals_batch(spark):
    """gopher_rules / c4_rules are pure projections, so the identical
    code gates a live stream: batch backfill and live continuation are
    one pipeline."""
    from krnel_graph_spark.functions.text import c4_rules, gopher_rules

    def pipeline(df):
        flagged = c4_rules(gopher_rules(df, "text"), "text")
        return flagged.select(
            "doc_id", "gopher_keep", "c4_keep", "n_lines_kept"
        )

    batch = sorted(tuple(r) for r in pipeline(spark.read.parquet(DOCS)).collect())
    q = _drain(pipeline(_stream_docs(spark)), "rule_gate")
    try:
        q.awaitTermination(60)
        got = sorted(tuple(r) for r in spark.table("rule_gate").collect())
        assert got == batch and len(got) > 0
    finally:
        q.stop()


def test_centroid_filter_stream_static(spark):
    """centroid_filter on a stream is a stream-static broadcast join:
    the centroid computes once from the static reference corpus and
    every micro-batch scores against it."""
    from krnel_graph_spark.functions.similarity import centroid_filter
    from krnel_graph_spark.streaming.events import stream_events_from_parquet

    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    static = spark.read.parquet(emb_path)
    ref = static.filter(F.col("label") == 0)

    batch = sorted(
        tuple(r)
        for r in centroid_filter(static, ref, "embedding", "vec_id", 0.2)
        .select("vec_id", "centroid_cosine", "keep")
        .collect()
    )
    stream = stream_events_from_parquet(spark, emb_path)
    q = _drain(
        centroid_filter(stream, ref, "embedding", "vec_id", 0.2).select(
            "vec_id", "centroid_cosine", "keep"
        ),
        "centroid_gate",
    )
    try:
        q.awaitTermination(60)
        got = sorted(tuple(r) for r in spark.table("centroid_gate").collect())
        assert got == batch and len(got) > 0
    finally:
        q.stop()


def test_calibration_bins_stream_equals_batch(spark):
    """The reliability-curve table is a standard grouped aggregation, so
    the SAME calibration_bins call runs on a readStream source in
    complete mode and agrees with batch — live calibration monitoring of
    a quality scorer during ingest."""
    from krnel_graph_spark.functions.metrics import calibration_bins

    def pipeline(df):
        scored = df.select(
            (F.col("n_chars").cast("double") / 4000.0).alias("score"),
            (F.col("lang") == "en").cast("int").alias("label"),
        )
        return calibration_bins(scored, "score", "label", bins=10)

    batch = sorted(
        tuple(r) for r in pipeline(spark.read.parquet(DOCS)).collect()
    )
    q = _drain(pipeline(_stream_docs(spark)), "calib_stream", mode="complete")
    try:
        q.awaitTermination(60)
        got = sorted(tuple(r) for r in spark.table("calib_stream").collect())
        assert got == batch and len(got) > 0
    finally:
        q.stop()


def test_kneser_ney_stream_static_train(spark):
    """Perplexity filtering in its production shape: the LM's count
    tables come from a STATIC train corpus, the scored docs are a
    STREAM. The scoring side is stream-static left joins + a per-doc
    aggregation (complete mode) — the same kneser_ney_logprob call,
    unchanged."""
    from krnel_graph_spark.functions.text import kneser_ney_logprob

    train = spark.read.parquet(DOCS).filter("doc_id % 5 = 0")

    def pipeline(score_df):
        return kneser_ney_logprob(train, score_df, "text", "doc_id")

    batch = sorted(
        tuple(r) for r in pipeline(spark.read.parquet(DOCS)).collect()
    )
    q = _drain(pipeline(_stream_docs(spark)), "kn_stream", mode="complete")
    try:
        q.awaitTermination(120)
        got = sorted(tuple(r) for r in spark.table("kn_stream").collect())
        assert got == batch and len(got) > 0
    finally:
        q.stop()


def test_kneser_ney3_stream_static_train(spark):
    """The trigram LM inherits the bigram's streaming shape verbatim:
    count tables from a STATIC train corpus, scored docs a STREAM —
    stream-static digest left joins + per-doc aggregation (complete
    mode), the same kneser_ney3_logprob call, unchanged (pruning
    included: the pruned lookup table is still a static side)."""
    from krnel_graph_spark.functions.text import kneser_ney3_logprob

    train = spark.read.parquet(DOCS).filter("doc_id % 5 = 0")

    def pipeline(score_df):
        return kneser_ney3_logprob(
            train, score_df, "text", "doc_id", min_count=2
        )

    batch = sorted(
        tuple(r) for r in pipeline(spark.read.parquet(DOCS)).collect()
    )
    q = _drain(pipeline(_stream_docs(spark)), "kn3_stream", mode="complete")
    try:
        q.awaitTermination(120)
        got = sorted(tuple(r) for r in spark.table("kn3_stream").collect())
        assert got == batch and len(got) > 0
    finally:
        q.stop()
