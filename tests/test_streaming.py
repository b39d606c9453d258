"""Batch/streaming equivalence for the event-stream operators.

Structured Streaming's core contract: the same DataFrame transformation
produces the same result incrementally (readStream) as in batch (read).
These tests drain the events parquet through a memory sink with
``trigger(availableNow=True)`` and hash-compare against the batch plan.
"""

from __future__ import annotations

import pytest

from krnel_graph_spark.streaming.events import (
    run_stream_to_memory,
    sessionize,
    stream_events_from_parquet,
    windowed_event_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def spark():
    from krnel_graph_spark.runners.spark_runner import get_spark

    return get_spark("test-streaming")


def test_windowed_counts_stream_equals_batch(spark):
    batch = windowed_event_counts(spark.read.parquet(EVENTS), "1 hour")
    stream = windowed_event_counts(
        stream_events_from_parquet(spark, EVENTS), "1 hour"
    )
    query = run_stream_to_memory(stream, "win_counts", output_mode="complete")
    try:
        got = spark.table("win_counts")
        cols = ["window_start", "event_type", "n_events", "sum_value"]
        assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
        assert len(_sorted_rows(got, cols)) > 0
    finally:
        query.stop()


def test_sessionize_stream_equals_batch(spark):
    batch = sessionize(spark.read.parquet(EVENTS), gap="30 minutes")
    stream = sessionize(stream_events_from_parquet(spark, EVENTS), gap="30 minutes")
    query = run_stream_to_memory(stream, "sessions", output_mode="complete")
    try:
        got = spark.table("sessions")
        cols = ["session_start", "user_id", "n_events", "sum_value"]
        assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
        assert len(_sorted_rows(got, cols)) > 0
    finally:
        query.stop()


def test_stream_is_incremental(spark):
    """The streaming plan really is a streaming plan (not silently batch)."""
    stream = stream_events_from_parquet(spark, EVENTS)
    assert stream.isStreaming


def test_dedup_stream_equals_batch_keys(spark):
    from krnel_graph_spark.streaming.events import dedup_events

    batch = dedup_events(spark.read.parquet(EVENTS), keys=("user_id", "event_type"))
    stream = dedup_events(
        stream_events_from_parquet(spark, EVENTS), keys=("user_id", "event_type")
    )
    query = run_stream_to_memory(stream, "dedup_ev", output_mode="append")
    try:
        got = spark.table("dedup_ev")
        # The surviving row per key is engine-chosen; the key SET is the contract.
        keys = ["user_id", "event_type"]
        assert _sorted_rows(got, keys) == _sorted_rows(batch, keys)
        assert got.count() == got.select(keys).distinct().count()
        assert got.count() > 0
    finally:
        query.stop()


def test_running_totals_stream_equals_batch(spark):
    from krnel_graph_spark.streaming.events import running_user_totals

    batch = running_user_totals(spark.read.parquet(EVENTS))
    stream = running_user_totals(stream_events_from_parquet(spark, EVENTS))
    query = run_stream_to_memory(stream, "run_totals", output_mode="update")
    try:
        got = spark.table("run_totals")
        # update mode may emit a row per micro-batch; the LAST per user is the total
        import pandas as pd

        gp = got.toPandas().groupby("user_id").last()
        bp = batch.toPandas().set_index("user_id")
        assert sorted(gp.index) == sorted(bp.index)
        for uid in bp.index:
            assert int(gp.loc[uid, "n_events"]) == int(bp.loc[uid, "n_events"])
            assert abs(gp.loc[uid, "sum_value"] - bp.loc[uid, "sum_value"]) < 1e-3
    finally:
        query.stop()


def test_rollup_levels_consistent(spark):
    from pyspark.sql import functions as F

    from krnel_graph_spark.streaming.events import rollup_event_counts

    out = rollup_event_counts(
        spark.read.parquet(EVENTS), durations=("1 minute", "1 hour", "1 day")
    ).cache()
    # Every level must total to the same global counts.
    totals = (
        out.groupBy("resolution").agg(F.sum("n_events").alias("n")).collect()
    )
    ns = {r["resolution"]: r["n"] for r in totals}
    assert len(set(ns.values())) == 1 and all(n > 0 for n in ns.values())
    # The hour level must equal a direct hour aggregation of the raw data.
    from krnel_graph_spark.streaming.events import windowed_event_counts

    direct = windowed_event_counts(spark.read.parquet(EVENTS), "1 hour")
    hour = out.filter(F.col("resolution") == "1 hour")
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _sorted_rows(hour, cols) == _sorted_rows(direct, cols)


def test_stream_near_dedup_bounded_state(spark):
    from krnel_graph_spark.streaming.events import dedup_stream_near

    # documents table has no ts; synthesize a doc stream with duplicates
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import pyspark.sql.functions as F

    with_ts = docs.select(
        "doc_id",
        "text",
        # +1: an epoch-0 event time equals the initial watermark and is
        # dropped as late by dropDuplicatesWithinWatermark
        F.timestamp_micros(((F.col("doc_id") + 1) * 1_000_000).cast("long")).alias("ts"),
    )
    tmp = "/tmp/stream_near_dedup_src.parquet"
    with_ts.write.mode("overwrite").parquet(tmp)

    from krnel_graph_spark.streaming.events import (
        run_stream_to_memory,
        stream_events_from_parquet,
    )

    batch = dedup_stream_near(spark.read.parquet(tmp), "text")
    stream = dedup_stream_near(stream_events_from_parquet(spark, tmp), "text")
    query = run_stream_to_memory(stream, "near_dedup", output_mode="append")
    try:
        got = spark.table("near_dedup")
        # engine picks the surviving row; the signature-distinct COUNT is the contract
        assert got.count() == batch.count()
        assert got.count() > 0
    finally:
        query.stop()


def test_stream_near_dedup_short_docs_not_collapsed(spark):
    import pyspark.sql.functions as F

    from krnel_graph_spark.streaming.events import dedup_stream_near

    rows = [(1, "hi"), (2, "ok"), (3, "ok"), (4, "a much longer document here")]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text",
        F.timestamp_micros(((F.col("doc_id") + 1) * 1_000_000).cast("long")).alias("ts"),
    )
    kept = dedup_stream_near(df, "text")
    # 'hi' and 'ok' are unshingleable (sentinel signature) but distinct text:
    # both survive; the duplicate 'ok' collapses by exact text.
    assert sorted(r["text"] for r in kept.collect()) == [
        "a much longer document here", "hi", "ok",
    ]


def test_rollup_rejects_non_nesting_and_streams(spark):
    import pytest as _pytest

    from krnel_graph_spark.streaming.events import (
        rollup_event_counts,
        stream_events_from_parquet,
    )

    ev = spark.read.parquet(EVENTS)
    with _pytest.raises(ValueError, match="must nest"):
        rollup_event_counts(ev, durations=("90 seconds", "2 minutes"))
    with _pytest.raises(ValueError, match="batch-only"):
        rollup_event_counts(
            stream_events_from_parquet(spark, EVENTS), durations=("1 minute", "1 hour")
        )


def test_with_event_time_normalizes_every_dtype(spark):
    """Dtype-driven ingestion: every physical shape lake data arrives in
    lands on TIMESTAMP with the same instant (session tz pinned UTC)."""
    from pyspark.sql import functions as F

    from krnel_graph_spark.streaming.events import with_event_time

    epoch_us = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z

    base = spark.range(1).select(
        F.timestamp_micros(F.lit(epoch_us)).alias("canon")
    )
    shapes = {
        "timestamp": base.select(F.col("canon").alias("ts")),
        "timestamp_ntz": base.select(F.col("canon").cast("timestamp_ntz").alias("ts")),
        "bigint-nanos": base.select(
            (F.unix_micros("canon") * 1000).alias("ts")
        ),
        "string": base.select(
            F.date_format("canon", "yyyy-MM-dd HH:mm:ss").alias("ts")
        ),
    }
    for shape, df in shapes.items():
        out = with_event_time(df)
        assert dict(out.dtypes)["ts"] == "timestamp", shape
        got = out.select(F.unix_micros("ts").alias("us")).first()["us"]
        assert got == epoch_us, f"{shape}: {got} != {epoch_us}"

    # date → midnight of that day
    d = with_event_time(base.select(F.col("canon").cast("date").alias("ts")))
    assert dict(d.dtypes)["ts"] == "timestamp"
    assert (
        d.select(F.date_format("ts", "HH:mm:ss").alias("hms")).first()["hms"]
        == "00:00:00"
    )

    # unparseable strings null out (lenient ingest), not crash
    bad = with_event_time(
        spark.createDataFrame([("not a time",)], "ts string")
    )
    assert bad.first()["ts"] is None


def test_interval_join_stream_equals_batch(spark):
    """Stream-stream interval join (watermarks + explicit time bound —
    the state-evictable formulation) drains to the same rows as the batch
    twin, and the batch twin itself honors the inclusive time bound."""
    from pyspark.sql import functions as F

    from krnel_graph_spark.streaming.events import interval_join

    def sides(reader):
        ev = reader
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "value"
        )
        return purchases, clicks

    batch = interval_join(
        *sides(spark.read.parquet(EVENTS)), on="user_id", lookback="30 minutes"
    )
    stream = interval_join(
        *sides(stream_events_from_parquet(spark, EVENTS)),
        on="user_id",
        lookback="30 minutes",
    )
    query = run_stream_to_memory(stream, "ijoin", output_mode="append")
    try:
        cols = ["event_id", "user_id", "ts", "ts_r", "value_r"]
        got = _sorted_rows(spark.table("ijoin"), cols)
        want = _sorted_rows(batch, cols)
        assert got == want
        assert len(got) > 0
        for _, _, ts, ts_r, _v in got:
            assert ts_r <= ts
            assert (ts - ts_r).total_seconds() <= 1800
    finally:
        query.stop()


def test_stream_to_parquet_exactly_once(spark, tmp_path):
    """Checkpointed file sink: the drained output equals the batch plan,
    and re-running the SAME query against the SAME checkpoint writes
    nothing new (the commit log already covers the input)."""
    from pyspark.sql import functions as F

    from krnel_graph_spark.streaming.events import run_stream_to_parquet

    out = str(tmp_path / "out.parquet")
    ckpt = str(tmp_path / "ckpt")

    def build():
        return (
            stream_events_from_parquet(spark, EVENTS)
            .filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "value")
        )

    run_stream_to_parquet(build(), out, ckpt)
    batch = (
        spark.read.parquet(EVENTS)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )
    cols = ["event_id", "user_id", "value"]
    first = _sorted_rows(spark.read.parquet(out), cols)
    assert first == _sorted_rows(batch, cols)
    assert len(first) > 0

    # Same checkpoint, same input: nothing to process, no duplicates.
    run_stream_to_parquet(build(), out, ckpt)
    assert _sorted_rows(spark.read.parquet(out), cols) == first


def test_interval_join_state_eviction(spark, tmp_path):
    """Pins the docstring's scale claim: watermark + explicit time bound let
    Spark EVICT buffered stream-stream join state. Four micro-batches, each
    6 hours later than the last, with watermark 1h + lookback 10m: rows from
    early batches can never match future input, so the final micro-batch's
    state must hold far fewer rows than the total fed. Without the time
    bound, state would grow monotonically to every row ever seen."""
    import os
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    from krnel_graph_spark.streaming.events import interval_join

    src = tmp_path / "events_in"
    src.mkdir()
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    users_per_batch = 300
    n_batches = 4
    for b in range(n_batches):
        tb = t0 + pd.Timedelta(hours=6 * b)
        rows = []
        for u in range(users_per_batch):
            uid = b * users_per_batch + u
            rows.append(("click", None, uid, tb, 1.0))
            rows.append(
                ("purchase", f"p{uid}", uid, tb + pd.Timedelta(minutes=5), None)
            )
        pdf = pd.DataFrame(
            rows, columns=["event_type", "event_id", "user_id", "ts", "value"]
        )
        path = src / f"batch_{b}.parquet"
        pdf.to_parquet(path)
        # FileStreamSource with maxFilesPerTrigger orders by mod time; make
        # the intended batch order unambiguous.
        mtime = time.time() - (n_batches - b) * 100
        os.utime(path, (mtime, mtime))

    schema = spark.read.parquet(str(src)).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    joined = interval_join(
        purchases, clicks, on="user_id", lookback="10 minutes", watermark="1 hour"
    )
    query = (
        joined.writeStream.format("memory")
        .queryName("ijoin_evict")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    try:
        progresses = [p for p in query.recentProgress if p["stateOperators"]]
        assert len(progresses) >= n_batches, (
            f"expected one micro-batch per file, saw {len(progresses)}"
        )
        state_rows = [
            p["stateOperators"][0]["numRowsTotal"] for p in progresses
        ]
        removed = sum(
            p["stateOperators"][0]["numRowsRemoved"] for p in progresses
        )
        total_fed = 2 * users_per_batch * n_batches  # both join sides
        # Eviction happened at all...
        assert removed > 0, f"no state rows ever evicted: {state_rows}"
        # ...and kept the high-water mark bounded: with eviction the store
        # holds at most ~2 batches of live rows (current + not-yet-past
        # watermark), far under the unevicted total.
        assert max(state_rows) < total_fed, state_rows
        assert state_rows[-1] <= 2 * 2 * users_per_batch, (
            f"final state {state_rows[-1]} rows — eviction not bounding state: "
            f"{state_rows}"
        )
        # Correctness alongside eviction: every within-batch pair joined.
        got = spark.table("ijoin_evict").count()
        assert got == users_per_batch * n_batches
    finally:
        query.stop()


def test_hopping_counts_stream_equals_batch(spark):
    from krnel_graph_spark.streaming.events import hopping_event_counts

    batch = hopping_event_counts(
        spark.read.parquet(EVENTS), "1 hour", "30 minutes"
    )
    stream = hopping_event_counts(
        stream_events_from_parquet(spark, EVENTS), "1 hour", "30 minutes"
    )
    query = run_stream_to_memory(stream, "hop_counts", output_mode="complete")
    try:
        got = spark.table("hop_counts")
        cols = ["window_start", "event_type", "n_events", "sum_value"]
        assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
        assert len(_sorted_rows(got, cols)) > 0
    finally:
        query.stop()


def test_hopping_counts_overlap_factor(spark):
    """Every event lands in exactly size/slide windows: total n_events
    across hopping windows = 2x the tumbling total at 1h/30min."""
    from krnel_graph_spark.streaming.events import (
        hopping_event_counts,
        windowed_event_counts,
    )
    from pyspark.sql import functions as F

    ev = spark.read.parquet(EVENTS)
    hop = hopping_event_counts(ev, "1 hour", "30 minutes")
    tum = windowed_event_counts(ev, "1 hour")
    n_hop = hop.agg(F.sum("n_events")).collect()[0][0]
    n_tum = tum.agg(F.sum("n_events")).collect()[0][0]
    assert n_hop == 2 * n_tum


def test_stream_upsert_sink(spark, tmp_path):
    """foreachBatch SCD-1 sink: merged table equals batch semantics, and a
    re-run from the same checkpoint (nothing new to drain) is a no-op —
    the idempotence that makes at-least-once delivery exactly-once state."""
    from krnel_graph_spark.streaming.events import run_stream_upsert

    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    ).write.parquet(src)

    stream = spark.readStream.schema("id long, v string").parquet(src)
    run_stream_upsert(stream, target, "id", ckpt)
    got = {r["id"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}

    before = sorted(spark.read.parquet(target).collect())
    run_stream_upsert(stream, target, "id", ckpt)  # same checkpoint: no-op
    after = sorted(spark.read.parquet(target).collect())
    assert before == after

    # a second source file merges incrementally: replace + insert
    spark.createDataFrame([(2, "B"), (9, "z")], "id long, v string").write.mode(
        "append"
    ).parquet(src)
    run_stream_upsert(stream, target, "id", ckpt)
    got = {r["id"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got[2] == "B" and got[9] == "z" and got[1] == "a"


def test_stream_upsert_rejects_duplicate_keys(spark, tmp_path):
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from krnel_graph_spark.streaming.events import run_stream_upsert

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a"), (1, "a2")], "id long, v string"
    ).write.parquet(src)
    stream = spark.readStream.schema("id long, v string").parquet(src)
    with _pytest.raises(StreamingQueryException, match="multiple rows"):
        run_stream_upsert(
            stream, str(tmp_path / "t"), "id", str(tmp_path / "c")
        )


def test_funnel_stream_equals_batch_multibatch(spark, tmp_path):
    """Streaming funnel depth must equal the batch greedy fold when each
    user's events arrive in event-time order across micro-batches; state
    is 3 scalars per user regardless of event count."""
    import os
    import time

    import pandas as pd

    from krnel_graph_spark.streaming.events import funnel_user_stages

    src = tmp_path / "funnel_src"
    src.mkdir()
    steps = ["signup", "view", "purchase"]
    t0 = pd.Timestamp("2024-05-01 00:00:00")
    # 3 time-ordered files: user u's step-k event lands in file k when
    # u's depth >= k+1; noise rows and out-of-funnel types sprinkled in.
    depth = {u: u % 4 for u in range(12)}  # 0..3
    for b in range(3):
        rows = []
        for u, d in depth.items():
            if d >= b + 1:
                rows.append((u, t0 + pd.Timedelta(hours=b, minutes=u), steps[b]))
            rows.append((u, t0 + pd.Timedelta(hours=b, minutes=30 + u), "noise"))
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
        path = src / f"b{b}.parquet"
        pdf.to_parquet(path)
        mtime = time.time() - (3 - b) * 100
        os.utime(path, (mtime, mtime))

    schema = spark.read.parquet(str(src)).schema
    ev_stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    stream = funnel_user_stages(ev_stream, steps, watermark="10 hours")
    query = run_stream_to_memory(stream, "funnel_stream", output_mode="update")
    try:
        got = (
            spark.table("funnel_stream")
            .toPandas()
            .groupby("user")
            .last()["stage"]
            .to_dict()
        )
    finally:
        query.stop()

    batch = funnel_user_stages(spark.read.parquet(str(src)), steps)
    want = {r["user"]: r["stage"] for r in batch.collect()}
    assert got == want
    # the planted depths; depth-0 users have no funnel-type event at all,
    # so they produce no row in either mode
    assert want == {u: d for u, d in depth.items() if d > 0}


def test_funnel_stream_string_user_ids(spark, tmp_path):
    """The streaming funnel derives its output user dtype from the input
    schema (r5 advice): string user ids must work end-to-end, not just
    bigints."""
    import os
    import time

    import pandas as pd

    from krnel_graph_spark.streaming.events import funnel_user_stages

    src = tmp_path / "funnel_str_src"
    src.mkdir()
    steps = ["signup", "view"]
    t0 = pd.Timestamp("2024-05-01 00:00:00")
    rows = [
        ("ann", t0, "signup"),
        ("ann", t0 + pd.Timedelta(minutes=5), "view"),
        ("bo'b", t0 + pd.Timedelta(minutes=1), "signup"),  # quote in the id
        ("cid", t0 + pd.Timedelta(minutes=2), "view"),  # view before signup
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    path = src / "b0.parquet"
    pdf.to_parquet(path)
    os.utime(path, (time.time(), time.time()))

    schema = spark.read.parquet(str(src)).schema
    ev_stream = spark.readStream.schema(schema).parquet(str(src))
    stream = funnel_user_stages(ev_stream, steps, watermark="10 hours")
    query = run_stream_to_memory(stream, "funnel_str_stream", output_mode="update")
    try:
        got = (
            spark.table("funnel_str_stream")
            .toPandas()
            .groupby("user")
            .last()["stage"]
            .to_dict()
        )
    finally:
        query.stop()
    assert got == {"ann": 2, "bo'b": 1, "cid": 0}
