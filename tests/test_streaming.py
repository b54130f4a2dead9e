"""Streaming verification (SURVEY.md §5.2.3): stream-vs-batch
equivalence for windowed aggregations, watermark late-drop behavior,
streaming dedup, and the R19 retry state machine."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table
from tw_etl_spark.streaming.state_machine import (
    CONTINUE,
    DEDUP_SKIP,
    EXHAUSTED_COMPLETE,
    EVENT_SCHEMA,
    RETRY,
    START,
    STOP_EMPTY_POLL,
    RetryState,
    apply_events,
    retry_machine_stream,
)
from tw_etl_spark.streaming.windows import (
    run_stream_to_memory,
    session_agg,
    sliding_agg,
    tumbling_agg,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def replay_dir(spark):
    """events table written as 8 parquet files in shuffled (non-time)
    order — a file-source replay with out-of-order arrival."""
    d = tempfile.mkdtemp(prefix="events_replay_")
    e = read_table(spark, SF_SMOKE, "events")
    # deterministic shuffle: bucket by hash of event_id
    e.withColumn("b", F.abs(F.hash("event_id")) % 8).repartition(8, "b").drop(
        "b"
    ).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _pin_mtimes(d, subdirs, step=60):
    """File-source batch order follows mtime; writes within one clock tick
    tie. Pin each subdir a minute apart."""
    import time

    t0 = time.time() - 300
    for i, sub in enumerate(subdirs):
        for root, _, files in os.walk(os.path.join(d, sub)):
            for fn in files:
                os.utime(os.path.join(root, fn), (t0 + i * step, t0 + i * step))


def _stream(spark, replay_dir):
    batch = read_table(spark, SF_SMOKE, "events")
    return (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 2)  # several micro-batches
        .parquet(replay_dir)
    )


def _canon(df):
    pdf = df.toPandas()
    if "win" in pdf.columns:
        pdf["win_start"] = pdf["win"].map(lambda w: w["start"])
        pdf = pdf.drop(columns=["win"])
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols).reset_index(drop=True)


def AGGS():
    return [
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sv"),
    ]


def test_tumbling_stream_equals_batch(spark, replay_dir):
    batch = read_table(spark, SF_SMOKE, "events")
    stream = _stream(spark, replay_dir)
    got = run_stream_to_memory(
        tumbling_agg(stream, "ts", "1 hour", ["event_type"], AGGS(), watermark="30 days"),
        "tumbling_out",
    )
    want = tumbling_agg(batch, "ts", "1 hour", ["event_type"], AGGS())
    assert _canon(got).equals(_canon(want))


def test_sliding_stream_equals_batch(spark, replay_dir):
    batch = read_table(spark, SF_SMOKE, "events")
    stream = _stream(spark, replay_dir)
    got = run_stream_to_memory(
        sliding_agg(
            stream, "ts", "2 hours", "1 hour", [], AGGS(), watermark="30 days"
        ),
        "sliding_out",
    )
    want = sliding_agg(batch, "ts", "2 hours", "1 hour", [], AGGS())
    assert _canon(got).equals(_canon(want))


def test_session_stream_equals_batch(spark, replay_dir):
    batch = read_table(spark, SF_SMOKE, "events")
    stream = _stream(spark, replay_dir)
    got = run_stream_to_memory(
        session_agg(
            stream, "ts", "30 minutes", ["user_id"], AGGS(), watermark="30 days"
        ),
        "session_out",
    )
    want = session_agg(batch, "ts", "30 minutes", ["user_id"], AGGS())
    assert _canon(got).equals(_canon(want))
    # session count per user must also match the batch lag-based E3 logic
    n_sessions_stream = got.count()
    from tw_etl_spark.queries import all_queries

    e3 = all_queries()["e3_sessionization"].spark(spark, SF_SMOKE)
    assert n_sessions_stream == e3.agg(F.sum("n_sessions")).first()[0]


def test_watermark_drops_late_rows(spark):
    """Rows arriving later than the watermark are dropped from closed
    windows: feed in-order file then a very-late file."""
    d = tempfile.mkdtemp(prefix="late_")
    try:
        e = read_table(spark, SF_SMOKE, "events").orderBy("ts")
        early1 = e.filter(F.col("ts").between("2024-01-02", "2024-01-15"))
        early2 = e.filter(F.col("ts") > F.lit("2024-01-15"))
        late = e.filter(F.col("ts") < F.lit("2024-01-02"))  # arrives last
        early1.coalesce(1).write.parquet(os.path.join(d, "f1"))
        early2.coalesce(1).write.parquet(os.path.join(d, "f2"))
        late.coalesce(1).write.parquet(os.path.join(d, "f3"))
        # the watermark used for late-row filtering lags one batch — the
        # late file must arrive at least two batches after the early max ts
        _pin_mtimes(d, ["f1", "f2", "f3"])
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(os.path.join(d, "*"))
        )
        agg = tumbling_agg(
            stream, "ts", "1 hour", [], [F.count(F.lit(1)).alias("n")],
            watermark="1 minute",
        )
        got = run_stream_to_memory(agg, "late_out", output_mode="append")
        # appended (finalized) windows must not include any late-day rows
        finalized = got.toPandas()
        if not finalized.empty:
            starts = finalized["win"].map(lambda w: w["start"])
            assert (starts >= __import__("pandas").Timestamp("2024-01-02")).all()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_within_watermark(spark, replay_dir):
    batch = read_table(spark, SF_SMOKE, "events")
    dup_dir = tempfile.mkdtemp(prefix="dup_")
    try:
        batch.write.parquet(os.path.join(dup_dir, "a"))
        batch.write.parquet(os.path.join(dup_dir, "b"))  # full duplicate feed
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(dup_dir, "*"))
        )
        deduped = stream.withWatermark("ts", "30 days").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        got = run_stream_to_memory(deduped, "dedup_out", output_mode="append")
        assert got.count() == batch.count()
    finally:
        shutil.rmtree(dup_dir, ignore_errors=True)


def test_stream_static_join(spark, replay_dir):
    """Stream-static join (R7/R18): enrich the event stream with a static
    user dimension; result ≡ batch join."""
    batch = read_table(spark, SF_SMOKE, "events")
    dim = batch.groupBy("user_id").agg(F.min("ts").alias("first_seen"))
    stream = _stream(spark, replay_dir)
    joined = stream.join(dim, "user_id").select("event_id", "user_id", "first_seen")
    got = run_stream_to_memory(joined, "ss_join_out", output_mode="append")
    want = batch.join(dim, "user_id").select("event_id", "user_id", "first_seen")
    assert _canon(got).equals(_canon(want))


def test_stream_stream_join(spark, replay_dir):
    """Stream-stream inner join with watermarks + time bound: purchases ⋈
    clicks of the same user within 1 hour before the purchase."""
    batch = read_table(spark, SF_SMOKE, "events")

    def split(df):
        p = df.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
        )
        c = df.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
        )
        return p, c

    sp, sc_ = split(_stream(spark, replay_dir))
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
    )
    got = run_stream_to_memory(
        sp.withWatermark("p_ts", "30 days").join(
            sc_.withWatermark("c_ts", "30 days"), cond
        ),
        "ss2_out",
        output_mode="append",
    )
    bp, bc = split(batch)
    want = bp.join(bc, cond)
    assert got.count() == want.count()
    assert _canon(got.select("p_id", "c_id")).equals(_canon(want.select("p_id", "c_id")))


def test_rate_source_smoke(spark):
    """Rate source (R21's poll-timer analog): produces monotonically
    increasing rows with timestamps."""
    stream = spark.readStream.format("rate").option("rowsPerSecond", 100).load()
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_out")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    import time

    deadline = time.time() + 15
    n = 0
    while time.time() < deadline:
        n = spark.sql("SELECT count(*) c FROM rate_out").first().c
        if n > 0:
            break
        time.sleep(0.3)
    q.stop()
    assert n > 0
    row = spark.sql("SELECT max(value) mv, count(*) c FROM rate_out").first()
    assert row.mv is not None and row.c == row.mv + 1  # dense 0..mv


def test_foreach_batch_sink(spark, replay_dir):
    """foreachBatch: exactly-once-style custom sink collecting per-batch
    counts (R24's snapshot-export analog)."""
    stream = _stream(spark, replay_dir)
    seen: dict[int, int] = {}

    def sink(df, epoch_id):
        seen[epoch_id] = df.count()

    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sum(seen.values()) == read_table(spark, SF_SMOKE, "events").count()
    assert len(seen) >= 2  # maxFilesPerTrigger=2 over 8 files ⇒ ≥2 batches


# ---------------------------------------------------------------------------
# R19 retry machine — table-driven transitions from the reference behaviors
# ---------------------------------------------------------------------------
def ev(kind, size=0, poll=False, retries=3):
    return {"event": kind, "size": size, "poll_attempt": poll, "retries": retries}


def test_machine_poll_empty_stops_without_retry():
    # manager.py:378-384 — poll attempts don't retry on empty output
    st, actions = apply_events(
        RetryState(), [ev("online", poll=True), ev("download_done", size=0)]
    )
    assert actions == [START, STOP_EMPTY_POLL]
    assert not st.active


def test_machine_push_retries_until_exhaustion():
    # manager.py:311-320, 398-427 — push attempts retry to the cap
    events = [ev("online", retries=3)] + [ev("download_done", size=0)] * 3
    st, actions = apply_events(RetryState(), events)
    assert actions == [START, RETRY, RETRY, EXHAUSTED_COMPLETE]
    assert not st.active


def test_machine_dedupes_concurrent_online():
    # manager.py:287-289 — second online signal while active is skipped
    st, actions = apply_events(RetryState(), [ev("online"), ev("online")])
    assert actions == [START, DEDUP_SKIP]
    assert st.active and st.retry_id == 1


def test_machine_nonempty_continues():
    st, actions = apply_events(
        RetryState(),
        [ev("online", retries=5), ev("download_done", size=100)],
    )
    assert actions == [START, CONTINUE]
    assert st.active and st.retry_id == 2


def test_machine_processing_time_timeout(spark):
    """Watchdog: an active key with no events in the next batches takes
    the empty-download transition via ProcessingTimeTimeout."""
    from tw_etl_spark.streaming.state_machine import TIMEOUT_SEQ

    d = tempfile.mkdtemp(prefix="smt_")
    try:
        # b1 starts s1 (poll attempt); b2/b3 only carry other-key events,
        # so s1's 1 ms deadline has long expired when they process.
        spark.createDataFrame(
            [("s1", "online", 0, True, 2, 1, None)], EVENT_SCHEMA
        ).coalesce(1).write.parquet(os.path.join(d, "b1"))
        spark.createDataFrame(
            [("s2", "online", 0, False, 2, 2, None)], EVENT_SCHEMA
        ).coalesce(1).write.parquet(os.path.join(d, "b2"))
        spark.createDataFrame(
            [("s2", "download_done", 5, False, 2, 3, None)], EVENT_SCHEMA
        ).coalesce(1).write.parquet(os.path.join(d, "b3"))
        _pin_mtimes(d, ["b1", "b2", "b3"])
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(d, "*"))
        )
        # NOT availableNow: a query with ProcessingTimeTimeout schedules
        # state-cleanup batches indefinitely, so availableNow never
        # terminates. Watchdog mode pairs with a continuous trigger;
        # poll the sink for the expected transition, then stop.
        q = (
            retry_machine_stream(stream, timeout_ms=1)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("smt_out")
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            import time

            deadline = time.time() + 120
            s1 = []
            while time.time() < deadline:
                s1 = [
                    (r.seq, r.action)
                    for r in spark.sql("SELECT * FROM smt_out").collect()
                    if r.stream_id == "s1"
                ]
                if (TIMEOUT_SEQ, STOP_EMPTY_POLL) in s1:
                    break
                time.sleep(1)
        finally:
            q.stop()
        # started, then timed out: poll attempt + empty ⇒ stop
        assert (1, START) in s1
        assert (TIMEOUT_SEQ, STOP_EMPTY_POLL) in s1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_machine_event_time_timeout(spark):
    """Event-time watchdog, deterministic: with a single-batch
    availableNow drain, an active key fires exactly once iff
    last_ts + T <= final watermark (max ts - delay) — a relational rule
    any engine can replay, unlike the processing-time variant. Crafted
    gaps: s1 goes silent 105 min before stream end (T=10 min -> one
    fire); s2 answers 0 min before stream end (deadline past the final
    watermark -> no fire); s3 exhausts via the fire (retries=1)."""
    import datetime

    from tw_etl_spark.streaming.state_machine import TIMEOUT_SEQ

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    m = lambda k: t0 + datetime.timedelta(minutes=k)  # noqa: E731
    rows = [
        ("s1", "online", 0, False, 3, 1, m(0)),  # stuck push: fire -> RETRY
        ("s2", "online", 0, False, 3, 2, m(0)),
        ("s2", "download_done", 5, False, 3, 3, m(105)),  # answered at end
        ("s3", "online", 0, False, 1, 4, m(0)),  # retries=1: fire -> EXHAUSTED
        ("s4", "online", 0, True, 3, 5, m(0)),  # stuck poll: fire -> STOP
    ]
    d = tempfile.mkdtemp(prefix="etw_")
    try:
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, "b1")
        )
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(os.path.join(d, "*"))
        out = retry_machine_stream(
            stream, timeout_ms=600_000, event_time=True, watermark="1 minute"
        )
        got = {
            (r.stream_id, r.seq, r.action, r.retry_id)
            for r in run_stream_to_memory(out, "etw_out", "append").collect()
        }
        expected = {
            ("s1", 1, START, 1),
            ("s1", TIMEOUT_SEQ, RETRY, 2),  # empty + push attempt -> retry
            ("s2", 2, START, 1),
            ("s2", 3, CONTINUE, 2),  # no fire: deadline 115 > watermark 104
            ("s3", 4, START, 1),
            ("s3", TIMEOUT_SEQ, EXHAUSTED_COMPLETE, 0),  # retries=1 burns out
            ("s4", 5, START, 1),
            ("s4", TIMEOUT_SEQ, STOP_EMPTY_POLL, 0),  # empty poll -> stop
        }
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_machine_event_time_null_ts_key(spark):
    """An active key whose events all carry null ts has no event-time
    position: it must carry NO deadline (no timer registered, no fire)
    rather than crash the stream with a TypeError on
    setTimeoutTimestamp(None). Keys with real ts still fire normally."""
    import datetime

    from tw_etl_spark.streaming.state_machine import TIMEOUT_SEQ

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    m = lambda k: t0 + datetime.timedelta(minutes=k)  # noqa: E731
    rows = [
        ("s_null", "online", 0, False, 3, 1, None),  # active, no ts ever
        ("s_ok", "online", 0, False, 3, 2, m(0)),  # stuck: fires once
        ("s_wm", "online", 0, False, 3, 3, m(105)),  # drives the watermark
    ]
    d = tempfile.mkdtemp(prefix="etwn_")
    try:
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, "b1")
        )
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(os.path.join(d, "*"))
        out = retry_machine_stream(
            stream, timeout_ms=600_000, event_time=True, watermark="1 minute"
        )
        got = {
            (r.stream_id, r.seq, r.action, r.retry_id)
            for r in run_stream_to_memory(out, "etwn_out", "append").collect()
        }
        expected = {
            ("s_null", 1, START, 1),  # no fire: null ts -> no deadline
            ("s_ok", 2, START, 1),
            ("s_ok", TIMEOUT_SEQ, RETRY, 2),  # deadline 10 <= watermark 104
            ("s_wm", 3, START, 1),  # deadline 115 > watermark: no fire
        }
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_machine_checkpoint_resume(spark):
    """Kill the stream after batch 1, restart from the checkpoint with a
    new query — keyed state must survive (the reference's resume path:
    state.py:59-81 + manager.py:70-76, replaced by the Spark state
    store)."""
    d = tempfile.mkdtemp(prefix="ckpt_")
    try:
        data_dir, ckpt = os.path.join(d, "data"), os.path.join(d, "ckpt")
        out_dir = os.path.join(d, "out")
        os.makedirs(data_dir)
        spark.createDataFrame(
            [("s1", "online", 0, False, 2, 1, None)], EVENT_SCHEMA
        ).coalesce(1).write.parquet(os.path.join(data_dir, "b1"))

        def start():
            stream = (
                spark.readStream.schema(EVENT_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(data_dir, "*"))
            )
            # file sink: the one built-in sink that supports checkpoint
            # recovery (the memory sink does not)
            return (
                retry_machine_stream(stream)
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        q1 = start()
        q1.awaitTermination()
        assert {
            (r.seq, r.action) for r in spark.read.parquet(out_dir).collect()
        } == {(1, START)}

        # second batch arrives while the query is DOWN
        spark.createDataFrame(
            [
                ("s1", "download_done", 0, False, 2, 2, None),
                ("s1", "download_done", 0, False, 2, 3, None),
            ],
            EVENT_SCHEMA,
        ).coalesce(1).write.parquet(os.path.join(data_dir, "b2"))
        _pin_mtimes(data_dir, ["b1", "b2"])

        q2 = start()
        q2.awaitTermination()
        got = {
            r.seq: r.action
            for r in spark.read.parquet(out_dir).filter(F.col("seq") > 1).collect()
        }
        # If state had been lost, these would be DEDUP_SKIP (idle key).
        assert got == {2: RETRY, 3: EXHAUSTED_COMPLETE}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_machine_end_to_end_streaming(spark):
    """Same machine through applyInPandasWithState over two micro-batches
    — state must persist across batches (the resume behavior,
    manager.py:70-76)."""
    d = tempfile.mkdtemp(prefix="sm_")
    try:
        rows1 = [("s1", "online", 0, False, 2, 1, None)]
        rows2 = [
            ("s1", "download_done", 0, False, 2, 2, None),
            ("s1", "download_done", 0, False, 2, 3, None),
            ("s2", "online", 0, True, 2, 4, None),
            ("s2", "download_done", 0, True, 2, 5, None),
        ]
        spark.createDataFrame(rows1, EVENT_SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, "b1")
        )
        spark.createDataFrame(rows2, EVENT_SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, "b2")
        )
        _pin_mtimes(d, ["b1", "b2"])
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(d, "*"))
        )
        out = run_stream_to_memory(
            retry_machine_stream(stream), "sm_out", output_mode="append"
        )
        got = {
            (r.stream_id, r.seq): r.action
            for r in out.collect()
        }
        assert got[("s1", 1)] == START
        assert got[("s1", 2)] == RETRY
        assert got[("s1", 3)] == EXHAUSTED_COMPLETE  # retries=2 exhausted
        assert got[("s2", 4)] == START
        assert got[("s2", 5)] == STOP_EMPTY_POLL
    finally:
        shutil.rmtree(d, ignore_errors=True)




def test_run_streams_cleanup_on_start_failure(spark, replay_dir):
    """If a later start() raises (duplicate query name here), the
    already-started queries must be stopped, not leaked into the
    session (ADVICE r6)."""
    from tw_etl_spark.streaming.windows import run_streams_to_memory

    def stream():
        return (
            spark.readStream.schema(
                "ts TIMESTAMP, event_type STRING, user_id BIGINT, value DOUBLE"
            )
            .parquet(replay_dir)
            .groupBy("event_type")
            .count()
        )

    before = {q.id for q in spark.streams.active}
    with pytest.raises(Exception):
        run_streams_to_memory(
            [
                ("first", stream(), "complete"),  # wrong tuple order -> raises
            ]
        )
    name = "cleanup_probe"
    with pytest.raises(Exception):
        # second job reuses the first job's query name -> start() raises
        run_streams_to_memory(
            [(stream(), name, "complete"), (stream(), name, "complete")]
        )
    leaked = [q for q in spark.streams.active if q.id not in before]
    assert leaked == [], [q.name for q in leaked]


def test_update_mode_converges_to_batch(spark, replay_dir):
    """Update output mode (SURVEY §2.2 streaming sinks): applying each
    micro-batch's updated rows over the previous state must converge to
    the batch aggregate — the sink-side contract of update mode."""
    batch = read_table(spark, SF_SMOKE, "events")
    stream = _stream(spark, replay_dir)
    agg = tumbling_agg(stream, "ts", "1 hour", ["event_type"], AGGS())
    state = {}

    def apply_updates(bdf, _bid):
        for r in bdf.collect():
            state[(r.win.start, r.event_type)] = (r.n, round(r.sv, 2))

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(apply_updates)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    want = {
        (r.win.start, r.event_type): (r.n, round(r.sv, 2))
        for r in tumbling_agg(batch, "ts", "1 hour", ["event_type"], AGGS()).collect()
    }
    assert state == want


# ------------------------------------------------------------------ R22
# Push source: the socket analog of the reference's POST /online/{stream}
# entry point (manager.py:163-176), feeding the retry machine.


def test_parse_push_lines_batch(spark):
    from tw_etl_spark.streaming.sources import parse_push_lines

    lines = spark.createDataFrame(
        [
            ("online/twitch_abc",),
            ("/online/kick_9",),
            ('{"stream_id":"s7","event":"download_done","size":42,"seq":5}',),
            ("GET /state",),  # unrelated route -> dropped
            ("{malformed json",),  # -> dropped
        ],
        ["value"],
    )
    rows = {r.stream_id: r for r in parse_push_lines(lines, default_retries=4).collect()}
    assert set(rows) == {"twitch_abc", "kick_9", "s7"}
    # bare push signal == online_handler defaults: push (not poll), config retries
    assert rows["twitch_abc"].event == "online"
    assert rows["twitch_abc"].poll_attempt is False
    assert rows["twitch_abc"].retries == 4
    assert rows["twitch_abc"].ts is not None
    # JSON event carries its own fields
    assert (rows["s7"].event, rows["s7"].size, rows["s7"].seq) == ("download_done", 42, 5)


def test_push_socket_drives_machine_to_exhaustion(spark):
    """online -> retry -> retry -> exhausted over a real socket: a local
    TCP server plays the pusher role; Spark's socket source connects and
    the retry machine consumes the signals."""
    import json
    import socket
    import threading
    import time

    from tw_etl_spark.streaming.sources import push_events_stream

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)

    lines = [
        "online/s1",  # push signal -> START (retries defaults to 3)
        json.dumps({"stream_id": "s1", "event": "download_done", "size": 0, "seq": 1}),
        json.dumps({"stream_id": "s1", "event": "download_done", "size": 0, "seq": 2}),
        json.dumps({"stream_id": "s1", "event": "download_done", "size": 0, "seq": 3}),
    ]
    holder: dict = {}

    def serve():
        conn, _ = server.accept()
        holder["conn"] = conn
        conn.sendall(("\n".join(lines) + "\n").encode())

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    d = tempfile.mkdtemp(prefix="push_ck_")
    q = (
        retry_machine_stream(push_events_stream(spark, port=port))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("push_sm")
        .option("checkpointLocation", os.path.join(d, "ck"))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM push_sm").collect()
            if len(rows) >= 4:
                break
            time.sleep(0.3)
        assert len(rows) >= 4, f"only {len(rows)} actions arrived: {rows}"
        actions = [r.action for r in sorted(rows, key=lambda r: r.seq)]
        # retries=3: start(1) -> empty done x2 retries -> 4th attempt > cap
        assert actions == [START, RETRY, RETRY, EXHAUSTED_COMPLETE]
    finally:
        q.stop()
        if "conn" in holder:
            holder["conn"].close()
        server.close()
        shutil.rmtree(d, ignore_errors=True)


def test_quality_battery_streams_equals_batch(spark):
    """The Gopher/C4 batteries are narrow maps, so they must compose
    with readStream unchanged and produce exactly the batch result —
    stream/batch unification for the curation path."""
    from tw_etl_spark.operators.quality import c4_clean, gopher_flags

    d = tempfile.mkdtemp(prefix="docs_replay_")
    try:
        docs = read_table(spark, SF_SMOKE, "documents")
        docs.repartition(4).write.mode("overwrite").parquet(d)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        streamed = run_stream_to_memory(
            c4_clean(gopher_flags(stream)).select(
                "doc_id", "gopher_keep", "c4_keep", "c4_n_lines"
            ),
            "quality_stream",
            output_mode="append",
        ).collect()
        batch = {
            r.doc_id: (r.gopher_keep, r.c4_keep, r.c4_n_lines)
            for r in c4_clean(gopher_flags(docs))
            .select("doc_id", "gopher_keep", "c4_keep", "c4_n_lines")
            .collect()
        }
        got = {r.doc_id: (r.gopher_keep, r.c4_keep, r.c4_n_lines) for r in streamed}
        assert got == batch
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Keyed-state sessionization (streaming/sessions.py) — the closed-only
# emission contract that makes st2 driver-scorable.
# ---------------------------------------------------------------------------


def _sessions_via_stream(spark, rows, files_per_trigger):
    """Run sessionize_closed over ``rows`` split across parquet files
    (one file per sublist), with the given micro-batch granularity."""
    from tw_etl_spark.streaming.sessions import sessionize_closed

    d = tempfile.mkdtemp(prefix="sess_")
    try:
        subs = []
        for i, chunk in enumerate(rows):
            sub = f"b{i}"
            spark.createDataFrame(chunk, "user_id BIGINT, ts TIMESTAMP").coalesce(
                1
            ).write.parquet(os.path.join(d, sub))
            subs.append(sub)
        _pin_mtimes(d, subs)
        stream = (
            spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(os.path.join(d, "*"))
        )
        out = run_stream_to_memory(
            sessionize_closed(stream, gap_minutes=30),
            f"sess_out_{files_per_trigger}",
            output_mode="append",
        )
        return {
            (r.user_id, r.session_start.isoformat(), r.n_events)
            for r in out.collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sessionize_closed_contract_and_batch_split_invariance(spark):
    """Only CLOSED sessions are emitted, a session spanning two
    micro-batches is held open (not emitted twice or split), and the
    result is identical whether the files arrive as one batch or one
    file per batch."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    h = lambda hh, m: dt.datetime(2024, 1, 1, hh, m)  # noqa: E731
    # u1: session A = [00:00, 00:10, 00:20]; session B (spans the file
    # split) = [01:30 | 01:40]; session C (open tail) = [05:00].
    # u2: single open session -> nothing emitted.
    b1 = [(1, t(0)), (1, t(10)), (1, t(20)), (1, h(1, 30)), (2, h(2, 0))]
    b2 = [(1, h(1, 40)), (1, h(5, 0)), (2, h(2, 10))]
    want = {
        (1, "2024-01-01T00:00:00", 3),  # session A, closed by B
        (1, "2024-01-01T01:30:00", 2),  # session B spanning batches, closed by C
    }
    assert _sessions_via_stream(spark, [b1, b2], files_per_trigger=1) == want
    assert _sessions_via_stream(spark, [b1, b2], files_per_trigger=2) == want


def test_sessionize_closed_gap_boundary(spark):
    """An event at exactly prev + 30min CONTINUES the session; one
    microsecond past opens a new one (the e3 oracle boundary)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=30)),  # exactly gap: continues
        (1, base + dt.timedelta(minutes=60, microseconds=1)),  # > gap: new
        (1, base + dt.timedelta(hours=9)),  # > gap: new (closes prev)
    ]
    got = _sessions_via_stream(spark, [rows], files_per_trigger=4)
    assert got == {
        (1, "2024-01-01T00:00:00", 2),
        (1, "2024-01-01T01:00:00.000001", 1),
    }


def test_session_window_append_emission_boundary(spark):
    """st1's session branch relies on the append-mode emission rule on a
    drained availableNow stream being 'session end <= final watermark'
    (INCLUSIVE). Craft a session whose end lands EXACTLY on
    max(ts) - delay: it must be emitted — if a Spark upgrade flips the
    boundary to strict <, this pins the break locally instead of as a
    driver hash mismatch on st1."""
    import datetime as dt

    from tw_etl_spark.streaming.windows import session_agg

    d = tempfile.mkdtemp(prefix="sessb_")
    try:
        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        # user 1's session ends at 00:30 (single event + 30min gap);
        # user 2's event at 01:30 drives the final watermark to exactly
        # 01:30 - 1h = 00:30.
        rows = [(1, base), (2, base + dt.timedelta(minutes=90))]
        spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP").coalesce(
            1
        ).write.parquet(os.path.join(d, "b"))
        stream = spark.readStream.schema("user_id BIGINT, ts TIMESTAMP").parquet(
            os.path.join(d, "*")
        )
        agg = session_agg(
            stream,
            "ts",
            "30 minutes",
            ["user_id"],
            [F.count(F.lit(1)).alias("n")],
            watermark="1 hour",
        )
        out = run_stream_to_memory(
            agg.select("user_id", F.col("win.end").alias("en"), "n"),
            "sess_boundary",
            output_mode="append",
        ).collect()
        got = {(r.user_id, r.en, r.n) for r in out}
        assert got == {(1, base + dt.timedelta(minutes=30), 1)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sessionize_closed_randomized_vs_reference(spark):
    """Randomized corpora, random file splits, one file per micro-batch:
    sessionize_closed must equal a pure-python reference (sort per user,
    strict > gap opens a session, drop each user's trailing session)."""
    import datetime as dt
    import random

    gap = dt.timedelta(minutes=30)
    for seed in (11, 12, 13):
        rng = random.Random(seed)
        base = dt.datetime(2024, 3, 1)
        rows = []
        for u in range(1, 6):
            t = base + dt.timedelta(minutes=rng.randint(0, 120))
            for _ in range(rng.randint(1, 15)):
                rows.append((u, t))
                # hover around the 30-min boundary incl. exact ties
                t = t + dt.timedelta(
                    minutes=rng.choice([1, 5, 29, 30, 31, 90]),
                    seconds=rng.choice([0, 0, 1]),
                )
        rng.shuffle(rows)
        n_files = rng.randint(1, 3)
        chunks = [rows[i::n_files] for i in range(n_files)]
        # reference
        by_user: dict[int, list] = {}
        for u, t in rows:
            by_user.setdefault(u, []).append(t)
        want = set()
        for u, ts in by_user.items():
            ts.sort()
            sessions = []
            start, n = ts[0], 1
            for prev, cur in zip(ts, ts[1:]):
                if cur > prev + gap:
                    sessions.append((start, n))
                    start, n = cur, 1
                else:
                    n += 1
            sessions.append((start, n))  # trailing (stays open → dropped)
            for s, c in sessions[:-1]:
                want.add((u, s.isoformat(), c))
        # NOTE: cross-batch arrival order is ts-agnostic here (shuffled
        # round-robin chunks), which the closed-only contract tolerates
        # ONLY when sessions don't straddle out-of-order batches; use
        # files_per_trigger high enough to drain in one batch for the
        # multi-file case, and 1-file corpora for true multi-batch.
        got = _sessions_via_stream(spark, chunks, files_per_trigger=n_files)
        assert got == want, (seed, got ^ want)


def test_idempotent_sink_replay_never_duplicates(spark):
    """foreachBatch is at-least-once: a crash between the user function
    and the checkpoint commit replays the same (batch_id, data). The
    idempotent sink must absorb the replay (overwrite its own partition)
    while leaving other batches untouched — including a replay that
    produced PARTIAL output before crashing."""
    from tw_etl_spark.streaming.sinks import idempotent_parquet_writer

    d = tempfile.mkdtemp(prefix="idem_sink_")
    try:
        out = os.path.join(d, "out")
        write = idempotent_parquet_writer(out)
        write(spark.range(0, 5).selectExpr("id AS v"), 0)
        # crashed attempt of batch 1: partial (2 rows) — then the replay
        # delivers the full batch (4 rows)
        write(spark.range(100, 102).selectExpr("id AS v"), 1)
        write(spark.range(100, 104).selectExpr("id AS v"), 1)
        got = sorted(r.v for r in spark.read.parquet(out).collect())
        assert got == [0, 1, 2, 3, 4, 100, 101, 102, 103]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_event_time_fire_boundary(spark):
    """The event-time watchdog fires STRICTLY when deadline < watermark:
    a deadline exactly equal to the final watermark does NOT fire. This
    pins the boundary the st4 oracle encodes (epoch_ms(last_ts) + T <
    epoch_ms(t_max) - delay). T=10 min, delay=1 min, global max ts =
    m(100) -> final watermark m(99)."""
    import datetime

    from tw_etl_spark.streaming.state_machine import TIMEOUT_SEQ

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    m = lambda k: t0 + datetime.timedelta(minutes=k)  # noqa: E731
    rows = [
        ("s_eq", "online", 0, False, 3, 1, m(89)),  # deadline m(99) == wm
        ("s_lt", "online", 0, False, 3, 2, m(80)),  # deadline m(90) < wm
        ("s_gt", "online", 0, False, 3, 3, m(95)),  # deadline m(105) > wm
        ("s_wm", "online", 0, False, 3, 4, m(100)),  # drives the watermark
    ]
    d = tempfile.mkdtemp(prefix="bnd_")
    try:
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, "b1")
        )
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(os.path.join(d, "*"))
        out = retry_machine_stream(
            stream, timeout_ms=600_000, event_time=True, watermark="1 minute"
        )
        fired = {
            r.stream_id
            for r in run_stream_to_memory(out, "bnd_out", "append").collect()
            if r.seq == TIMEOUT_SEQ
        }
        assert fired == {"s_lt"}  # equality does not fire; only strict-less
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_neardup_survivor_batch_split_independent(spark):
    """st5's survivor rule must be micro-batch-split independent: a
    one-file-per-trigger availableNow run (6 micro-batches, dups
    arriving in different batches) emits the same (sig, survivor,
    n_members) table as the batch groupBy — min(doc_id) wins no matter
    which batch carried it. st2's dropDuplicates picks arbitrary first
    arrivals; this pins the DETERMINISTIC alternative."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import simhash_portable_expr

    rows = [(i, txt) for i, txt in enumerate(
        ["aa bb cc", "dd ee ff", "aa bb cc", "gg hh", "aa bb cc", "dd ee ff"]
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = tempfile.mkdtemp(prefix="st5_split_")
    try:
        # one row per file -> each duplicate arrives in its own batch
        df.repartition(6, "doc_id").write.mode("overwrite").parquet(d)
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        clusters = (
            stream.select(
                "doc_id", simhash_portable_expr(F.col("text")).alias("sig")
            )
            .groupBy("sig")
            .agg(
                F.min("doc_id").alias("survivor"),
                F.count(F.lit(1)).cast("long").alias("n_members"),
            )
        )
        q = (
            clusters.writeStream.outputMode("complete")
            .format("memory")
            .queryName("st5_split_t")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert q.lastProgress["batchId"] >= 2  # genuinely multi-batch
        got = {
            (r.sig, r.survivor, r.n_members)
            for r in spark.table("st5_split_t").collect()
        }
        want = {
            (r.sig, r.survivor, r.n_members)
            for r in df.select(
                "doc_id", simhash_portable_expr(F.col("text")).alias("sig")
            )
            .groupBy("sig")
            .agg(
                F.min("doc_id").alias("survivor"),
                F.count(F.lit(1)).cast("long").alias("n_members"),
            )
            .collect()
        }
        assert got == want
        assert {(s, n) for _, s, n in [(None, r[1], r[2]) for r in got if r[2] >= 2]} == {
            (0, 3), (1, 2)
        }  # "aa bb cc" cluster -> survivor 0 of 3; "dd ee ff" -> survivor 1 of 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_funnel_step_transition_table():
    """funnel_step known answers, including every strict-boundary rule:
    click before any view, click AT the view timestamp (no advance),
    purchase before the qualifying click, repeat stages ignored."""
    from tw_etl_spark.streaming.state_machine import funnel_step

    s = (0, 0, 0)
    # click with no view yet: ignored
    assert funnel_step(*s, 100, "click") == (0, 0, 0, None, None)
    # first view advances
    s = funnel_step(*s, 100, "view")[:3]
    assert s == (100, 0, 0)
    # second view ignored
    assert funnel_step(*s, 50, "view")[:3] == s
    # click AT t1: strict > fails, no advance
    assert funnel_step(*s, 100, "click")[:3] == s
    # purchase before any click: ignored
    assert funnel_step(*s, 200, "purchase")[:3] == s
    # qualifying click: gap in ms from microsecond state
    t1, t2, t3, stage, gap = funnel_step(*s, 5100, "click")
    assert (t2, stage, gap) == (5100, "2_click", 5)
    s = (t1, t2, t3)
    # purchase AT t2: no advance; strictly after: advances
    assert funnel_step(*s, 5100, "purchase")[:3] == s
    t1, t2, t3, stage, gap = funnel_step(*s, 9100, "purchase")
    assert (t3, stage, gap) == (9100, "3_purchase", 4)
    # funnel complete: everything else ignored
    assert funnel_step(t1, t2, t3, 99999, "click")[3] is None


def test_stream_funnel_split_independent_for_ordered_sources(spark):
    """st6's machine contract: a source delivering each key's events in
    event-time order across micro-batches (time-split files, one per
    trigger) must emit the same stage-advance set as the single-batch
    replay — the state carries the funnel across the split."""
    import tempfile

    from pyspark.sql import functions as F

    from tw_etl_spark.streaming.state_machine import (
        FUNNEL_EVENT_SCHEMA,
        funnel_machine_stream,
    )

    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 10:01:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),      # batch boundary below
        (1, "2024-01-01 11:00:00", "purchase"),
        (2, "2024-01-01 11:02:00", "click"),
        (2, "2024-01-01 11:30:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_type string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")

    def run(src_dir, n_files):
        stream = (
            spark.readStream.schema(FUNNEL_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        name = f"st6_split_{n_files}"
        q = (
            funnel_machine_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q, {
            (r.user_id, r.stage, r.gap_ms)
            for r in spark.table(name).collect()
        }

    d1 = tempfile.mkdtemp(prefix="st6_one_")
    df.coalesce(1).write.mode("overwrite").parquet(d1)
    _, single = run(d1, 1)

    d2 = tempfile.mkdtemp(prefix="st6_two_")
    early = df.filter(F.col("ts") < "2024-01-01 10:30:00")
    late = df.filter(F.col("ts") >= "2024-01-01 10:30:00")
    early.coalesce(1).write.mode("overwrite").parquet(d2)
    import time

    time.sleep(1.1)  # distinct mtimes: oldest-first file order
    late.coalesce(1).write.mode("append").parquet(d2)
    q2, split = run(d2, 2)
    assert q2.lastProgress["batchId"] >= 1  # genuinely >1 micro-batch
    assert split == single
    assert single == {
        (1, "1_view", None),
        (1, "2_click", 300_000),
        (1, "3_purchase", 3_300_000),
        (2, "1_view", None),
        (2, "2_click", 3_660_000),
        (2, "3_purchase", 1_680_000),
    }


def test_retention_step_transition_table():
    """retention_step known answers: cohort latch, offset-0 emission,
    repeat-day dedup, new-day emission, bitmap word boundary, loud
    failures on contract breaks (pre-cohort day, beyond-horizon)."""
    import pytest

    from tw_etl_spark.streaming.state_machine import (
        RETENTION_HORIZON_DAYS,
        retention_step,
    )

    c, m, off = retention_step(-1, [0, 0, 0, 0], 100)
    assert (c, off) == (100, 0) and m[0] == 1
    c, m, off = retention_step(c, m, 100)  # same day: no emission
    assert off is None and m[0] == 1
    c, m, off = retention_step(c, m, 103)
    assert off == 3 and m[0] == 0b1001
    c, m, off = retention_step(c, m, 100 + 64)  # second bitmap word
    assert off == 64 and m[1] == 1
    with pytest.raises(ValueError):
        retention_step(c, m, 99)  # before latched cohort
    with pytest.raises(ValueError):
        retention_step(c, m, 100 + RETENTION_HORIZON_DAYS)


def test_stream_retention_split_independent_for_ordered_sources(spark):
    """st7's machine contract: time-split files, one per trigger, must
    emit the same (user, cohort, offset) set as the single-batch
    replay — the latched cohort and bitmap carry across the split."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from tw_etl_spark.streaming.state_machine import (
        FUNNEL_EVENT_SCHEMA,
        retention_machine_stream,
    )

    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 18:00:00", "click"),      # same day: dedup
        (2, "2024-01-02 09:00:00", "view"),       # batch boundary below
        (1, "2024-01-03 10:05:00", "click"),
        (2, "2024-01-02 23:00:00", "purchase"),   # same day: dedup
        (2, "2024-01-05 11:30:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_type string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")

    def run(src_dir, n_files):
        stream = (
            spark.readStream.schema(FUNNEL_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        name = f"st7_split_{n_files}"
        q = (
            retention_machine_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q, {
            (r.user_id, r.cohort_day, r.day_offset)
            for r in spark.table(name).collect()
        }

    d1 = tempfile.mkdtemp(prefix="st7_one_")
    df.coalesce(1).write.mode("overwrite").parquet(d1)
    _, single = run(d1, 1)

    d2 = tempfile.mkdtemp(prefix="st7_two_")
    early = df.filter(F.col("ts") < "2024-01-02 12:00:00")
    late = df.filter(F.col("ts") >= "2024-01-02 12:00:00")
    early.coalesce(1).write.mode("overwrite").parquet(d2)
    time.sleep(1.1)  # distinct mtimes: oldest-first file order
    late.coalesce(1).write.mode("append").parquet(d2)
    q2, split = run(d2, 2)
    assert q2.lastProgress["batchId"] >= 1
    assert split == single
    # 2024-01-01 = epoch day 19723; user 1 active days 01-01 and 01-03;
    # user 2 cohort 01-02, active 01-02 and 01-05
    assert single == {
        (1, 19723, 0),
        (1, 19723, 2),
        (2, 19724, 0),
        (2, 19724, 3),
    }


def test_drain_stream_latest_multi_batch(spark):
    """drain_stream_latest (VERDICT r10 #1's fix): an UPDATE-mode
    streaming aggregation drained through the foreachBatch parquet sink
    over MULTIPLE micro-batches must resolve to exactly the batch
    answer — a key updated in a later batch takes its latest aggregate,
    never a duplicate or a stale row."""
    import time

    from tw_etl_spark.streaming.sinks import drain_stream_latest

    src = tempfile.mkdtemp(prefix="drain_src_")
    scratch = tempfile.mkdtemp(prefix="drain_scratch_")
    try:
        # key 'a' appears in both files (forces a cross-batch update);
        # 'b' only in the first, 'c' only in the second
        rows1 = [("a", 1), ("b", 10)]
        rows2 = [("a", 2), ("a", 3), ("c", 7)]
        spark.createDataFrame(rows1, "k string, v long").coalesce(
            1
        ).write.mode("overwrite").parquet(src)
        time.sleep(1.1)  # distinct mtimes: oldest-first file order
        spark.createDataFrame(rows2, "k string, v long").coalesce(
            1
        ).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema("k string, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = stream.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").alias("s"),
        )
        got = drain_stream_latest(agg, ["k"], scratch, "drain_unit")
        assert {(r.k, r.n, r.s) for r in got.collect()} == {
            ("a", 3, 6),
            ("b", 1, 10),
            ("c", 1, 7),
        }
        # the drained ledger really spans >1 micro-batch and the
        # resolve picked key a's LATEST version, not its first
        ledger = spark.read.parquet(os.path.join(scratch, "out"))
        batch_ids = {r.batch_id for r in ledger.select("batch_id").collect()}
        assert len(batch_ids) >= 2, batch_ids
        a_versions = ledger.filter(F.col("k") == "a").count()
        assert a_versions >= 2
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)


def test_no_complete_mode_data_sized_drain_in_stn_family():
    """Scale posture of the driver streaming family (VERDICT r10 #1):
    complete-mode memory-sink drains re-emit the FULL result table
    every micro-batch into the driver, so they are only admissible for
    BOUNDED-cardinality results. Whitelist (VERDICT r11 #6 shrank it to
    one): st8's CMS sketch alone — 4x256 cells, CONSTANT by
    construction. Everything data- or window-cardinality-sized (st1's
    window tables, st5's signature table, st9's per-user cells) routes
    through the update-mode foreachBatch parquet drain instead."""
    import re

    import tw_etl_spark.queries.streamq as streamq

    src = open(streamq.__file__).read()
    complete_tags = re.findall(r'\(\w+, f"(st\d+)[^"]*", "complete"\)', src)
    assert set(complete_tags) <= {"st8"}, complete_tags
    # and the fixed queries really route through the scale-safe drain
    assert src.count("drain_stream_latest(") >= 4  # st1 t+s, st5, st9


def test_scd2_apply_writer_replay_safe(spark):
    """The CDC-apply sink's exactly-once claim (st10): batch N's input
    is pinned to the committed version chain (v{N-1}), so an
    at-least-once foreachBatch REPLAY of any batch — even after a
    partial/crashed write of its own output version — rewrites a
    byte-identical version instead of double-applying the delta."""
    from tw_etl_spark.streaming.sinks import scd2_apply_writer

    root = tempfile.mkdtemp(prefix="scd2_apply_")
    try:
        seed = os.path.join(root, "seed")
        out = os.path.join(root, "out")
        spark.createDataFrame(
            [(1, 10.0, "2024-01-01", None, True),
             (2, 20.0, "2024-01-01", None, True)],
            "k long, p double, ef string, et string, cur boolean",
        ).selectExpr(
            "k", "p",
            "cast(ef as date) as effective_from",
            "cast(et as date) as effective_to",
            "cur as is_current",
        ).write.mode("overwrite").parquet(seed)

        b0 = spark.createDataFrame(
            [(1, 11.0, "2024-02-01"), (3, 30.0, "2024-02-01")],
            "k long, p double, ef string",
        ).selectExpr("k", "p", "cast(ef as date) as effective_from")
        b1 = spark.createDataFrame(
            [(2, 22.0, "2024-03-01")], "k long, p double, ef string"
        ).selectExpr("k", "p", "cast(ef as date) as effective_from")

        apply_cdc = scd2_apply_writer(
            spark, seed, out, keys=["k"], payload_cols=["p"]
        )

        def snap(v):
            return {
                tuple(r)
                for r in spark.read.parquet(os.path.join(out, v)).collect()
            }

        apply_cdc(b0, 0)
        apply_cdc(b1, 1)
        v0, v1 = snap("v0"), snap("v1")
        # sanity: k=1 closed+reopened in v0; k=3 inserted; k=2 closed in v1
        assert len(v0) == 4 and len(v1) == 5

        # crashed partial write of v1, then replay of batch 1
        spark.createDataFrame(
            [(99, 0.0, None, None, False)],
            "k long, p double, effective_from date, effective_to date, "
            "is_current boolean",
        ).write.mode("overwrite").parquet(os.path.join(out, "v1"))
        apply_cdc(b1, 1)
        assert snap("v1") == v1

        # replay of batch 0 too: v0 identical, and a subsequent batch-1
        # replay still lands the same v1 (the chain re-derives)
        apply_cdc(b0, 0)
        assert snap("v0") == v0
        apply_cdc(b1, 1)
        assert snap("v1") == v1
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_drain_stream_latest_empty_source(spark):
    """An empty source directory produces zero micro-batches — no batch
    ever commits, the out dir never materializes, and the drain must
    return an EMPTY frame with the aggregation's schema instead of
    failing on the missing parquet path."""
    from tw_etl_spark.streaming.sinks import drain_stream_latest

    src = tempfile.mkdtemp(prefix="drain_empty_src_")
    scratch = tempfile.mkdtemp(prefix="drain_empty_scratch_")
    try:
        stream = spark.readStream.schema("k string, v long").parquet(src)
        agg = stream.groupBy("k").agg(F.sum("v").alias("s"))
        got = drain_stream_latest(agg, ["k"], scratch, "drain_empty_unit")
        assert got.count() == 0
        assert got.columns == ["k", "s"]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)


def test_ivf_append_writer_replay_safe_and_matches_batch_append(spark):
    """st11's exactly-once contract: a PARTIAL crashed attempt of a
    micro-batch followed by its full replay leaves the stream_lists
    state identical to a single clean run — assignment against the
    FIXED persisted centroids is deterministic, so dynamic partition
    overwrite of (batch_id, list_id) rewrites exactly the crashed
    attempt's partitions. And the streamed index must answer queries
    identically to the batch append path (append_ivf_index), since
    both are the same assignment against the same centroids."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.similarity import (
        ann_ivf_persisted_topk,
        append_ivf_index,
        write_ivf_index,
    )
    from tw_etl_spark.streaming.sinks import ivf_append_writer

    v = read_table(spark, SF_SMOKE, "embeddings")
    old = v.filter(F.col("vec_id") % 3 != 0)
    new = v.filter(F.col("vec_id") % 3 == 0).select("vec_id", "embedding")
    q = v.filter(F.col("vec_id") < 5)

    d = tempfile.mkdtemp(prefix="ivf_stream_")
    try:
        stream_idx = os.path.join(d, "stream")
        batch_idx = os.path.join(d, "batch")
        write_ivf_index(old, stream_idx, n_lists=16)
        write_ivf_index(old, batch_idx, n_lists=16)

        write = ivf_append_writer(spark, stream_idx)
        b0 = new.filter(F.col("vec_id") % 2 == 0)
        b1 = new.filter(F.col("vec_id") % 2 != 0)
        write(b0, 0)
        # crashed attempt of batch 1 delivers a partial prefix, then
        # the replay delivers the full batch
        write(b1.limit(3), 1)
        write(b1, 1)

        streamed = {
            tuple(r)
            for r in ann_ivf_persisted_topk(
                q, stream_idx, nprobe=2, k=3, stream_appends=True
            ).collect()
        }
        append_ivf_index(new, batch_idx)
        batched = {
            tuple(r)
            for r in ann_ivf_persisted_topk(
                q, batch_idx, nprobe=2, k=3
            ).collect()
        }
        assert streamed == batched
        assert len(streamed) == 15  # 5 queries x top-3
        # replay left no duplicate candidates: every appended id appears
        # exactly once in the streamed lists
        lists = spark.read.parquet(os.path.join(stream_idx, "stream_lists"))
        n = lists.count()
        assert n == lists.select("cand_id").distinct().count()
        assert n == new.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_lsh_index_stream_writer_replay_safe(spark):
    """st12's exactly-once contract, exercised on the writer directly:
    (1) a full at-least-once REPLAY of a committed micro-batch leaves
    pairs, stream_banded, and stream_sigs byte-equivalent (dynamic
    overwrite of deterministic md5 content rewrites exactly its own
    partitions); (2) the replay's state read excludes the batch's own
    previously-committed rows (batch_id < bid) — if it didn't, the
    union would carry duplicate signatures and the verify join would
    emit duplicate pair rows, which the multiset equality below would
    catch."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.dedup import (
        minhash_signatures_portable,
        write_banded_index,
    )
    from tw_etl_spark.streaming.sinks import lsh_index_stream_writer

    d = read_table(spark, SF_SMOKE, "documents")
    seed = d.filter(F.col("doc_id") % 3 == 0)
    b1 = d.filter(F.col("doc_id") % 3 == 1).select("doc_id", "text")
    b2 = d.filter(F.col("doc_id") % 3 == 2).select("doc_id", "text")

    root = tempfile.mkdtemp(prefix="lsh_stream_")
    try:
        idx = os.path.join(root, "index")
        write_banded_index(
            minhash_signatures_portable(seed, num_hashes=16),
            idx, num_hashes=16, bands=4,
        )
        writer = lsh_index_stream_writer(
            spark, idx, num_hashes=16, bands=4, threshold=0.9
        )
        writer(b1, 0)
        writer(b2, 1)

        def pairs_multiset():
            rows = spark.read.parquet(os.path.join(idx, "pairs")).collect()
            ms = sorted(
                (r.id_a, r.id_b, r.est_jaccard, r.batch_id) for r in rows
            )
            return ms

        before = pairs_multiset()
        n_sigs = spark.read.parquet(os.path.join(idx, "stream_sigs")).count()
        # at-least-once: the stream replays (batch_id=1, same data)
        writer(b2, 1)
        assert pairs_multiset() == before
        assert (
            spark.read.parquet(os.path.join(idx, "stream_sigs")).count()
            == n_sigs == b1.count() + b2.count()
        )
        # pairs are unique (no duplicate emission across the chain)
        flat = [(a, b) for a, b, _, _ in before]
        assert len(flat) == len(set(flat))
        assert before  # planted duplicate text guarantees pairs
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_lsh_index_stream_chain_matches_batch_chain(spark):
    """st12's chain identity over FOUR batches: driving the streaming
    writer batch-by-batch lands exactly the pairs the batch-side dd18
    chain (write_banded_index seed + read -> lsh_delta_pairs_prebanded
    -> append per day) produces — every batch sees seed ∪ all earlier
    batches and nothing else, on both paths."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.dedup import (
        lsh_delta_pairs_prebanded,
        minhash_signatures_portable,
        read_banded_index,
        write_banded_index,
    )
    from tw_etl_spark.streaming.sinks import lsh_index_stream_writer

    d = read_table(spark, SF_SMOKE, "documents")
    seed = d.filter(F.col("doc_id") % 5 == 0)
    batches = [
        d.filter(F.col("doc_id") % 5 == k).select("doc_id", "text")
        for k in (1, 2, 3, 4)
    ]

    root = tempfile.mkdtemp(prefix="lsh_chain_")
    try:
        s_idx = os.path.join(root, "stream")
        b_idx = os.path.join(root, "batch")
        for idx in (s_idx, b_idx):
            write_banded_index(
                minhash_signatures_portable(seed, num_hashes=16),
                idx, num_hashes=16, bands=4,
            )

        writer = lsh_index_stream_writer(
            spark, s_idx, num_hashes=16, bands=4, threshold=0.9
        )
        for bid, b in enumerate(batches):
            writer(b, bid)
        streamed = {}
        rows = spark.read.parquet(os.path.join(s_idx, "pairs")).collect()
        for r in rows:
            streamed.setdefault(r.batch_id, set()).add(
                (r.id_a, r.id_b, r.est_jaccard)
            )

        batch_pairs = {}
        for bid, b in enumerate(batches):
            banded, sigs = read_banded_index(spark, b_idx)
            pairs, new_sigs, new_banded = lsh_delta_pairs_prebanded(
                b, banded, sigs, num_hashes=16, bands=4, threshold=0.9
            )
            batch_pairs[bid] = {
                (r.id_a, r.id_b, r.est_jaccard) for r in pairs.collect()
            }
            new_banded.write.mode("append").partitionBy("band").parquet(
                os.path.join(b_idx, "banded")
            )
            new_sigs.write.mode("append").parquet(
                os.path.join(b_idx, "sigs")
            )

        # a zero-pair batch writes no pairs/batch_id=N partition, so
        # streamed may lack that key — compare per-batch with default
        assert set(streamed) <= set(batch_pairs)
        for bid in batch_pairs:
            assert streamed.get(bid, set()) == batch_pairs[bid], bid
        assert any(batch_pairs.values())  # planted dups guarantee pairs
    finally:
        shutil.rmtree(root, ignore_errors=True)
