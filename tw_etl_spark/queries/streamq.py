"""Driver-scored Structured Streaming queries.

Streaming operators were previously verified only by the batch-vs-
stream equivalence harness (tests/test_streaming.py) because the
correctness driver collects a batch DataFrame. These queries close
that gap: each one runs a REAL streaming query inside the callable —
file source -> transformation -> memory sink, driven to completion
with ``Trigger.availableNow`` — and returns the sink's contents as the
batch result. The DuckDB oracle computes the same answer relationally,
so the full streaming path (source offsets, streaming aggregation
state, keyed user state, sink commit) is hash-verified end to end.

Determinism notes:
- st1's tumble/slide branches run in complete output mode, so every
  window is emitted regardless of where the watermark ends up when the
  stream drains. The session branch must run append mode (complete is
  unsupported for session-window merges); on a drained availableNow
  stream its emission rule is exactly "session end <= max(ts) - delay",
  which the oracle pins as a relational cutoff. Watermark-driven
  late-data DROP is driver-scored by st3 (two checkpointed
  availableNow runs; deterministic event_id%4 lateness injection)
  and additionally covered by the equivalence harness.
- st2 emits only CLOSED sessions (streaming/sessions.py contract), so
  its output is identical however the source splits micro-batches;
  the oracle mirrors the contract by excluding each user's final
  session.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table as _t
from tw_etl_spark.queries import REGISTRY, register
from tw_etl_spark.queries.similarity import (
    _ivf_lifecycle_ctes,  # shared oracle builders: st11's replay must
    _ivf_rank_tail,  # be identical to v8p's (the stream == batch claim)
)
from tw_etl_spark.streaming.sessions import sessionize_closed
from tw_etl_spark.streaming.sinks import (
    idempotent_parquet_writer,
    scd2_apply_writer,
)
from tw_etl_spark.streaming.windows import (
    run_streams_to_memory,
    session_agg,
    sliding_agg,
    tumbling_agg,
)


def _nullts():
    return F.lit(None).cast("timestamp")


def _scratch(spark: SparkSession, sf_dir: str, name: str) -> tuple[str, str]:
    """(scratch dir, sql-safe tag) — deterministic per (sf_dir,
    applicationId): reruns within a session overwrite instead of
    accumulating, the query name never collides across scale factors,
    and two CONCURRENT sessions on the same sf_dir never clobber each
    other's checkpoints mid-drain (the dedup `_delta_scratch` contract
    applied to the streaming tier). The CALLER's session is threaded
    in (ADVICE r12: getActiveSession() can be None in a worker thread,
    and its silent app='' fallback reintroduced the cross-session
    clobbering this tag exists to prevent)."""
    tag = hashlib.md5(
        (os.path.abspath(sf_dir) + "|" + spark.sparkContext.applicationId)
        .encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"tw_etl_spark_{name}_{tag}"), tag




def _land(batch_df: DataFrame, stage: str, src: str, name: str) -> None:
    """Stage a batch as ONE parquet file and copy it into the stream's
    source directory — the shared file-arrival simulator for every
    file-source streaming query (one call == one arriving file == one
    micro-batch under maxFilesPerTrigger=1)."""
    import shutil

    d = os.path.join(stage, name)
    batch_df.coalesce(1).write.mode("overwrite").parquet(d)
    (part,) = [f for f in os.listdir(d) if f.endswith(".parquet")]
    shutil.copyfile(os.path.join(d, part), os.path.join(src, f"{name}.parquet"))


@register(
    "st1_stream_hourly_rollup",
    oracle="""
    SELECT 'tumble' AS branch,
           date_trunc('hour', ts)      AS win_start,
           event_type                  AS key,
           CAST(count(*) AS BIGINT)    AS n_events,
           round(sum(value), 2)        AS sum_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 2, 3
    UNION ALL
    SELECT 'slide',
           time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE * k,
           event_type,
           CAST(count(*) AS BIGINT),
           round(sum(value), 2)
    FROM events, unnest([0, 1]) AS t(k)
    WHERE ts IS NOT NULL
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sess', session_start, CAST(user_id AS VARCHAR), n_events, sum_value
    FROM (
      WITH g AS (
        SELECT user_id, ts, value, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events WHERE ts IS NOT NULL
      ), s AS (
        SELECT user_id, ts, value,
               sum(CASE WHEN prev IS NULL OR ts > prev + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
        FROM g
      )
      SELECT user_id, min(ts) AS session_start, max(ts) AS last_ts,
             CAST(count(*) AS BIGINT) AS n_events,
             round(sum(value), 2) AS sum_value
      FROM s GROUP BY user_id, sid
    )
    WHERE last_ts + INTERVAL 30 MINUTE <=
          (SELECT max(ts) FROM events WHERE ts IS NOT NULL) - INTERVAL 1 HOUR
    ORDER BY branch, win_start, key
    """,
    doc="Structured Streaming end to end, driver-scored: events land in "
    "a parquet drop directory, a file-source STREAM reads them "
    "(explicit schema, no inference), and tumbling (1h), sliding "
    "(1h/30min), and per-user session (30min gap) event-time windows "
    "with watermarks aggregate three branches — tumble/slide drain "
    "through the update-mode foreachBatch parquet ledger "
    "(streaming/sinks.drain_stream_latest), session through an "
    "append memory sink. The tumble oracle is the batch hourly rollup; the slide "
    "oracle expands each row into its duration/slide = 2 windows via "
    "unnest; the session branch runs APPEND mode, whose emission rule "
    "on a drained availableNow stream is exactly 'session end "
    "(last event + gap) <= max(ts) - watermark delay' — the oracle "
    "sessionizes relationally and applies that same cutoff. A hash "
    "match proves the streaming source/window-state/sink path computes "
    "exactly the batch answer (reference: the poll-source -> hourly "
    "archive loop, manager.py:205-248).",
    tags=("streaming", "window"),
)
def st1(spark: SparkSession, sf_dir: str) -> DataFrame:
    src, tag = _scratch(spark, sf_dir, "st1")
    (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("ts", "event_type", "user_id", "value")
        .repartition(8)
        .write.mode("overwrite")
        .parquet(src)
    )

    def stream():
        return spark.readStream.schema(
            "ts TIMESTAMP, event_type STRING, user_id BIGINT, value DOUBLE"
        ).parquet(src)

    def aggs():
        return [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ]

    tumble = tumbling_agg(
        stream(), "ts", "1 hour", ["event_type"], aggs(), watermark="1 hour"
    ).select(
        F.lit("tumble").alias("branch"),
        F.col("win.start").alias("win_start"),
        F.col("event_type").alias("key"),
        "n_events",
        "sum_value",
    )
    slide = sliding_agg(
        stream(), "ts", "1 hour", "30 minutes", ["event_type"], aggs(), watermark="1 hour"
    ).select(
        F.lit("slide").alias("branch"),
        F.col("win.start").alias("win_start"),
        F.col("event_type").alias("key"),
        "n_events",
        "sum_value",
    )
    sess = session_agg(
        stream(), "ts", "30 minutes", ["user_id"], aggs(), watermark="1 hour"
    ).select(
        F.lit("sess").alias("branch"),
        F.col("win.start").alias("win_start"),
        F.col("user_id").cast("string").alias("key"),
        "n_events",
        "sum_value",
    )
    # Tumble/slide drain through the scale-safe update-mode parquet
    # ledger (VERDICT r11 #6: the old complete-mode memory sinks were
    # whitelist-justified by window cardinality, but the whitelist is
    # now unnecessary — changed windows ship to executor-written
    # parquet and the latest-per-window resolve is one keyed shuffle).
    from tw_etl_spark.streaming.sinks import drain_stream_latest

    drain_root, _ = _scratch(spark, sf_dir, "st1drain")
    out_t = drain_stream_latest(
        tumble, ["win_start", "key"],
        os.path.join(drain_root, "t"), f"st1_t_{tag}",
    )
    out_s = drain_stream_latest(
        slide, ["win_start", "key"],
        os.path.join(drain_root, "s"), f"st1_s_{tag}",
    )
    # complete/update latest-resolve is unsupported for session windows
    # (state merge can re-key a session); append's watermark-cutoff
    # emission is pinned in the oracle instead.
    (out_g,) = run_streams_to_memory([(sess, f"st1_g_{tag}", "append")])
    return (
        out_t.unionByName(out_s)
        .unionByName(out_g)
        .orderBy("branch", "win_start", "key")
    )


@register(
    "st2_stream_stateful_gauntlet",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
        WHERE ts IS NOT NULL
    ), s AS (
        SELECT user_id, ts, event_id,
               sum(CASE WHEN prev_ts IS NULL
                     OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
        FROM g
    ), sess AS (
        SELECT user_id, sid, min(ts) AS session_start,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, sid
    )
    SELECT 'sess' AS branch, user_id, session_start AS ts_val, n_events AS n
    FROM sess
    QUALIFY sid < max(sid) OVER (PARTITION BY user_id)
    UNION ALL
    SELECT 'dedup', user_id, CAST(NULL AS TIMESTAMP),
           CAST(count(DISTINCT event_type) AS BIGINT)
    FROM events WHERE ts IS NOT NULL GROUP BY user_id
    UNION ALL
    SELECT 'join', p.user_id, CAST(NULL AS TIMESTAMP), CAST(count(*) AS BIGINT)
    FROM (SELECT user_id, ts FROM events
          WHERE event_type = 'purchase' AND ts IS NOT NULL) p
    JOIN (SELECT user_id, ts FROM events
          WHERE event_type = 'click' AND ts IS NOT NULL) c
      ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    GROUP BY p.user_id
    ORDER BY branch, user_id, ts_val
    """,
    doc="Streaming state in one driver row, three branches over the same "
    "file-source stream: (sess) the 30-minute-gap sessionizer as "
    "applyInPandasWithState keyed state — only CLOSED sessions emit "
    "(streaming/sessions.py), so the oracle drops each user's final "
    "session; (dedup) streaming dropDuplicates on (user_id, "
    "event_type), whose emitted SET equals batch DISTINCT however the "
    "source micro-batches; (join) a stream-stream inner join — clicks "
    "within the hour before each purchase, both sides watermarked, "
    "the event-time range bound making join state evictable. Keyed "
    "state is the API of the R19 retry machine (manager.py:281-441).",
    tags=("streaming", "state", "join", "dedup"),
)
def st2(spark: SparkSession, sf_dir: str) -> DataFrame:
    src, tag = _scratch(spark, sf_dir, "st2")
    (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_type")
        .repartition(8)
        .write.mode("overwrite")
        .parquet(src)
    )

    def stream():
        return spark.readStream.schema(
            "user_id BIGINT, ts TIMESTAMP, event_type STRING"
        ).parquet(src)

    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    )

    # The three streams are independent — start them all, await all
    # (cold wall cost = slowest stream, not the sum).
    sess_raw, dedup_raw, join_raw = run_streams_to_memory(
        [
            (
                sessionize_closed(stream().select("user_id", "ts"), gap_minutes=30),
                f"st2_sess_{tag}",
                "append",
            ),
            (stream().dropDuplicates(["user_id", "event_type"]), f"st2_dedup_{tag}", "append"),
            (joined, f"st2_join_{tag}", "append"),
        ]
    )

    sess = sess_raw.select(
        F.lit("sess").alias("branch"),
        "user_id",
        F.col("session_start").alias("ts_val"),
        F.col("n_events").alias("n"),
    )
    # Streaming exact dedup: the emitted set is first-arrival picks of
    # each (user_id, event_type); the per-user COUNT of that set is
    # batch-deterministic even though which row wins is not.
    dedup = (
        dedup_raw.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("dedup").alias("branch"),
            "user_id",
            _nullts().alias("ts_val"),
            "n",
        )
    )
    ssj = (
        join_raw.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("join").alias("branch"),
            "user_id",
            _nullts().alias("ts_val"),
            "n",
        )
    )

    return (
        sess.unionByName(dedup)
        .unionByName(ssj)
        .orderBy("branch", "user_id", "ts_val")
    )


@register(
    "st3_watermark_late_drop",
    oracle="""
    WITH e AS (
        SELECT ts, event_id, value FROM events WHERE ts IS NOT NULL
    ), a AS (
        SELECT * FROM e WHERE event_id % 4 <> 0
    ), w1 AS (
        -- watermark after run 1: Spark tracks max event time in WHOLE
        -- MILLISECONDS, so the oracle truncates before subtracting.
        SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 45 MINUTE AS w
        FROM a
    ), w2 AS (
        -- final watermark: max over ALL rows seen (the watermark node
        -- sits upstream of the aggregation, so even rows the agg later
        -- drops as late still advance event-time stats).
        SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 45 MINUTE AS w
        FROM e
    ), kept AS (
        SELECT * FROM a
        UNION ALL
        -- batch-B rows survive iff their window is still open at W1:
        -- Spark drops a row when its window END <= current watermark.
        SELECT b.* FROM e b, w1
        WHERE b.event_id % 4 = 0
          AND date_trunc('hour', b.ts) + INTERVAL 1 HOUR > w1.w
    )
    SELECT date_trunc('hour', ts) AS win_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2)     AS sum_value
    FROM kept
    GROUP BY 1
    -- append mode emits a window only once it is closed: end <= final
    -- watermark. Windows still open when the stream drains never emit.
    HAVING win_start + INTERVAL 1 HOUR <= (SELECT w FROM w2)
    ORDER BY win_start
    """,
    doc="Watermark LATE-DATA DROP, driver-scored end to end. The events "
    "table is split deterministically by event_id % 4 into an on-time "
    "batch A and a late batch B. Run 1: an availableNow stream drains "
    "batch A against a checkpoint, advancing the watermark to "
    "max(ts_A) - 45min. Run 2: batch B lands in the source directory "
    "and the SAME checkpoint restarts the query, so Spark recovers the "
    "run-1 watermark from the commit log and DROPS every B row whose "
    "1h tumbling window closed under it (window end <= watermark); "
    "surviving rows aggregate and append-mode emits each window once "
    "its end passes the final watermark. foreachBatch accumulates the "
    "emissions across both runs into a parquet ledger via the "
    "EXACTLY-ONCE sink (streaming/sinks.py: per-batch_id dynamic "
    "partition overwrite, so a replayed batch can never duplicate), "
    "which is the returned batch result. The oracle pins both rules relationally: "
    "the B-row drop against the ms-truncated run-1 watermark and the "
    "final emission cutoff. Reference capability: out-of-order / "
    "lost-time packet arrival handling, convert.sh:60-65.",
    tags=("streaming", "window", "watermark"),
)
def st3(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    root, tag = _scratch(spark, sf_dir, "st3")
    # Deterministic reruns: the checkpoint remembers processed files and
    # the watermark, so a stale scratch tree would make a second call
    # emit nothing. Start from zero every time.
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    ckpt = os.path.join(root, "ckpt")
    out = os.path.join(root, "out")
    stage = os.path.join(root, "stage")
    os.makedirs(src)

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("ts", "event_id", "value")
    )

    def land(batch_df: DataFrame, name: str) -> None:
        _land(batch_df, stage, src, name)

    def drain() -> None:
        """One availableNow pass over src against the shared checkpoint,
        appending every emitted window to the parquet ledger."""
        stream = spark.readStream.schema(
            "ts TIMESTAMP, event_id BIGINT, value DOUBLE"
        ).parquet(src)
        agg = tumbling_agg(
            stream,
            "ts",
            "1 hour",
            [],
            [
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            ],
            watermark="45 minutes",
        ).select(F.col("win.start").alias("win_start"), "n_events", "sum_value")
        q = (
            agg.writeStream.outputMode("append")
            # at-least-once foreachBatch + append would duplicate a
            # replayed batch; the idempotent sink overwrites per
            # batch_id partition instead (streaming/sinks.py)
            .foreachBatch(idempotent_parquet_writer(out))
            .option("checkpointLocation", ckpt)
            .queryName(f"st3_{tag}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    land(e.filter(F.col("event_id") % 4 != 0), "batch_a")
    drain()  # watermark advances to max(ts_A) - 45min, committed
    land(e.filter(F.col("event_id") % 4 == 0), "batch_b")
    drain()  # recovered watermark drops closed-window B rows

    return (
        spark.read.parquet(out)
        .drop("batch_id")
        .orderBy("win_start")
    )


@register(
    "st4_event_time_watchdog",
    oracle="""
    WITH e AS (SELECT user_id, ts FROM events WHERE ts IS NOT NULL),
    spans AS (
        SELECT user_id,
               min(ts) AS t_on,
               max(ts) AS t_done,
               1 + user_id % 3 AS retries,
               (user_id % 5 = 0) AS poll,
               (user_id % 2 = 0) AS has_done,
               CASE WHEN user_id % 4 >= 2 THEN 1 ELSE 0 END AS dl_size
        FROM e GROUP BY user_id
    ),
    gmax AS (SELECT max(ts) AS t_max FROM e),
    st AS (
        -- key state after replaying its (<= 2)-event log, transition
        -- table = streaming/state_machine.py step(): download_done with
        -- empty result stops a poll attempt, exhausts past retries,
        -- else retries; non-empty continues (still active)
        SELECT user_id, retries, poll,
               CASE WHEN NOT has_done THEN TRUE
                    WHEN dl_size <= 0 AND poll THEN FALSE
                    WHEN 2 > retries THEN FALSE
                    ELSE TRUE END AS active,
               CASE WHEN NOT has_done THEN 1
                    WHEN dl_size <= 0 AND poll THEN 0
                    WHEN 2 > retries THEN 0
                    ELSE 2 END AS retry_id,
               CASE WHEN has_done THEN t_done ELSE t_on END AS last_ts
        FROM spans
    ),
    emitted AS (
        SELECT user_id, 1::BIGINT AS seq, 'start' AS action, 1 AS retry_id
        FROM spans
        UNION ALL
        SELECT user_id, 2::BIGINT,
               CASE WHEN dl_size <= 0 AND poll THEN 'stop_empty_poll'
                    WHEN 2 > retries THEN 'exhausted_complete'
                    WHEN dl_size <= 0 THEN 'retry'
                    ELSE 'continue' END,
               CASE WHEN dl_size <= 0 AND poll THEN 0
                    WHEN 2 > retries THEN 0
                    ELSE 2 END
        FROM spans WHERE has_done
        UNION ALL
        -- watchdog fire: an active key fires exactly once, with the
        -- empty-download transition, iff its deadline (ms-floored last
        -- event time + 10 min) is STRICTLY below the final watermark
        -- (ms-floored global max ts - 1 min). Both floors mirror the
        -- engine: Spark tracks event-time stats in whole milliseconds
        -- and fires timers with deadline < watermark (boundary pinned
        -- by tests/test_streaming.py::test_event_time_fire_boundary).
        SELECT s.user_id, CAST(-1 AS BIGINT),
               CASE WHEN s.poll THEN 'stop_empty_poll'
                    WHEN s.retry_id + 1 > s.retries THEN 'exhausted_complete'
                    ELSE 'retry' END,
               CASE WHEN s.poll THEN 0
                    WHEN s.retry_id + 1 > s.retries THEN 0
                    ELSE s.retry_id + 1 END
        FROM st s, gmax g
        WHERE s.active
          AND epoch_ms(s.last_ts) + 600000 < epoch_ms(g.t_max) - 60000
    )
    SELECT user_id, seq, action, CAST(retry_id AS INTEGER) AS retry_id
    FROM emitted ORDER BY user_id, seq
    """,
    doc="Event-time watchdog of the R19 retry machine, driver-scored "
    "end to end — the reference's healthcheck TODO (manager.py:250-266) "
    "as a DETERMINISTIC event-time timer. A crafted per-user event log "
    "is derived from the events table (online at first activity; for "
    "even users a download_done at last activity whose emptiness / "
    "retry budget / poll-ness are user_id-derived, covering every "
    "transition branch), streamed through "
    "retry_machine_stream(event_time=True, watermark='1 minute', "
    "T=10 min) via applyInPandasWithState + EventTimeTimeout under an "
    "availableNow drain. Keys left active whose deadline passed the "
    "final watermark fire exactly once with the empty-download "
    "transition (seq=-1). The oracle replays the transition table AND "
    "the fire rule relationally at the engine's own ms precision, so "
    "keyed state, timer registration, and watermark arithmetic are all "
    "under the cross-engine hash.",
    tags=("streaming", "state", "watchdog", "timer"),
)
def st4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.streaming.state_machine import EVENT_SCHEMA, retry_machine_stream
    from tw_etl_spark.streaming.windows import run_stream_to_memory

    src, tag = _scratch(spark, sf_dir, "st4")
    u = F.col("user_id")
    spans = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_on"), F.max("ts").alias("t_done"))
        .select(
            u.alias("uid"),
            u.cast("string").alias("stream_id"),
            (u % 5 == 0).alias("poll_attempt"),
            (1 + u % 3).cast("int").alias("retries"),
            "t_on",
            "t_done",
        )
    )
    online = spans.select(
        "stream_id",
        F.lit("online").alias("event"),
        F.lit(0).cast("long").alias("size"),
        "poll_attempt",
        "retries",
        F.lit(1).cast("long").alias("seq"),
        F.col("t_on").alias("ts"),
    )
    done = spans.filter(F.col("uid") % 2 == 0).select(
        "stream_id",
        F.lit("download_done").alias("event"),
        F.when(F.col("uid") % 4 >= 2, 1).otherwise(0).cast("long").alias("size"),
        "poll_attempt",
        "retries",
        F.lit(2).cast("long").alias("seq"),
        F.col("t_done").alias("ts"),
    )
    # single parquet file -> single data micro-batch, so the machine
    # sees each key's full log at once and the fire schedule is the
    # pure event-time function the oracle replays
    online.unionByName(done).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    out = retry_machine_stream(
        stream, timeout_ms=600_000, event_time=True, watermark="1 minute"
    )
    return (
        run_stream_to_memory(out, f"st4_{tag}", "append")
        .select(
            F.col("stream_id").cast("bigint").alias("user_id"),
            "seq",
            "action",
            F.col("retry_id").cast("int").alias("retry_id"),
        )
        .orderBy("user_id", "seq")
    )


@register(
    "st5_stream_neardup_dedup",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               list_distinct(
                   list_filter(string_split(text, ' '), t -> t <> '')
               ) AS toks
        FROM documents
    ), ex AS (
        SELECT doc_id AS doc, unnest(toks) AS tk FROM tok
    ), hashes AS (
        SELECT doc, ('0x' || substr(md5(tk), 1, 8))::BIGINT AS h FROM ex
    ), votes AS (
        SELECT doc, g.range AS b,
               sum(CASE WHEN (h >> g.range) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM hashes CROSS JOIN range(32) g
        GROUP BY doc, g.range
    ), sh AS (
        SELECT doc, sum(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END) AS s
        FROM votes GROUP BY doc
    ), sigs AS (
        SELECT d.doc_id, coalesce(sh.s, 0)::BIGINT AS sig
        FROM documents d LEFT JOIN sh ON sh.doc = d.doc_id
    )
    SELECT sig, min(doc_id) AS survivor,
           count(*)::BIGINT AS n_members
    FROM sigs GROUP BY sig HAVING count(*) >= 2
    ORDER BY sig
    """,
    doc="STREAMING near-dup dedup: the portable 32-bit SimHash (dd4p's "
    "exact hash family) computed in-flight on a file-source document "
    "stream, with per-signature survivor state (min doc_id, member "
    "count) maintained by a streaming aggregation drained in UPDATE "
    "mode through the exactly-once foreachBatch parquet sink "
    "(streaming/sinks.drain_stream_latest — the signature table is "
    "DATA-SIZED, so it never transits the driver; VERDICT r10 #1) — "
    "the streaming form of C4-style near-duplicate removal with "
    "DETERMINISTIC survivorship (st2's dropDuplicates branch picks "
    "arbitrary first arrivals; this emits the same survivor however "
    "the source micro-batches). Output is every near-dup cluster "
    "(n_members >= 2); the oracle replays signature, survivor rule, "
    "and member counts relationally.",
    tags=("streaming", "dedup", "simhash", "ext"),
)
def st5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.dedup import simhash_portable_expr
    from tw_etl_spark.streaming.sinks import drain_stream_latest

    src, tag = _scratch(spark, sf_dir, "st5")
    drain_root, _ = _scratch(spark, sf_dir, "st5drain")
    (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(8)
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(
        src
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
    out = drain_stream_latest(clusters, ["sig"], drain_root, f"st5_{tag}")
    return out.filter(F.col("n_members") >= 2).orderBy("sig")


def _st6_oracle() -> str:
    # st6 must land on e6's exact relational answer: the streaming
    # funnel machine and the batch funnel share one oracle.
    from tw_etl_spark.queries.core import _e6_oracle

    return _e6_oracle()


@register(
    "st6_stream_funnel",
    oracle=_st6_oracle(),
    doc="STREAMING funnel (VERDICT r9 #8 — the events-analytics x "
    "streaming cell): e6's ordered view->click->purchase chaining run "
    "as a keyed state machine (streaming/state_machine."
    "funnel_machine_stream via applyInPandasWithState) over a "
    "file-source "
    "event stream, per-user stage timestamps in the checkpointed state "
    "store, one emission per stage advance carrying the exact integer "
    "ms gap. Stage reach counts and exact-integer average gaps "
    "aggregate from the emissions; the oracle is e6's relational form "
    "verbatim, so the hash match pins the state machine against the "
    "batch semantics cross-engine. Split-independence for time-ordered "
    "sources is unit-tested (tests/test_streaming.py).",
    tags=("streaming", "state", "funnel", "events"),
)
def st6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.functions.rounding import exact_round_ratio
    from tw_etl_spark.streaming.state_machine import (
        FUNNEL_EVENT_SCHEMA,
        funnel_machine_stream,
    )
    from tw_etl_spark.streaming.windows import run_stream_to_memory

    src, tag = _scratch(spark, sf_dir, "st6")
    (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_type")
        # single parquet file -> single micro-batch: each key's full log
        # replays in one event-time-ordered pass, making the machine's
        # answer the pure function of event time the oracle replays
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = spark.readStream.schema(FUNNEL_EVENT_SCHEMA).parquet(src)
    emitted = run_stream_to_memory(
        funnel_machine_stream(stream), f"st6_{tag}", "append"
    )
    s = emitted.groupBy("stage").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("gap_ms").alias("gms"),
    )
    return s.select(
        "stage",
        "n_users",
        F.when(F.col("stage") == "1_view", F.lit(None).cast("double"))
        .otherwise(
            exact_round_ratio(F.col("gms"), F.col("n_users") * 1000, 3)
        )
        .alias("avg_gap_s"),
    ).orderBy("stage")


def _st7_oracle() -> str:
    # st7 must land on e7's exact relational answer: the streaming
    # retention machine and the batch cohort table share one oracle.
    from tw_etl_spark.queries.core import _e7_oracle

    return _e7_oracle()


@register(
    "st7_stream_retention",
    oracle=_st7_oracle(),
    doc="STREAMING retention cohorts (the second events-analytics x "
    "streaming cell, beside st6): e7's first-activity-day cohorts as a "
    "keyed state machine (streaming/state_machine."
    "retention_machine_stream via applyInPandasWithState) — the cohort "
    "day latches on first activity, a 256-day offset bitmap (four "
    "longs: constant per-user state) dedups repeat activity, one "
    "emission per NEW (user, active day). The days x days cohort table "
    "aggregates from the emissions with exact-integer retention "
    "fractions; the oracle is e7's relational form verbatim, pinning "
    "the state machine against the batch semantics cross-engine. "
    "Split-independence for time-ordered sources is unit-tested.",
    tags=("streaming", "state", "retention", "events"),
)
def st7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.functions.rounding import exact_round_ratio
    from tw_etl_spark.streaming.state_machine import (
        FUNNEL_EVENT_SCHEMA,
        retention_machine_stream,
    )
    from tw_etl_spark.streaming.windows import run_stream_to_memory

    src, tag = _scratch(spark, sf_dir, "st7")
    (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_type")
        # single parquet file -> single micro-batch: each key's full log
        # replays in one event-time-ordered pass (the st6 contract)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = spark.readStream.schema(FUNNEL_EVENT_SCHEMA).parquet(src)
    em = run_stream_to_memory(
        retention_machine_stream(stream), f"st7_{tag}", "append"
    )
    # the size and activity branches self-join the one memory-sink
    # view; renaming the size-side key avoids the conflicting-attribute
    # trap of joining a view to itself on a same-named column
    sizes = (
        em.filter(F.col("day_offset") == 0)
        .groupBy(F.col("cohort_day").alias("cd"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cohort"))
    )
    g = em.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    return (
        g.join(sizes, g.cohort_day == sizes.cd)
        .select(
            F.timestamp_seconds(F.col("cohort_day") * 86400).alias(
                "cohort_day"
            ),
            "day_offset",
            "n_active",
            exact_round_ratio(
                F.col("n_active"), F.col("n_cohort"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )


def _st8_oracle() -> str:
    # st8 must land on a11's exact batch answer: the stream-maintained
    # sketch and the batch sketch share one oracle.
    from tw_etl_spark.queries import REGISTRY

    return REGISTRY["a11_cms_heavy_hitters"].oracle


@register(
    "st8_stream_cms_heavy_hitters",
    oracle=None,  # registered after import; set below — see _st8_late
    doc="STREAMING Count-Min maintenance (the sketch x streaming cell): "
    "the a11 sketch built as a streaming aggregation — words explode "
    "in-flight, the (r, b) cell counts accumulate in streaming state "
    "(complete mode, kilobytes of state at any stream length — the "
    "mergeable-sketch property IS the streaming-state property), "
    "drained via availableNow. The drained sketch is point-queried for "
    "the batch exact top-20 exactly as a11 does; the oracle is a11's "
    "SQL verbatim, so the hash match proves stream-maintained cells = "
    "batch cells.",
    tags=("streaming", "sketch", "approx", "topk"),
)
def st8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.sketch import cms_counts, cms_estimate
    from tw_etl_spark.streaming.windows import run_streams_to_memory

    src, tag = _scratch(spark, sf_dir, "st8")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    words = stream.select(
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("v")
    )
    sk_stream = cms_counts(words, "v", depth=4, width=256)
    (sketch,) = run_streams_to_memory([(sk_stream, f"st8_{tag}", "complete")])
    sketch = sketch.localCheckpoint()

    batch_words = _t(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("v")
    )
    exact = (
        batch_words.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "v")
        .limit(20)
    )
    est = cms_estimate(exact, sketch, "v", depth=4, width=256)
    return (
        exact.join(est, "v")
        .select(
            F.col("v").alias("word"),
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("exact_cnt"), "word")
    )


# a11's oracle string is defined in queries.relational; import it
# explicitly (no cycle — both modules only depend on the registry) so
# st8's oracle binds correctly even when this module is imported
# directly rather than through all_queries().
from tw_etl_spark.queries import relational as _relational  # noqa: E402,F401

REGISTRY["st8_stream_cms_heavy_hitters"].oracle = _st8_oracle()


@register(
    "st9_stream_scd2_enrich",
    oracle="""
    WITH dim AS (
        SELECT c_custkey AS k, c_mktsegment AS seg,
               TIMESTAMP '2024-01-01 00:00:00' AS vf,
               make_timestamp(2024, 1, 5 + c_custkey % 20, 0, 0, 0.0) AS vt
        FROM customer
        UNION ALL
        SELECT c_custkey, 'UPGRADED-' || c_mktsegment,
               make_timestamp(2024, 1, 5 + c_custkey % 20, 0, 0, 0.0),
               TIMESTAMP '2024-03-01 00:00:00'
        FROM customer
    )
    SELECT d.seg AS segment,
           CAST(count(*) AS BIGINT)                AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           round(sum(CAST(round(e.value * 100, 0) AS BIGINT)) / 100.0, 2)
                                                   AS sum_value
    FROM events e JOIN dim d
      ON e.user_id = d.k AND e.ts >= d.vf AND e.ts < d.vt
    WHERE e.ts IS NOT NULL
    GROUP BY d.seg
    ORDER BY segment
    """,
    doc="STREAMING enrichment against an SCD-2 dimension (the "
    "streaming x temporal-validity intersection): each event joins the "
    "dim VERSION valid at its event time (stream-static join on key + "
    "ts-in-[valid_from, valid_to) — two versions per customer with a "
    "per-key changeover day), the standard way a 100 TB event stream "
    "picks up slowly-changing attributes without reprocessing. The "
    "DATA-SIZED (segment, user) cell aggregation runs IN the stream "
    "and drains in UPDATE mode through the exactly-once foreachBatch "
    "parquet sink (streaming/sinks.drain_stream_latest — per-user "
    "cells are billions of rows at 100 TB, so they never transit the "
    "driver; VERDICT r10 #1); the segment rollup resolves batch-side "
    "from the drained parquet (streaming disallows count-distinct, so "
    "the distinct resolves exactly from the cells). Values sum as "
    "integer CENTS in both engines — the e6 quantization discipline — "
    "so the cross-engine hash never rides a float summation-order "
    "half-boundary. Oracle replays the temporal join relationally.",
    tags=("streaming", "scd2", "join", "temporal"),
)
def st9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.streaming.sinks import drain_stream_latest

    src, tag = _scratch(spark, sf_dir, "st9")
    drain_root, _ = _scratch(spark, sf_dir, "st9drain")
    (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "value")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(src)
    )
    c = _t(spark, sf_dir, "customer")
    change = F.expr("make_timestamp(2024, 1, 5 + c_custkey % 20, 0, 0, 0)")
    dim = (
        c.select(
            F.col("c_custkey").alias("k"),
            F.col("c_mktsegment").alias("seg"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("vf"),
            change.alias("vt"),
        )
        .unionByName(
            c.select(
                F.col("c_custkey").alias("k"),
                F.concat(F.lit("UPGRADED-"), F.col("c_mktsegment")).alias(
                    "seg"
                ),
                change.alias("vf"),
                F.lit("2024-03-01 00:00:00").cast("timestamp").alias("vt"),
            )
        )
    )
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(src)
    joined = stream.join(
        dim,
        (stream.user_id == dim.k)
        & (stream.ts >= dim.vf)
        & (stream.ts < dim.vt),
    )
    cells = joined.groupBy("seg", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
    )
    em = drain_stream_latest(
        cells, ["seg", "user_id"], drain_root, f"st9_{tag}"
    )
    return (
        em.groupBy(F.col("seg").alias("segment"))
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.sum("cents") / 100.0, 2).alias("sum_value"),
        )
        .orderBy("segment")
    )


@register(
    "st10_stream_cdc_scd2_apply",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_totalprice AS p, o_orderdate AS ef,
               CAST(NULL AS DATE) AS et, true AS cur
        FROM orders WHERE o_orderkey % 7 <> 0
    ), upd_a AS (
        SELECT o_orderkey AS k, o_totalprice + 1000.0 AS p,
               DATE '1998-10-01' AS ef
        FROM orders WHERE o_orderkey % 3 = 0
    ), ch_a AS (
        SELECT b.k, b.p AS old_p, b.ef AS old_ef, u.p AS new_p, u.ef AS ch
        FROM base b JOIN upd_a u USING (k) WHERE b.p <> u.p
    ), f1 AS (
        SELECT * FROM base WHERE k NOT IN (SELECT k FROM ch_a)
        UNION ALL
        SELECT k, old_p, old_ef, ch, false FROM ch_a
        UNION ALL
        SELECT k, new_p, ch, CAST(NULL AS DATE), true FROM ch_a
        UNION ALL
        SELECT u.k, u.p, u.ef, CAST(NULL AS DATE), true
        FROM upd_a u WHERE u.k NOT IN (SELECT k FROM base)
    ), upd_b AS (
        -- %9 keys re-send the post-A current payload (a CDC echo):
        -- the merge must drop them as no-ops
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice + 1500.0 END AS p,
               DATE '1998-12-01' AS ef
        FROM orders WHERE o_orderkey % 5 = 0
    ), f1cur AS (SELECT * FROM f1 WHERE cur),
    f1hist AS (SELECT * FROM f1 WHERE NOT cur),
    ch_b AS (
        SELECT b.k, b.p AS old_p, b.ef AS old_ef, u.p AS new_p, u.ef AS ch
        FROM f1cur b JOIN upd_b u USING (k) WHERE b.p <> u.p
    ), f2 AS (
        SELECT * FROM f1cur WHERE k NOT IN (SELECT k FROM ch_b)
        UNION ALL
        SELECT * FROM f1hist
        UNION ALL
        SELECT k, old_p, old_ef, ch, false FROM ch_b
        UNION ALL
        SELECT k, new_p, ch, CAST(NULL AS DATE), true FROM ch_b
        UNION ALL
        SELECT u.k, u.p, u.ef, CAST(NULL AS DATE), true
        FROM upd_b u WHERE u.k NOT IN (SELECT k FROM f1cur)
    )
    SELECT cur                          AS is_current,
           CAST(et AS TIMESTAMP)        AS effective_to,
           CAST(count(*) AS BIGINT)     AS n_rows,
           CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
           CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM f2
    GROUP BY cur, et
    ORDER BY is_current, effective_to
    """,
    doc="STREAMING CDC apply, SCD-2 write side (VERDICT r10 #6): a CDC "
    "update stream drives operators/merge.scd2_merge through "
    "foreachBatch — each micro-batch reads the PREVIOUS committed dim "
    "version (v{batch_id-1}, or the seed for batch 0), folds the delta "
    "in (broadcast delta, base never hash-partitioned), and overwrites "
    "version v{batch_id} — so a foreachBatch replay recomputes from the "
    "same committed input and lands the identical version: exactly-once "
    "by construction (crash-replay unit in tests/test_streaming.py). "
    "Two change batches flow through one checkpoint (st3's land+drain "
    "pattern): batch A (+1000.0, day 1998-10-01) closes/updates %3 "
    "keys and first-inserts the %21 keys missing from the base; batch "
    "B (day 1998-12-01) updates %5 keys, re-sending the post-A payload "
    "for %9 keys (CDC echoes — must no-op). The dim is "
    "dimension-sized by contract (the 100 TB fact side CONSUMES it — "
    "st9); full-version rewrite per batch is the portable snapshot "
    "shape. Oracle replays both merge passes relationally; the final "
    "version's (is_current, effective_to) rollup is hash-compared.",
    tags=("streaming", "cdc", "scd2", "merge"),
)
def st10(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from tw_etl_spark.operators.merge import scd2_merge

    root, tag = _scratch(spark, sf_dir, "st10")
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    ckpt = os.path.join(root, "ckpt")
    out = os.path.join(root, "out")
    seed = os.path.join(root, "seed")
    stage = os.path.join(root, "stage")
    os.makedirs(src)

    o = _t(spark, sf_dir, "orders")
    (
        o.filter(F.col("o_orderkey") % 7 != 0)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.col("o_orderdate").alias("effective_from"),
            F.lit(None).cast("date").alias("effective_to"),
            F.lit(True).alias("is_current"),
        )
        .write.mode("overwrite")
        .parquet(seed)
    )

    def land(batch_df: DataFrame, name: str) -> None:
        _land(batch_df, stage, src, name)

    apply_cdc = scd2_apply_writer(
        spark, seed, out, keys=["o_orderkey"], payload_cols=["o_totalprice"]
    )

    def drain() -> None:
        stream = spark.readStream.schema(
            "o_orderkey BIGINT, o_totalprice DOUBLE, effective_from DATE"
        ).parquet(src)
        q = (
            stream.writeStream.foreachBatch(apply_cdc)
            .option("checkpointLocation", ckpt)
            .queryName(f"st10_{tag}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    land(
        o.filter(F.col("o_orderkey") % 3 == 0).select(
            "o_orderkey",
            (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
            F.lit("1998-10-01").cast("date").alias("effective_from"),
        ),
        "batch_a",
    )
    drain()
    land(
        o.filter(F.col("o_orderkey") % 5 == 0).select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 9 == 0,
                F.col("o_totalprice") + 1000.0,
            )
            .otherwise(F.col("o_totalprice") + 1500.0)
            .alias("o_totalprice"),
            F.lit("1998-12-01").cast("date").alias("effective_from"),
        ),
        "batch_b",
    )
    drain()

    # Resolve the final committed version by scanning out/ for the max
    # v{N} rather than hard-coding v1 (ADVICE r11): trigger/config
    # drift (maxFilesPerTrigger splits, empty batches) would otherwise
    # silently return a stale version. Two drains are still EXPECTED —
    # assert the chain shape loudly instead of assuming it.
    versions = sorted(
        int(d[1:]) for d in os.listdir(out)
        if d.startswith("v") and d[1:].isdigit()
    )
    if not versions or versions != list(range(versions[-1] + 1)):
        raise RuntimeError(
            f"st10: broken SCD-2 version chain in {out}: {versions}"
        )
    final = spark.read.parquet(os.path.join(out, f"v{versions[-1]}"))
    return (
        # timestamp cast: DuckDB's pandas bridge maps DATE to
        # datetime64, Spark to date objects — pin one kind on both sides
        final.withColumn(
            "effective_to", F.col("effective_to").cast("timestamp")
        )
        .groupBy("is_current", "effective_to")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("o_orderkey").cast("bigint").alias("n_keys"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("is_current", "effective_to")
    )


@register(
    "st11_stream_ann_index_append",
    oracle=_ivf_lifecycle_ctes(16, "vec_id % 3 <> 0")
    + _ivf_rank_tail("vec_id < 5", nprobe=2, k=3),
    doc="STREAMING ANN index maintenance — v8p's append lifecycle "
    "driven by Structured Streaming: the persisted IVF index (old "
    "corpus, vec_id % 3 != 0, 16 relational-kmeans lists) is "
    "maintained by a micro-batch stream of new embeddings "
    "(maxFilesPerTrigger=1 → one batch per landed file) through "
    "streaming/sinks.ivf_append_writer: each batch assigns against "
    "the FIXED persisted centroids (deterministic narrow map) and "
    "lands under stream_lists partitionBy(batch_id, list_id) with "
    "dynamic partition overwrite — a replayed batch rewrites exactly "
    "its own partitions (assignment is deterministic), so the sink is "
    "exactly-once without a ledger; the base lists are never touched. "
    "ann_ivf_persisted_topk(stream_appends=True) then queries base ∪ "
    "stream with the same literal-IN list_id pruning on BOTH scans. "
    "The oracle is v8p's lifecycle replay verbatim — the stream path "
    "must land byte-equivalent index state to the batch append.",
    tags=("streaming", "vector", "ann", "index", "delta", "ext"),
)
def st11(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from tw_etl_spark.operators.similarity import (
        ann_ivf_persisted_topk,
        write_ivf_index,
    )
    from tw_etl_spark.streaming.sinks import ivf_append_writer

    root, tag = _scratch(spark, sf_dir, "st11")
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    ckpt = os.path.join(root, "ckpt")
    idx = os.path.join(root, "index")
    stage = os.path.join(root, "stage")
    os.makedirs(src)

    v = _t(spark, sf_dir, "embeddings")
    write_ivf_index(v.filter(F.col("vec_id") % 3 != 0), idx, n_lists=16)

    new = v.filter(F.col("vec_id") % 3 == 0).select("vec_id", "embedding")

    def land(batch_df: DataFrame, name: str) -> None:
        _land(batch_df, stage, src, name)

    land(new.filter(F.col("vec_id") % 2 == 0), "batch_a")
    land(new.filter(F.col("vec_id") % 2 != 0), "batch_b")

    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(ivf_append_writer(spark, idx))
        .option("checkpointLocation", ckpt)
        .queryName(f"st11_{tag}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return ann_ivf_persisted_topk(
        v.filter(F.col("vec_id") < 5), idx, nprobe=2, k=3,
        stream_appends=True,
    ).orderBy("query_id", "rank")


_ST12_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"


@register(
    "st12_stream_lsh_index_maintain",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, list_distinct({_ST12_TOKS}) AS toks FROM documents
    ),
    ex AS (SELECT doc_id AS doc, unnest(toks) AS tk FROM tok),
    sig AS (
        SELECT doc, r.range AS i, min(md5(r.range::VARCHAR || ':' || tk)) AS h
        FROM ex CROSS JOIN range(16) r
        GROUP BY doc, r.range
    ),
    sigarr AS (SELECT doc, list(h ORDER BY i) AS sig FROM sig GROUP BY doc),
    banded AS (
        SELECT doc, g.range AS band,
               md5(array_to_string(
                   list_slice(sig, g.range * 4 + 1, g.range * 4 + 4), ',')) AS bucket
        FROM sigarr CROSS JOIN range(4) g
    ),
    cand AS (
        SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    )
    SELECT c.id_a, c.id_b,
           round(length(list_filter(range(16),
                                    i -> sa.sig[i + 1] = sb.sig[i + 1])) / 16.0,
                 6) AS est_jaccard
    FROM cand c
    JOIN sigarr sa ON sa.doc = c.id_a
    JOIN sigarr sb ON sb.doc = c.id_b
    WHERE length(list_filter(range(16),
                             i -> sa.sig[i + 1] = sb.sig[i + 1])) / 16.0 >= 0.9
      AND (c.id_a % 3 <> 0 OR c.id_b % 3 <> 0)
    ORDER BY id_a, id_b
    """,
    doc="STREAMING maintenance of the pre-banded delta-dedup index — "
    "dd18's chained daily lifecycle driven by Structured Streaming "
    "(the LSH sibling of st11's IVF maintenance): the seed corpus "
    "(doc_id % 3 == 0) persists via write_banded_index; day batches "
    "1 and 2 arrive as a file stream (maxFilesPerTrigger=1, two "
    "availableNow drains pin the day order) through "
    "streaming/sinks.lsh_index_stream_writer — each micro-batch reads "
    "the committed state EXCLUDING its own batch_id (crash-partial "
    "appends invisible to the replay), computes its delta pairs "
    "against seed ∪ earlier batches (only the batch is md5-banded; "
    "history is a pruned columnar scan), lands pairs/batch_id=N and "
    "appends its banded rows (batch_id, band) + signatures (batch_id) "
    "— every write dynamic partition overwrite over deterministic "
    "content: exactly-once without a ledger. The result unions both "
    "days' pairs; the oracle is dd18's full-corpus replay filtered to "
    "batch-1/2-touching pairs, so a hash match proves the STREAMED "
    "chain lands on exactly the whole-corpus answer.",
    tags=("streaming", "dedup", "minhash", "delta", "index", "ext"),
)
def st12(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from tw_etl_spark.operators.dedup import (
        minhash_signatures_portable,
        write_banded_index,
    )
    from tw_etl_spark.streaming.sinks import lsh_index_stream_writer

    root, tag = _scratch(spark, sf_dir, "st12")
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    ckpt = os.path.join(root, "ckpt")
    idx = os.path.join(root, "index")
    stage = os.path.join(root, "stage")
    os.makedirs(src)

    d = _t(spark, sf_dir, "documents")
    write_banded_index(
        minhash_signatures_portable(
            d.filter(F.col("doc_id") % 3 == 0), num_hashes=16
        ),
        idx, num_hashes=16, bands=4,
    )

    def land(batch_df: DataFrame, name: str) -> None:
        _land(batch_df, stage, src, name)

    writer = lsh_index_stream_writer(
        spark, idx, num_hashes=16, bands=4, threshold=0.9
    )

    def drain() -> None:
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(writer)
            .option("checkpointLocation", ckpt)
            .queryName(f"st12_{tag}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    day_cols = ["doc_id", "text"]
    land(d.filter(F.col("doc_id") % 3 == 1).select(*day_cols), "day1")
    drain()
    land(d.filter(F.col("doc_id") % 3 == 2).select(*day_cols), "day2")
    drain()

    return (
        spark.read.parquet(os.path.join(idx, "pairs"))
        .select("id_a", "id_b", "est_jaccard")
        .orderBy("id_a", "id_b")
    )
