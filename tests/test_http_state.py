"""R22 HTTP ingress bridge + R21 poll cadence + R24 state export.

The reference's interactive surface (aiohttp routes, manager.py:205-248),
its per-stream poll loops (manager.py:445-458), and its state snapshot
dual-write (state.py:25-38) — each verified against the Spark-native
analog end to end.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from tw_etl_spark.streaming.state_machine import (
    EXHAUSTED_COMPLETE,
    RETRY,
    START,
    STOP_EMPTY_POLL,
    retry_machine_stream,
)


def _post(url: str, data: bytes = b"") -> dict:
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def _get(url: str) -> dict:
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


# ------------------------------------------------------------------ R22 HTTP


def test_http_bridge_routes_without_spark():
    """Route contract alone: /online, /event validation, /reload hook,
    /state via reader, 404s — no Spark involved."""
    from tw_etl_spark.streaming.http_bridge import HttpPushBridge

    reloaded = []
    with HttpPushBridge(
        state_reader=lambda: {"s1": {"active": True}},
        on_reload=lambda: reloaded.append(1),
    ) as b:
        base = f"http://127.0.0.1:{b.http_port}"
        assert _post(f"{base}/online/twitch_abc") == {
            "ok": True,
            "stream": "twitch_abc",
        }
        assert _post(f"{base}/event", b'{"stream_id":"s1"}')["ok"] is True
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{base}/event", b"{nope")
        assert e.value.code == 400
        assert _get(f"{base}/state") == {"state": {"s1": {"active": True}}}
        assert _post(f"{base}/reload")["ok"] is True and reloaded == [1]
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{base}/nope")
        assert e.value.code == 404


def test_http_bridge_drives_machine_to_exhaustion(spark):
    """The reference's E2 lifecycle over real HTTP: POST /online/{s}
    starts the machine, posted completion events drive it to
    exhaustion — mirroring test_push_socket_drives_machine_to_exhaustion
    with the bridge terminating the HTTP contract."""
    from tw_etl_spark.streaming.http_bridge import HttpPushBridge
    from tw_etl_spark.streaming.sources import push_events_stream

    with HttpPushBridge() as b:
        base = f"http://127.0.0.1:{b.http_port}"
        d = tempfile.mkdtemp(prefix="http_ck_")
        q = (
            retry_machine_stream(push_events_stream(spark, port=b.line_port))
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("http_sm")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        try:
            # wait for the socket source to connect to the bridge
            deadline = time.time() + 30
            while time.time() < deadline and b.push_line("noise") == 0:
                time.sleep(0.2)
            assert b.push_line("noise") > 0, "socket source never connected"

            _post(f"{base}/online/s1")
            for seq in (1, 2, 3):
                _post(
                    f"{base}/event",
                    json.dumps(
                        {
                            "stream_id": "s1",
                            "event": "download_done",
                            "size": 0,
                            "seq": seq,
                        }
                    ).encode(),
                )
            deadline = time.time() + 90
            rows = []
            while time.time() < deadline:
                rows = spark.sql(
                    "SELECT * FROM http_sm WHERE stream_id = 's1'"
                ).collect()
                if len(rows) >= 4:
                    break
                time.sleep(0.3)
            assert len(rows) >= 4, f"only {len(rows)} actions: {rows}"
            actions = [r.action for r in sorted(rows, key=lambda r: r.seq)]
            assert actions == [START, RETRY, RETRY, EXHAUSTED_COMPLETE]
        finally:
            q.stop()
            shutil.rmtree(d, ignore_errors=True)


# ------------------------------------------------------------------ R21 poll


def test_poll_ticks_cadence_counts(spark):
    """N keys x interval T over a tick span: every key fires exactly
    span/T times, consecutive fires are exactly T apart, and staggered
    phases equal xxhash64(key) % T (the deterministic jitter twin)."""
    from tw_etl_spark.streaming.sources import poll_ticks

    keys = ["s1", "s2", "s3", "s4", "s5"]
    span, interval = 600, 60
    rate = spark.range(span).select(
        F.col("id").alias("value"), F.current_timestamp().alias("timestamp")
    )
    out = poll_ticks(rate, keys, interval).collect()
    per_key: dict[str, list[int]] = {}
    for r in out:
        assert r.event == "online" and r.poll_attempt is True
        per_key.setdefault(r.stream_id, []).append(r.seq)
    assert set(per_key) == set(keys)
    phases = {}
    for k, seqs in per_key.items():
        seqs.sort()
        assert len(seqs) == span // interval, (k, seqs)
        assert all(b - a == interval for a, b in zip(seqs, seqs[1:])), k
        phases[k] = seqs[0] % interval
    expected_phase = {
        r.stream_id: r.p
        for r in spark.createDataFrame([(k,) for k in keys], ["stream_id"])
        .select("stream_id", F.pmod(F.xxhash64("stream_id"), F.lit(interval)).alias("p"))
        .collect()
    }
    assert phases == expected_phase
    # un-staggered: every key fires on the same ticks (the herd)
    flat = poll_ticks(rate, keys, interval, stagger=False).collect()
    assert {r.seq % interval for r in flat} == {0}


def test_poll_ticks_drive_stop_empty_poll(spark):
    """Reference poll loop semantics end to end: poll tick -> START,
    empty download -> STOP_EMPTY_POLL (no retry ladder for poll
    attempts, manager.py:378-384) — via file replay through the real
    streaming machine."""
    from tw_etl_spark.streaming.sources import poll_ticks

    keys = ["p1", "p2"]
    rate = spark.range(120).select(
        F.col("id").alias("value"), F.current_timestamp().alias("timestamp")
    )
    ticks = poll_ticks(rate, keys, 60)  # 2 ticks per key
    done = ticks.select(
        "stream_id",
        F.lit("download_done").alias("event"),
        F.lit(0).cast("long").alias("size"),
        F.lit(True).alias("poll_attempt"),
        F.lit(3).alias("retries"),
        (F.col("seq") + 1).alias("seq"),  # completion follows its tick
        "ts",
    )
    d = tempfile.mkdtemp(prefix="poll_replay_")
    try:
        events = ticks.unionByName(done)
        events.write.mode("overwrite").parquet(os.path.join(d, "in"))
        stream = spark.readStream.schema(events.schema).parquet(os.path.join(d, "in"))
        q = (
            retry_machine_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("poll_sm")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM poll_sm").collect()
        for k in keys:
            acts = [
                r.action
                for r in sorted(
                    (r for r in rows if r.stream_id == k), key=lambda r: r.seq
                )
            ]
            # tick1: START; done1: STOP_EMPTY_POLL; tick2: START again; done2 stops
            assert acts == [START, STOP_EMPTY_POLL, START, STOP_EMPTY_POLL], (k, acts)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ------------------------------------------------------------------ R24 state


def test_state_export_snapshot_roundtrip(spark):
    """Run the machine to a mid-flight state over file replay, then read
    the checkpointed state store as a batch (GET /state twin) and export
    it as the reference-shaped JSON document."""
    from tw_etl_spark.streaming.state_export import (
        export_state_json,
        read_machine_state,
        state_snapshot,
    )

    d = tempfile.mkdtemp(prefix="state_exp_")
    try:
        rows = [
            # s1: started then one empty retry -> active, retry_id=2
            ("s1", "online", 0, False, 3, 0),
            ("s1", "download_done", 0, False, 3, 1),
            # s2: just started -> active, retry_id=1
            ("s2", "online", 0, False, 5, 0),
        ]
        events = spark.createDataFrame(
            rows, "stream_id string, event string, size long, poll_attempt boolean, retries int, seq long"
        ).withColumn("ts", F.current_timestamp())
        events.write.mode("overwrite").parquet(os.path.join(d, "in"))
        stream = spark.readStream.schema(events.schema).parquet(os.path.join(d, "in"))
        ck = os.path.join(d, "ck")
        q = (
            retry_machine_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("exp_sm")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        st = {r.stream_id: r for r in read_machine_state(spark, ck).collect()}
        assert set(st) == {"s1", "s2"}
        assert (st["s1"].active, st["s1"].retry_id, st["s1"].retries) == (True, 2, 3)
        assert (st["s2"].active, st["s2"].retry_id, st["s2"].retries) == (True, 1, 5)

        snap = state_snapshot(spark, ck)
        assert snap["s2"]["retry_id"] == 1

        out = os.path.join(d, "state.json")
        n = export_state_json(spark, ck, out)
        assert n == 2
        with open(out) as f:
            doc = json.load(f)
        assert doc == snap  # file twin == live GET /state shape
    finally:
        shutil.rmtree(d, ignore_errors=True)
