"""Push-event streaming source (R22): the socket analog of the
reference's HTTP push entry point.

The reference's stream manager runs an HTTP server whose
``POST /online/{stream}`` route schedules a download attempt with
``poll_attempt=False`` (/root/reference/stream_manager/src/
stream_manager/manager.py:163-176 online_handler; route table at
manager.py:205-248). The Spark-native analog is a socket text stream of
signal lines feeding :func:`~tw_etl_spark.streaming.state_machine.
retry_machine_stream`. Two line forms are accepted:

- ``online/<stream_id>`` — a bare push signal, the ``POST`` path analog
  (event=``online``, ``poll_attempt=False``, like online_handler).
- a JSON object with EVENT_SCHEMA fields — a full event, e.g. a
  ``download_done`` completion carrying ``size``/``seq``.

Parsing is pure JVM expressions (``from_json`` + ``regexp_extract``) —
no Python in the per-line path. The socket source is Spark's
test/dev-grade push transport (at-most-once, no offsets); in production
the same ``parse_push_lines`` column logic applies unchanged to a Kafka
``value`` stream, which is the durable equivalent of the reference's
HTTP listener.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tw_etl_spark.streaming.state_machine import EVENT_SCHEMA, ONLINE


def parse_push_lines(lines: DataFrame, default_retries: int = 3) -> DataFrame:
    """Parse a ``value: string`` line stream into EVENT_SCHEMA rows.

    Missing JSON fields default like the reference's online_handler:
    ``event=online``, ``poll_attempt=False`` (push, not poll),
    ``retries=default_retries`` (the manager's ``retry_count`` config).
    Unparseable lines are dropped (the reference logs-and-ignores
    unconfigured streams, manager.py:172-174).
    """
    ts = F.col("timestamp") if "timestamp" in lines.columns else F.current_timestamp()
    j = F.from_json(F.col("value"), EVENT_SCHEMA)
    path_id = F.regexp_extract(F.col("value"), r"^/?online/(\S+)\s*$", 1)
    stream_id = F.when(F.col("value").startswith("{"), j["stream_id"]).otherwise(
        path_id
    )
    return (
        lines.select(
            stream_id.alias("stream_id"),
            F.coalesce(j["event"], F.lit(ONLINE)).alias("event"),
            F.coalesce(j["size"], F.lit(0)).alias("size"),
            F.coalesce(j["poll_attempt"], F.lit(False)).alias("poll_attempt"),
            F.coalesce(j["retries"], F.lit(default_retries)).alias("retries"),
            F.coalesce(j["seq"], F.lit(0)).alias("seq"),
            F.coalesce(j["ts"], ts).alias("ts"),
        )
        .filter(F.col("stream_id").isNotNull() & (F.col("stream_id") != ""))
    )


def poll_ticks(
    rate: DataFrame,
    stream_ids: list[str],
    interval_sec: int,
    default_retries: int = 3,
    stagger: bool = True,
) -> DataFrame:
    """Per-key poll cadence (R21): turn a 1 Hz tick column into one
    EVENT_SCHEMA poll event per stream every ``interval_sec`` seconds.

    The reference schedules one asyncio loop per stream that sleeps a
    random initial jitter, then fires ``try_stream(poll_attempt=True)``
    every ``poll_interval`` seconds (manager.py:445-458; default 240 s,
    manager.py:97). The Spark form is declarative: a rate source (or
    any monotone ``value`` tick column) cross-joined with the bounded
    stream catalog, keeping only ticks on each key's cadence:

        fire(key, t)  <=>  (t - phase(key)) % interval == 0

    ``stagger`` derives phase(key) = xxhash64(key) % interval — the
    deterministic twin of the reference's random jitter
    (manager.py:446-447): keys spread uniformly across the interval so
    each micro-batch carries ~|keys|/interval events instead of a
    thundering herd, but the schedule is reproducible (same keys, same
    phases, any restart — which random jitter is not).

    Works unchanged over ``spark.readStream.format("rate")`` (its
    ``value`` increments once per second at rowsPerSecond=1) and over a
    batch ``range`` for equivalence tests. The catalog is a plan-time
    literal array like every other bounded config here (#streams rows,
    the reference's own config.yml scale).
    """
    ids = F.array(*[F.lit(s) for s in stream_ids])
    e = rate.select(
        F.col("timestamp").alias("ts"),
        F.col("value").alias("tick"),
        F.explode(ids).alias("stream_id"),
    )
    if stagger:
        phase = F.pmod(F.xxhash64("stream_id"), F.lit(interval_sec))
    else:
        phase = F.lit(0)
    return e.filter(F.pmod(F.col("tick") - phase, F.lit(interval_sec)) == 0).select(
        "stream_id",
        F.lit(ONLINE).alias("event"),
        F.lit(0).cast("long").alias("size"),
        F.lit(True).alias("poll_attempt"),
        F.lit(default_retries).alias("retries"),
        F.col("tick").alias("seq"),
        "ts",
    )


def poll_events_stream(
    spark: SparkSession,
    stream_ids: list[str],
    interval_sec: int,
    default_retries: int = 3,
    stagger: bool = True,
) -> DataFrame:
    """Streaming poll-tick source: rate source at 1 row/s through
    :func:`poll_ticks`. Compose with the retry machine exactly like the
    push source::

        actions = retry_machine_stream(
            poll_events_stream(spark, ids, interval_sec=240))
    """
    rate = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    return poll_ticks(
        rate,
        stream_ids,
        interval_sec,
        default_retries=default_retries,
        stagger=stagger,
    )


def push_events_stream(
    spark: SparkSession,
    host: str = "127.0.0.1",
    port: int = 9999,
    default_retries: int = 3,
) -> DataFrame:
    """``readStream.format("socket")`` → EVENT_SCHEMA push-event stream.

    Compose with the state machine exactly as the reference composes its
    HTTP listener with ``try_stream``::

        actions = retry_machine_stream(push_events_stream(spark, port=p))
    """
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .option("includeTimestamp", "true")
        .load()
    )
    return parse_push_lines(raw, default_retries=default_retries)
