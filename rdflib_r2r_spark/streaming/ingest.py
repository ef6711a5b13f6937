"""Streaming KG construction: file-source page streams compiled to triple
streams with the SAME mapping compiler as batch (the compile is stateless
select/explode/filter, so it is streaming-safe), plus watermark + windowed
aggregations for late events.

Scale notes: the file source tracks processed files in the checkpoint
location, giving exactly-once triple emission per input file; downstream
bucketed parquet sinks append per micro-batch. Stream-stream joins and
referencing-object maps are deliberately NOT supported in streaming mode —
materialize the parent side as a batch dimension first (broadcast join
against a static DataFrame is streaming-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rdflib_r2r_spark.compiler import SparkMappingCompiler
from rdflib_r2r_spark.mapping import TriplesMap

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_documents(spark: SparkSession, path: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_triples(spark: SparkSession, pages_stream: DataFrame,
                   tmaps: list[TriplesMap], source_name: str) -> DataFrame:
    """Compile join-free triples-maps over a streaming logical source."""
    for tm in tmaps:
        for pom in tm.pomaps:
            for obj in pom.objects:
                if obj.parent_triples_map is not None:
                    raise ValueError(
                        "referencing-object maps need a static parent side in "
                        "streaming mode; materialize the parent first"
                    )
    comp = SparkMappingCompiler(spark, {source_name: pages_stream})
    return comp.compile(tmaps)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Late-data-tolerant windowed counts: watermark bounds state, window
    tumbles on event time."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, query_name: str):
    """Drain everything currently available into an in-memory table and
    stop — deterministic for tests and backfills."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append" if not _has_agg(stream_df) else "complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _has_agg(df: DataFrame) -> bool:
    return not df.isStreaming or df._jdf.queryExecution().analyzed().toString().startswith("Aggregate")


# -- streaming exact dedup ---------------------------------------------------


def dedup_stream(docs: DataFrame, text_col: str = "text",
                 ts_col: str | None = None, within: str | None = None) -> DataFrame:
    """First-occurrence streaming exact dedup on the normalized-text
    fingerprint (same md5-of-tokens key as the batch operator, so stream
    and batch agree on what counts as a duplicate).

    With ``ts_col``+``within`` the dedup state is WATERMARK-BOUNDED
    (`dropDuplicatesWithinWatermark`): a duplicate arriving more than
    ``within`` after the first copy is re-emitted, but state stays O(docs
    per window) — the only shape that survives an unbounded 100-TB/day
    stream.  Without a timestamp the plain `dropDuplicates` keeps ALL
    fingerprints in state forever: exact across the whole stream, fine for
    bounded backfills, documented footgun otherwise.
    """
    from rdflib_r2r_spark.operators.textstats import tokens_col

    fp = F.md5(F.concat_ws(" ", tokens_col(F.col(text_col))))
    with_fp = docs.withColumn("fingerprint", fp)
    if ts_col and within:
        return (
            with_fp.withWatermark(ts_col, within)
            .dropDuplicatesWithinWatermark(["fingerprint"])
        )
    return with_fp.dropDuplicates(["fingerprint"])


# -- stateful sessionization (applyInPandasWithState) ------------------------

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_SESSION_STATE_SCHEMA = "start long, last long, n long"  # epoch micros


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "0 seconds") -> DataFrame:
    """Gap-based sessionization as a CUSTOM STATEFUL streaming operator
    (`applyInPandasWithState`, Arrow-batched): per user, consecutive events
    closer than ``gap`` form one session; a session closes either when a
    later event in the same batch exceeds the gap (emitted immediately) or
    when the event-time watermark passes session_end + gap (EventTimeTimeout
    fires and flushes the open session).

    The batch twin is q_window_session's `lag`-over-window sessionization —
    same gap rule — so stream output is verifiable against a batch query.

    Scale: state is ONE (start, last, n) row per active user, keyed-state
    store partitioned by user_id; Arrow transfers per micro-batch; skewed
    hot users cost one group each, not a shuffle storm.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = _duration_us(gap)

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id],
                 "session_start": [pd.Timestamp(start, unit="us")],
                 "session_end": [pd.Timestamp(last, unit="us")],
                 "n_events": [n]}
            )
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(v) for v in pdf["ts"].astype("int64") // 1000)
        ts.sort()
        if not ts:
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0], 0
        closed = []
        for t in ts:
            if t - last > gap_us:
                closed.append((start, last, n))
                start, last, n = t, t, 0
            else:
                # late-but-in-watermark event older than the stored session
                # end must not regress it (a regressed end would let the
                # next event split the session early, diverging from the
                # batch lag-window twin) — only ever advance the end.
                last = max(last, t)
            n += 1
        state.update((start, last, n))
        # fire when the watermark passes the open session's gap deadline
        state.setTimeoutTimestamp((last + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {"user_id": [user_id] * len(closed),
                 "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                 "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                 "n_events": [n for _, _, n in closed]}
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_SCHEMA, _SESSION_STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_us(text: str) -> int:
    n, unit = text.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(n) * mult * 1_000_000
