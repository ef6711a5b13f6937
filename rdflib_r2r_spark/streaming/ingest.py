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
