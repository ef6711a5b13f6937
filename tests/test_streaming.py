"""Structured Streaming: streaming triple emission equals the batch dump;
watermarked windowed aggregation over the events stream."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from rdflib_r2r_spark.streaming import ingest
from rdflib_r2r_spark import terms
from rdflib_r2r_spark.compiler import SparkMappingCompiler
from rdflib_r2r_spark.mapping import (
    LogicalSource, PredicateObjectMap, SubjectMap, TermMap, TriplesMap, const_iri,
)

SF = "/root/testdata/sf0.001"


def _doc_tmap() -> TriplesMap:
    return TriplesMap(
        name="documents",
        source=LogicalSource(table="documents"),
        subject_map=SubjectMap(template="http://ex.org/doc/{doc_id}", classes=("http://ex.org/Document",)),
        pomaps=(
            PredicateObjectMap(
                predicates=(const_iri("http://ex.org/lang"),),
                objects=(TermMap(column="lang"),),
            ),
            PredicateObjectMap(
                predicates=(const_iri("http://ex.org/nchars"),),
                objects=(TermMap(column="n_chars", datatype=terms.XSD_INTEGER),),
            ),
        ),
    )


def test_streaming_triples_match_batch(spark, tmp_path):
    # stage the parquet into a dir the file source can watch
    src = str(tmp_path / "docs_in")
    spark.read.parquet(f"{SF}/documents.parquet").repartition(4).write.parquet(src)

    stream = ingest.stream_documents(spark, src, max_files_per_trigger=2)
    assert stream.isStreaming
    triples_stream = ingest.stream_triples(spark, stream, [_doc_tmap()], "documents")
    q = ingest.run_available_now(triples_stream, str(tmp_path / "ckpt"), "t_stream")
    got = spark.sql("SELECT * FROM t_stream")

    batch = SparkMappingCompiler(
        spark, {"documents": spark.read.parquet(src)}
    ).compile([_doc_tmap()])
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0


def test_streaming_rejects_ref_object_maps(spark, tmp_path):
    tmap = TriplesMap(
        name="d",
        source=LogicalSource(table="d"),
        subject_map=SubjectMap(template="http://x/{doc_id}"),
        pomaps=(
            PredicateObjectMap(
                predicates=(const_iri("http://x/p"),),
                objects=(TermMap(parent_triples_map="other"),),
            ),
        ),
    )
    stream = ingest.stream_documents(spark, str(tmp_path))
    with pytest.raises(ValueError, match="referencing-object"):
        ingest.stream_triples(spark, stream, [tmap], "d")


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "events_in")
    spark.read.parquet(f"{SF}/events.parquet").repartition(3).write.parquet(src)
    stream = ingest.stream_events(spark, src)
    agg = ingest.windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory").queryName("ev_win")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM ev_win").toPandas()
    # append mode only emits windows sealed by the watermark; verify those
    # against the batch computation restricted to the same windows
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .toPandas()
    )
    merged = got.merge(batch, on=["window_start", "event_type"], suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert got["window_start"].nunique() >= 1
