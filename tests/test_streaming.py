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


def test_dedup_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "docs_dup")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # replicate a slice so the stream definitely contains duplicates
    dup = docs.limit(20)
    docs.unionByName(dup).repartition(4).write.parquet(src)

    stream = ingest.stream_documents(spark, src, max_files_per_trigger=2)
    q = ingest.run_available_now(
        ingest.dedup_stream(stream), str(tmp_path / "ckpt_dd"), "dd_stream"
    )
    got = spark.sql("SELECT fingerprint FROM dd_stream")
    batch = ingest.dedup_stream(spark.read.parquet(src)).select("fingerprint")
    # first-occurrence semantics: same distinct fingerprint set, no dups
    assert got.count() == got.distinct().count() == batch.count()
    assert got.exceptAll(batch).count() == 0


def test_sessionize_stream_stateful(spark, tmp_path):
    import datetime as dt

    import pandas as pd

    base = dt.datetime(2026, 1, 1, 10, 0, 0)

    def ev(eid, uid, minutes):
        return (eid, base + dt.timedelta(minutes=minutes), uid, "click", 1.0, "{}")

    src = str(tmp_path / "sess_in")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    # batch 1: user 1 has two sessions split by a 120-min gap — the first
    # closes INTRA-batch; the second stays open. user 2 stays open.
    spark.createDataFrame(
        [ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 130), ev(4, 2, 5)], schema
    ).coalesce(1).write.parquet(src)

    out = str(tmp_path / "sess_out")

    def run_once():
        # parquet sink (not memory): supports restart from the checkpoint,
        # which phase 2 needs to resume the keyed state
        q = (
            ingest.sessionize_stream(
                ingest.stream_events(spark, src), gap="30 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt_s"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got1 = spark.read.parquet(out).toPandas().sort_values("user_id")
    # two rows: user 1's first session closes INTRA-batch (the 130-min event
    # exceeds the gap), and user 2's session is flushed by EventTimeTimeout
    # in the follow-up no-data batch (watermark = 130 min > 5 + 30 min
    # deadline). user 1's second session (deadline 160 min) stays open.
    assert len(got1) == 2
    r1, r2 = got1.iloc[0], got1.iloc[1]
    assert r1["user_id"] == 1 and r1["n_events"] == 2
    assert r1["session_start"] == pd.Timestamp(base)
    assert r1["session_end"] == pd.Timestamp(base + dt.timedelta(minutes=10))
    assert r2["user_id"] == 2 and r2["n_events"] == 1

    # batch 2 (same checkpoint): a far-future flush event advances the
    # watermark past the remaining open session's gap deadline ->
    # EventTimeTimeout fires and flushes user 1's second session
    spark.createDataFrame(
        [ev(99, 99, 60 * 24)], schema
    ).coalesce(1).write.parquet(src, mode="append")
    run_once()
    got2 = spark.read.parquet(out).toPandas()
    new = got2.merge(got1, how="outer", indicator=True)
    new = new[new["_merge"] == "left_only"]
    flushed = {(int(r["user_id"]), int(r["n_events"]))
               for _, r in new.iterrows()}
    assert (1, 1) in flushed
    assert pd.Timestamp(base + dt.timedelta(minutes=130)) in set(
        new["session_start"]
    )


def test_sessionize_late_event_does_not_regress_session_end(spark, tmp_path):
    # A late-but-within-watermark event older than the stored session end
    # must not pull the end backwards: with end=20min and gap=30min, a late
    # event at 5min followed by one at 45min still belongs to ONE session
    # (45-20=25 <= gap). A regressed end (20 -> 5) would wrongly split it.
    import datetime as dt

    import pandas as pd

    base = dt.datetime(2026, 1, 1, 10, 0, 0)

    def ev(eid, uid, minutes):
        return (eid, base + dt.timedelta(minutes=minutes), uid, "click", 1.0, "{}")

    src = str(tmp_path / "late_in")
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    spark.createDataFrame([ev(1, 1, 0), ev(2, 1, 20)], schema) \
        .coalesce(1).write.parquet(src)

    out = str(tmp_path / "late_out")

    def run_once():
        q = (
            ingest.sessionize_stream(
                ingest.stream_events(spark, src), gap="30 minutes",
                watermark="2 hours",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt_late"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # batch 1: open session (0..20), nothing emitted

    # batch 2: late event at 5min (within the 2h watermark), then 45min,
    # plus a far-future event that advances the watermark so the session
    # flushes via EventTimeTimeout
    spark.createDataFrame(
        [ev(3, 1, 5), ev(4, 1, 45), ev(99, 99, 60 * 48)], schema
    ).coalesce(1).write.parquet(src, mode="append")
    run_once()

    got = spark.read.parquet(out).toPandas()
    u1 = got[got["user_id"] == 1]
    assert len(u1) == 1, f"session wrongly split: {u1}"
    r = u1.iloc[0]
    assert r["session_start"] == pd.Timestamp(base)
    assert r["session_end"] == pd.Timestamp(base + dt.timedelta(minutes=45))
    assert r["n_events"] == 4
