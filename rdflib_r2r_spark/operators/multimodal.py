"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image_meta`` parses a deterministic fake header; real pixel decode
sits behind ``decode_pixels`` which raises NotImplementedError. The
Spark-side plumbing — binary schema, mapInPandas batching, UDF signature,
partition behavior — is real and tested; swapping the stub for PIL/ffmpeg
is a worker-side change only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMG_MAGIC = b"FIMG"

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def fake_image_col(doc_id, text) -> "F.Column":
    """Deterministic synthetic 'image': FIMG | w | h | payload. Width/height
    derived from doc_id so metadata extraction is verifiable."""
    w = (doc_id % 64 + 1) * 10
    h = (doc_id % 48 + 1) * 10
    header = F.concat(
        F.lit(IMG_MAGIC.decode("latin1")),
        F.lpad(w.cast("string"), 5, "0"),
        F.lpad(h.cast("string"), 5, "0"),
    )
    return F.encode(F.concat(header, F.md5(text)), "UTF-8")


def attach_fake_images(docs: DataFrame) -> DataFrame:
    return docs.withColumn("image", fake_image_col(F.col("doc_id"), F.col("text")))


def decode_image_meta(df: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction: Arrow batches in, Arrow batches out.
    Vectorized pandas ops only — no per-row Python."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf["image"].map(bytes)
            s = raw.map(lambda b: b.decode("latin1"))
            ok = s.str.startswith(IMG_MAGIC.decode("latin1"))
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.to_numeric(s.str.slice(4, 9), errors="coerce").where(ok).astype("Int32"),
                    "height": pd.to_numeric(s.str.slice(9, 14), errors="coerce").where(ok).astype("Int32"),
                    "n_bytes": raw.map(len).astype("int64"),
                    "format": pd.Series("fimg", index=pdf.index).where(ok, "unknown"),
                }
            )
            yield out

    return df.select("doc_id", "image").mapInPandas(fn, IMAGE_META_SCHEMA)


def decode_pixels(df: DataFrame) -> DataFrame:
    """Real image decode — requires an image library not present in this
    container. The distributed plumbing is decode_image_meta's; only the
    per-batch body changes."""
    raise NotImplementedError(
        "pixel decode requires PIL/opencv in the executor image; "
        "use decode_image_meta for the metadata path"
    )


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing stub: emits (doc_id, frame_idx) rows for
    a deterministic fake frame count (n_bytes // 16), sampled every_n.
    Real ffmpeg extraction would replace the frame-count source only."""
    n_frames = (F.length(F.col("image")) / F.lit(16)).cast("int")
    return df.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
