"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested — schema, partitioning,
batch shapes, UDF signatures. The actual codecs (image decode, audio
resample, video frame extraction) are STUBBED: the container ships no
imaging/audio libraries, so ``decode_image`` raises NotImplementedError
unless a decoder is importable, and ``fake_feature_extractor`` provides a
deterministic md5-derived stand-in so the pipeline is end-to-end testable.

Design for 100 TB of media:
- binary payloads live in their own column so column pruning skips them for
  metadata-only queries (parquet reads never touch the blob pages);
- ``mapInPandas`` streams Arrow batches — bounded memory per task no matter
  how large the table; ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds rows per batch and ``repartition`` before the decode controls
  parallelism;
- feature extraction emits fixed-width ``array<float>`` embeddings that feed
  the similarity operators (operators/similarity.py) directly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("mime_type", StringType()),
        StructField("content", BinaryType()),
        StructField(
            "metadata",
            StructType(
                [
                    StructField("source_url", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                    StructField("size_bytes", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 64

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType()),
        StructField("size_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_image(content: bytes):
    """Real decoder slot. STUB: no imaging library is shipped in this
    container; plug Pillow/torchvision here on a real cluster."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - the expected path here
        raise NotImplementedError(
            "image decoding requires an imaging library (e.g. Pillow); "
            "not available in this environment"
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(content))


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic md5-derived pseudo-embedding (stands in for a real
    encoder; stable across runs/engines for testing)."""
    out: list[float] = []
    i = 0
    while len(out) < dim:
        h = hashlib.md5(content + i.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 * 2.0 - 1.0 for b in h)
        i += 1
    return [float(x) for x in out[:dim]]


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Real plumbing: partition-parallel ``mapInPandas`` with bounded batches;
    the per-item transform calls the (stubbed) encoder.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "size_bytes": contents.map(lambda b: len(b) if b is not None else 0).astype(
                        "int64"
                    ),
                    "content_hash": contents.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "features": contents.map(
                        lambda b: _fake_features(bytes(b)) if b is not None else None
                    ),
                }
            )

    cols = media.select("media_id", "media_type", "content")
    return cols.mapInPandas(_extract, FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_n_bytes: int = 1 << 16) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits one row per pseudo-frame
    (offset markers over the blob). The real frame decoder slots into the
    same iterator; the exploded shape, ordering column, and partitioning are
    what production code needs to be correct at scale."""
    frame_schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("frame_index", IntegerType()),
            StructField("frame_offset", LongType()),
            StructField("frame_hash", StringType()),
        ]
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_index": [], "frame_offset": [], "frame_hash": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                blob = bytes(content)
                for idx, off in enumerate(range(0, max(len(blob), 1), every_n_bytes)):
                    chunk = blob[off : off + every_n_bytes]
                    rows["media_id"].append(mid)
                    rows["frame_index"].append(idx)
                    rows["frame_offset"].append(off)
                    rows["frame_hash"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "content")
        .mapInPandas(_frames, frame_schema)
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — column pruning means the binary pages are
    never read (verify via .explain: ReadSchema excludes `content`)."""
    return media.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.sum("metadata.size_bytes").alias("total_bytes"),
        F.avg("metadata.size_bytes").alias("avg_bytes"),
    )
