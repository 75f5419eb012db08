"""Multimodal column plumbing (north-star extension).

Images/audio/video ride as opaque ``binary`` columns with typed metadata —
the same pattern the reference uses for PDFs (whole files staged then parsed
per page, /root/reference/backend/routers/upload.py:13-105 +
backend/process/parsing.py:171-218). The Spark-side plumbing (schemas,
``binaryFile`` scans, Arrow-batched mapInPandas, partition discipline) is real
and tested; the *decoders* are stubbed behind ``DecoderRegistry`` because the
image/audio libraries are not in this container — a production deployment
registers real ones (PIL/torchaudio/ffmpeg) with the same signatures.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video|pdf
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("source_path", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def read_media_dir(spark, path: str) -> DataFrame:
    """S3-analog for media: recursive binaryFile scan → MEDIA_SCHEMA.

    At 100 TB binaryFile splits per file; tiny-file corpora should be
    compacted into parquet (content as binary column) first — this reader
    produces exactly that layout so the compaction is `df.write.parquet`.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return raw.select(
        F.md5(F.col("path")).alias("media_id"),
        F.element_at(F.split(F.element_at(F.split(F.col("path"), "/"), -1), "\\."), -1).alias(
            "modality"
        ),
        F.col("content"),
        F.lit(None).cast("string").alias("mime"),
        F.col("path").alias("source_path"),
        F.length(F.col("content")).cast("long").alias("n_bytes"),
    )


def _fake_decode(modality: str, content: bytes | None) -> dict:
    """Deterministic stand-in for a real decoder.

    Derives pseudo width/height/duration from the content hash so tests have
    stable, content-dependent values. A real deployment replaces this via
    ``DecoderRegistry.register``. Raises for unknown modalities, mirroring
    where a real decoder would fail.
    """
    if content is None:
        return {}
    h = hashlib.md5(content).digest()
    if modality == "image":
        return {"width": 64 + h[0] % 192, "height": 64 + h[1] % 192}
    if modality == "audio":
        return {"duration_s": round(0.5 + (h[2] % 600) / 10.0, 1)}
    if modality == "video":
        return {
            "duration_s": round(1.0 + (h[3] % 3000) / 10.0, 1),
            "n_frames": 24 * (1 + h[4] % 120),
            "width": 64 + h[5] % 192,
            "height": 64 + h[6] % 192,
        }
    raise NotImplementedError(
        f"no decoder for modality {modality!r}: real image/audio libs are not "
        "bundled; register one via DecoderRegistry.register"
    )


class DecoderRegistry:
    """Pluggable per-modality decoders used inside mapInPandas batches."""

    _decoders: dict[str, Callable[[bytes], dict]] = {}

    @classmethod
    def register(cls, modality: str, fn: Callable[[bytes], dict]) -> None:
        cls._decoders[modality] = fn

    @classmethod
    def decode(cls, modality: str, content: bytes | None) -> dict:
        if modality in cls._decoders:
            return cls._decoders[modality](content or b"")
        return _fake_decode(modality, content)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas (1 row in → 1 out).

    The UDF only ships (media_id, modality, content) per batch; metadata joins
    back by media_id if other columns are needed — keeps Arrow batches small
    when content is large.
    """
    # Snapshot the registry NOW: workers import the module fresh, so runtime
    # registrations only reach them via the pickled closure, not class state.
    decoders = dict(DecoderRegistry._decoders)

    def _decode(modality: str, content: bytes | None) -> dict:
        if modality in decoders:
            return decoders[modality](content or b"")
        return _fake_decode(modality, content)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, modality, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                feats = _decode(modality, content)
                rows.append(
                    {
                        "media_id": mid,
                        "modality": modality,
                        "n_bytes": len(content) if content is not None else 0,
                        "content_sha": hashlib.sha256(content or b"").hexdigest(),
                        "width": feats.get("width"),
                        "height": feats.get("height"),
                        "duration_s": feats.get("duration_s"),
                        "n_frames": feats.get("n_frames"),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media.select("media_id", "modality", "content").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 24) -> DataFrame:
    """Video→frames expansion plan (1 row → N rows) with stubbed frame bytes.

    Demonstrates the explode-shaped mapInPandas contract a real frame sampler
    uses; frame content is a deterministic hash placeholder.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_sha", T.StringType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, modality, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                if modality != "video":
                    continue
                feats = DecoderRegistry.decode(modality, content)
                for i in range(0, int(feats.get("n_frames") or 0), every_n):
                    # engine-portable placeholder: sha256 over the UPPERCASE
                    # hex of the bytes + '#' + index (SQL oracles can only
                    # hash VARCHAR, not BLOB); a real sampler emits the
                    # decoded frame bytes here
                    tag = (content or b"").hex().upper() + f"#{i}"
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_sha": hashlib.sha256(tag.encode()).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha"])

    return media.select("media_id", "modality", "content").mapInPandas(
        batches, schema=out_schema
    )


def audio_window_plan(
    media: DataFrame, window_ds: int = 100, stride_ds: int = 50
) -> DataFrame:
    """Audio→windows expansion plan (1 row → N rows): fixed-duration sliding
    windows over the decoded clip, the audio analog of
    :func:`frame_sample_plan` (a real pipeline emits resampled PCM per
    window; the decoder here is the deterministic stub).

    All arithmetic is INTEGER deciseconds — window boundaries are exact and
    engine-portable (float second-arithmetic would drift between engines).
    Windows start every ``stride_ds`` while start < duration; the last
    window truncates at clip end. 1-row→N-rows via mapInPandas keeps the
    binary content in one Arrow batch per partition — same contract a real
    torchaudio/ffmpeg windower runs under.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("window_idx", T.IntegerType(), False),
            T.StructField("start_ds", T.IntegerType(), False),
            T.StructField("end_ds", T.IntegerType(), False),
            T.StructField("window_sha", T.StringType(), False),
        ]
    )
    decoders = dict(DecoderRegistry._decoders)

    def _decode(modality: str, content: bytes | None) -> dict:
        if modality in decoders:
            return decoders[modality](content or b"")
        return _fake_decode(modality, content)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, modality, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                if modality != "audio":
                    continue
                feats = _decode(modality, content)
                dur_ds = int(round((feats.get("duration_s") or 0.0) * 10))
                if dur_ds <= 0:
                    continue
                for idx, start in enumerate(range(0, dur_ds, stride_ds)):
                    end = min(start + window_ds, dur_ds)
                    # engine-portable placeholder (see frame_sample_plan):
                    # sha256 over uppercase-hex bytes + '#' + start offset;
                    # a real windower emits resampled PCM bytes here
                    tag = (content or b"").hex().upper() + f"#{start}"
                    rows.append(
                        {
                            "media_id": mid,
                            "window_idx": idx,
                            "start_ds": start,
                            "end_ds": end,
                            "window_sha": hashlib.sha256(tag.encode()).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.select("media_id", "modality", "content").mapInPandas(
        batches, schema=out_schema
    )


def resize_images(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Image resize plumbing (1 row → 1 row, binary out).

    Real pipelines decode → resize → re-encode inside the same Arrow batch
    (PIL/opencv registered via DecoderRegistry); this container has no image
    libs, so the resize emits the ORIGINAL bytes plus the target geometry a
    real resizer would produce (aspect-preserving fit into max_side²),
    computed from the decoded dims. Schema/batching/partitioning — the parts
    Spark owns — are real and tested.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("out_width", T.IntegerType(), True),
            T.StructField("out_height", T.IntegerType(), True),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    decoders = dict(DecoderRegistry._decoders)

    def _decode(modality: str, content: bytes | None) -> dict:
        if modality in decoders:
            return decoders[modality](content or b"")
        return _fake_decode(modality, content)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, modality, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                if modality != "image":
                    continue
                feats = _decode(modality, content)
                w, h = feats.get("width"), feats.get("height")
                if not w or not h:
                    rows.append(
                        {"media_id": mid, "out_width": None, "out_height": None, "content": content}
                    )
                    continue
                scale = min(1.0, max_side / max(w, h))
                rows.append(
                    {
                        "media_id": mid,
                        "out_width": max(1, round(w * scale)),
                        "out_height": max(1, round(h * scale)),
                        "content": content,  # real resizer re-encodes here
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.select("media_id", "modality", "content").mapInPandas(
        batches, schema=out_schema
    )
