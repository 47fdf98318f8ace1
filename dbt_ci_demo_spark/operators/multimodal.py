"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(north-star operator family).

Design for 100 TB of media:
- Media travels as a ``media`` STRUCT column: ``bytes BINARY`` (opaque
  payload) + typed metadata (uri, modality, byte length, content hash).
  Parquet stores the binary column contiguously; queries that only touch
  metadata never deserialize payloads (column pruning).
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` pipelines — the payload crosses the JVM↔Python boundary
  once per batch, not per row, and the operator parallelizes per
  partition. ``spark.sql.files.maxPartitionBytes`` (not row count) is the
  partition-sizing knob because payloads dominate.
- The actual codec calls (PIL/ffmpeg/librosa) are STUBBED behind
  ``_decode_image_stub`` — this container has no media libraries. The stub
  is deterministic (derived from the payload hash) so tests pin the full
  Spark-side contract: schema, batching, partition behavior, null
  handling. Swapping in a real codec changes only the inner function.
- For header-level metadata no codec library is needed at all:
  ``operators.media_codecs`` ships real pure-Python PNG/JPEG/WAV header
  parsers that plug into the same ``decoder=`` seam (the production
  drop-in for corpora of actual files); the stubs stay the default and
  the oracle-gate path because driver fixtures synthesize payloads.
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
        T.StructField("uri", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media_column(
    df: DataFrame, payload_col: str, id_col: str, modality: str = "image"
) -> DataFrame:
    """Bundle an existing binary payload column into the typed media struct
    (metadata computed JVM-side: length, md5 — no Python involved)."""
    p = F.col(payload_col)
    return df.select(
        F.col(id_col),
        F.struct(
            F.concat(F.lit(f"mem://{modality}/"), F.col(id_col).cast("string")).alias("uri"),
            F.lit(modality).alias("modality"),
            F.length(p).cast("long").alias("n_bytes"),
            # md5 takes BINARY natively — hashing the raw payload bytes;
            # the old string cast was a redundant per-row node that also
            # misled readers into thinking a text transcoding was hashed
            F.md5(p).alias("content_hash"),
            p.alias("bytes"),
        ).cast(MEDIA_SCHEMA).alias("media"),
    )


def synthesize_media_from_text(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic fixture builder: encode the text column as the binary
    payload (the fixtures ship no real media; the pipeline doesn't care)."""
    return attach_media_column(
        df.select(F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("__payload")),
        "__payload",
        id_col,
    )


IMAGE_FIXTURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def synthesize_image_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-container fixture (r06, VERDICT r05 task 4):
    per row, a minimal-but-valid PNG (even ids) or JPEG (odd ids) header
    payload built with :mod:`operators.media_codecs` encoders, dimensions
    arithmetic in the id — width = 1 + id % 512, height = 1 + (id*7) %
    512 — so an oracle can verify the REAL header parsers end-to-end
    without any media library. Payload synthesis is an Arrow-batched
    mapInPandas stage riding the same plumbing as the decode stage; the
    result is the typed media struct every downstream media operator
    consumes."""
    from dbt_ci_demo_spark.operators import media_codecs as mc

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                mc.encode_png_header(1 + i % 512, 1 + (i * 7) % 512)
                if i % 2 == 0
                else mc.encode_jpeg_header(1 + i % 512, 1 + (i * 7) % 512)
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    fixture = df.select(F.col(id_col)).mapInPandas(synth, IMAGE_FIXTURE_SCHEMA)
    return attach_media_column(fixture, "payload", "doc_id")


def _decode_image_stub(payload: bytes) -> tuple[int, int, str]:
    """STUB for the real image decoder (PIL.Image.open). Deterministic fake:
    dimensions and format derived from the payload's md5 — replace the body
    with a real codec in production; the surrounding Spark plumbing is the
    tested artifact.

    Raises NotImplementedError for empty payloads, mirroring how a real
    decoder rejects corrupt input (exercises the error path)."""
    if not payload:
        raise NotImplementedError("real decoder required for empty/corrupt payloads")
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192  # 64..255
    height = 64 + h[1] % 192
    fmt = ["jpeg", "png", "webp"][h[2] % 3]
    return width, height, fmt


def decode_image_metadata(
    media_df: DataFrame,
    id_col: str = "doc_id",
    decoder: Callable[[bytes], tuple[int, int, str]] | None = None,
) -> DataFrame:
    """Decode stage as mapInPandas: one Arrow batch in, one out. Output
    schema is fixed (IMAGE_META_SCHEMA) so downstream SQL composes.

    ``decoder`` is the codec seam (VERDICT r03 task 8): any picklable
    ``bytes -> (width, height, format)`` callable — e.g. a PIL header
    read — rides the identical Arrow plumbing; the deterministic stub
    stays the default/oracle path. The callable is shipped inside the
    mapInPandas closure, so it runs executor-side per batch."""
    decode_one = decoder or _decode_image_stub

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["bytes"]
            dims = [decode_one(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "format": [d[2] for d in dims],
                    "n_bytes": pdf["n_bytes"].astype("int64"),
                }
            )

    flat = media_df.select(
        F.col(id_col), F.col("media.bytes").alias("bytes"), F.col("media.n_bytes").alias("n_bytes")
    )
    return flat.mapInPandas(decode, IMAGE_META_SCHEMA)


def extract_features(media_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature-extraction stage (the embedding-model call in production):
    deterministic 16-dim vector from the payload hash, Arrow-batched."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf["bytes"]:
                h = hashlib.md5(p).digest()
                feats.append(np.frombuffer(h, dtype=np.uint8).astype("float32") / 255.0)
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "feature": feats})

    flat = media_df.select(F.col(id_col), F.col("media.bytes").alias("bytes"))
    return flat.mapInPandas(featurize, FEATURE_SCHEMA)


def frame_sample_plan(
    media_df: DataFrame, id_col: str = "doc_id", every_n_bytes: int = 1024
) -> DataFrame:
    """Frame-sampling *plan* for video payloads: emit (doc_id, frame_idx,
    byte_offset) rows JVM-side (sequence + explode — no Python), so the
    decode stage only touches sampled offsets. With a real container
    format the offsets would come from the index atom; the fan-out shape
    is identical. Zero-byte payloads emit NO frames (r10 review finding:
    greatest(n-1, 0) manufactured a frame at offset 0 for an empty
    payload, sending the decode stage into nothing — the same
    spurious-row class audio_chunk_plan's duration filter guards)."""
    n = F.col("media.n_bytes")
    return media_df.filter(n > 0).select(
        F.col(id_col),
        F.posexplode(
            F.sequence(F.lit(0), F.greatest((n / every_n_bytes).cast("long") - 1, F.lit(0)))
        ).alias("frame_idx", "offset_block"),
    ).select(
        id_col, "frame_idx", (F.col("offset_block") * every_n_bytes).alias("byte_offset")
    )


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def _decode_audio_stub(payload: bytes) -> tuple[int, int]:
    """STUB for the real audio decoder (soundfile/librosa header read).
    Deterministic fake: sample rate and whole-second duration derived from
    the payload's md5 — replace the body with a real codec in production;
    the surrounding Spark plumbing is the tested artifact."""
    if not payload:
        raise NotImplementedError("real decoder required for empty/corrupt payloads")
    h = hashlib.md5(payload).digest()
    sample_rate = [8000, 16000, 44100][h[3] % 3]
    n_samples = sample_rate * (1 + h[4] % 30)  # 1..30 whole seconds
    return sample_rate, n_samples


def decode_audio_metadata(
    media_df: DataFrame,
    id_col: str = "doc_id",
    decoder: Callable[[bytes], tuple[int, int]] | None = None,
) -> DataFrame:
    """Audio decode stage as Arrow-batched mapInPandas (one batch in, one
    out), mirroring decode_image_metadata. duration_s is an exact integer
    count of seconds in double — identical in any engine.

    ``decoder`` is the codec seam: any picklable ``bytes ->
    (sample_rate, n_samples)`` callable (e.g. a soundfile/WAV header
    read) replaces the stub on the same Arrow plumbing."""
    decode_one = decoder or _decode_audio_stub

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_one(p) for p in pdf["bytes"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "sample_rate": pd.Series([m[0] for m in meta], dtype="int32"),
                    "n_samples": pd.Series([m[1] for m in meta], dtype="int64"),
                    "duration_s": pd.Series(
                        [m[1] / m[0] for m in meta], dtype="float64"
                    ),
                }
            )

    flat = media_df.select(F.col(id_col), F.col("media.bytes").alias("bytes"))
    return flat.mapInPandas(decode, AUDIO_META_SCHEMA)


def audio_chunk_plan(audio_meta: DataFrame, chunk_s: int = 5) -> DataFrame:
    """Chunking plan for audio-shaped payloads: per-clip fixed-duration
    windows fanned out JVM-side (sequence + explode, no Python) — the
    downstream transcription/feature model touches only chunk boundaries.
    The last chunk is clipped to the clip duration. Zero- or
    negative-duration clips (possible with a real decoder returning 0
    samples) produce NO chunk rows — without the filter, n_chunks=0 would
    still yield a spurious (0, 0) chunk via greatest(n_chunks-1, 0).
    Pure per-row fan-out: no shuffle, parallel at any corpus size."""
    n_chunks = F.ceil(F.col("duration_s") / F.lit(float(chunk_s))).cast("long")
    chunks = audio_meta.filter(F.col("duration_s") > 0).select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "duration_s",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.greatest(n_chunks - 1, F.lit(0)))
        ).alias("chunk_idx"),
    )
    start = (F.col("chunk_idx") * chunk_s).cast("double")
    return chunks.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "chunk_idx",
        start.alias("start_s"),
        F.least(start + chunk_s, F.col("duration_s")).alias("end_s"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized_hash", T.StringType()),
    ]
)


def resize_images(
    media_df: DataFrame,
    id_col: str = "doc_id",
    max_width: int = 128,
    max_height: int = 128,
) -> DataFrame:
    """Resize stage as Arrow-batched mapInPandas: decode dimensions
    (stub), compute the aspect-preserving downscale to fit
    (max_width, max_height) — never upscale — and emit the resized
    payload's content hash (STUB: the real resampler is PIL
    Image.resize; the fake derives the output deterministically from
    (content_hash, out dims), so the full pipeline stays
    oracle-checkable). Scale math is plain IEEE doubles, identical in
    any engine. Per-row work with no shuffle: at 100 TB this
    parallelizes per Arrow batch exactly like the decode stage."""
    import math

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": pdf[id_col].astype("int64"),
                "width": [],
                "height": [],
                "out_width": [],
                "out_height": [],
                "resized_hash": [],
            }
            for payload, chash in zip(pdf["bytes"], pdf["content_hash"]):
                w, h, _fmt = _decode_image_stub(payload)
                if w <= 0 or h <= 0:
                    raise ValueError(f"decoder reported non-positive dims {w}x{h}")
                scale = min(1.0, max_width / w, max_height / h)
                # clamp: extreme aspect ratios (e.g. 1 x 10_000) would
                # otherwise floor a dimension to 0
                ow = max(1, int(math.floor(w * scale)))
                oh = max(1, int(math.floor(h * scale)))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["resized_hash"].append(
                    hashlib.md5(f"{chash}|{ow}|{oh}".encode()).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "out_width": pd.Series(rows["out_width"], dtype="int32"),
                    "out_height": pd.Series(rows["out_height"], dtype="int32"),
                    "resized_hash": rows["resized_hash"],
                }
            )

    flat = media_df.select(
        F.col(id_col),
        F.col("media.bytes").alias("bytes"),
        F.col("media.content_hash").alias("content_hash"),
    )
    return flat.mapInPandas(resize, RESIZE_SCHEMA)
