"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata, processed via
Arrow-batched `mapInPandas` — the right Spark shape for decode /
feature-extract / resize / frame-sample at 100 TB:

- binary payloads stay columnar end-to-end (no per-row Python objects
  until inside the Arrow batch),
- each task processes a batch of blobs at a time; `maxRecordsPerBatch`
  bounds executor memory against large blobs,
- partitioning is by file/row-group, so decode parallelism is the
  scan parallelism.

Decoding: `fake_decode=False` routes through `_decode_image_real`,
which decodes uncompressed PNM (PPM/PGM) natively in numpy — no
dependency, exercised by the test suite in this container — and uses
Pillow for compressed formats when importable (`decoder_available()`;
the lib is absent here, so that branch is covered by a
skip-if-missing test). `fake_decode=True` (default) substitutes a
deterministic, schema-correct fake (content-hash-seeded) so the
Spark-side plumbing (schemas, batch iteration, UDF signatures,
partitioning) stays testable with zero codec surface. Audio/video
frame EXTRACTION beyond byte-slicing still needs ffmpeg and stays
stubbed.
"""
from __future__ import annotations

import hashlib
import sys
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The mapInPandas closures below capture module-level helpers (e.g.
# _fake_decode); by default cloudpickle serializes those BY REFERENCE,
# which requires `qcache_spark` to be importable inside the Python
# worker — true for get_spark() sessions (session.py exports
# PYTHONPATH) but NOT for a caller-supplied session. Registering the
# module for by-value pickling ships the function bodies with the
# task, so the operators run under ANY SparkSession.
try:
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - older cloudpickle
    pass

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("payload_sha256", T.StringType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_sha256", T.StringType()),
    ]
)


def decoder_available() -> bool:
    """True when the OPTIONAL compressed-format decoder (Pillow) is
    importable. Uncompressed PNM (PPM/PGM) decodes natively without
    it — see _decode_image_real."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic schema-correct fake: pseudo-pixels seeded by the
    content hash. Keeps every byte of the pipeline testable without a
    codec in the container."""
    digest = hashlib.sha256(payload or b"").digest()
    h = 8 + digest[0] % 8
    w = 8 + digest[1] % 8
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _decode_pnm(data: bytes) -> np.ndarray:
    """Native decoder for binary PNM (P6 RGB / P5 grayscale), the
    uncompressed interchange format — pure numpy, no codec library.
    Grayscale broadcasts to 3 channels so every decoder path yields
    HxWx3 uint8."""
    pos = 2  # past magic
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and '#' comments between header fields
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace byte after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError(f"16-bit PNM not supported (maxval={maxval})")
    channels = 3 if data[:2] == b"P6" else 1
    raster = np.frombuffer(
        data, dtype=np.uint8, count=width * height * channels, offset=pos
    ).reshape(height, width, channels)
    if channels == 1:
        raster = np.repeat(raster, 3, axis=2)
    return raster


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Decode real image bytes to an HxWx3 uint8 array.

    Uncompressed PNM (P6/P5) decodes natively — always available, no
    dependency. Compressed formats (PNG/JPEG/...) use Pillow when
    importable (`decoder_available()`); without it they raise
    ImportError so a misconfigured production pipeline fails loudly
    instead of silently producing stub statistics."""
    data = payload or b""
    if data[:2] in (b"P6", b"P5"):
        return _decode_pnm(data)
    import io

    import PIL.Image  # noqa: F401  (optional dependency)

    with PIL.Image.open(io.BytesIO(data)) as im:
        return np.asarray(im.convert("RGB"))


def synthetic_media(spark: SparkSession, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic media table for tests: payload = hash-derived
    bytes (schema identical to a real ingested media table)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": ["image"] * len(ids),
                    "mime": ["image/fake"] * len(ids),
                    "payload": [
                        hashlib.sha256(str(i).encode()).digest() * 4 for i in ids
                    ],
                    "meta": [{"source": f"synthetic-{i % 3}"} for i in ids],
                }
            )

    return (
        spark.range(n)
        .repartition(partitions)
        .mapInPandas(gen, MEDIA_SCHEMA)
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Media table DERIVED from the documents table: payload =
    UTF-8-encoded text, media_id = doc_id. Built for the correctness
    gate: every downstream feature (payload_bytes, payload_sha256,
    fake-decode dims seeded by the content digest) is then
    reproducible by an external SQL oracle from the same parquet —
    sha256(text) over UTF-8 bytes is engine-independent. Same schema
    and mapInPandas plumbing as a real ingested media table."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(pdf),
                    "mime": ["image/fake"] * len(pdf),
                    "payload": [
                        (t or "").encode("utf-8") for t in pdf["text"]
                    ],
                    "meta": [
                        {"source": s or ""} for s in pdf["source"]
                    ],
                }
            )

    return docs.select("doc_id", "text", "source").mapInPandas(gen, MEDIA_SCHEMA)


def extract_image_features(
    media: DataFrame, fake_decode: bool = True, batch_rows: int = 256
) -> DataFrame:
    """Decode → per-image features, Arrow-batched. The non-decode
    features (size, content hash) are real either way; with
    fake_decode=False the pixel statistics come from the real decoder
    (native PNM always; PNG/JPEG when Pillow is importable)."""
    decode = _fake_decode if fake_decode else _decode_image_real

    def features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode(payload)
                out.append(
                    (
                        media_id,
                        int(img.shape[1]),
                        int(img.shape[0]),
                        int(img.shape[2]),
                        float(img.mean()),
                        len(payload or b""),
                        hashlib.sha256(payload or b"").hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "n_channels",
                    "mean_luma", "payload_bytes", "payload_sha256",
                ],
            )

    src = media.select("media_id", "payload")
    return src.mapInPandas(features, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int = 2, max_frames: int = 4
) -> DataFrame:
    """Video frame-sampling plumbing: one input blob → N frame rows
    (flatMap shape via mapInPandas yielding more rows than input).
    Frames are byte slices of the payload under the stub; a real
    implementation replaces the slicing with an ffmpeg seek+decode."""

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, blobs = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                n = min(max_frames, max(len(payload) // max(every_n, 1), 1))
                for i in range(n):
                    ids.append(media_id)
                    idxs.append(i * every_n)
                    blobs.append(payload[i * every_n: i * every_n + 16])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_payload": blobs}
            )

    return media.select("media_id", "payload").mapInPandas(frames, FRAME_SAMPLE_SCHEMA)


def resize_images(
    media: DataFrame,
    width: int = 4,
    height: int = 4,
    fake_decode: bool = True,
) -> DataFrame:
    """Decode → nearest-neighbor resize to (width, height) →
    deterministic checksum of the resized pixel bytes. The resize
    kernel (index-grid gather) is pure numpy and identical for the
    stub and a real decoder — only the decode half is stubbed. The
    standard normalize-before-embedding pass; at scale the cost is one
    Arrow batch pipeline over the blob column, no shuffle."""
    if width < 1 or height < 1:
        raise ValueError(f"width/height must be >= 1, got {width}x{height}")
    decode = _fake_decode if fake_decode else _decode_image_real

    def resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode(payload)
                sh, sw = img.shape[0], img.shape[1]
                ys = (np.arange(height) * sh) // height
                xs = (np.arange(width) * sw) // width
                resized = img[ys][:, xs]
                out.append(
                    (
                        media_id, int(sw), int(sh), width, height,
                        hashlib.sha256(resized.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "src_width", "src_height",
                    "width", "height", "resized_sha256",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(resize, RESIZE_SCHEMA)


def media_dedup_keys(media: DataFrame) -> DataFrame:
    """Exact byte-level dedup key for media: hash the payload JVM-side
    (sha2 over binary — no Python touch for the common case)."""
    return media.select(
        "media_id",
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
        F.length(F.col("payload")).alias("payload_bytes"),
    )
