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
partitioning) stays testable with zero codec surface.

Video (round 6): `sample_frames(real_decode=True)` extracts REAL
frames — uncompressed Y4M (YUV4MPEG2) parses natively in numpy (the
video analogue of the PNM image path; exercised end-to-end by the
test suite), and compressed containers are transcoded to Y4M by the
optional ffmpeg binary (`video_decoder_available()`; absent here →
skip-if-missing test + loud RuntimeError in production). Extracted
frames are emitted as P6 PPM blobs, so they compose directly with the
image operators' real-decode path.
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


def video_decoder_available() -> bool:
    """True when the OPTIONAL compressed-container decoder (the ffmpeg
    binary) is on PATH. Uncompressed Y4M (YUV4MPEG2) decodes natively
    without it — see _frames_from_y4m."""
    import shutil

    return shutil.which("ffmpeg") is not None


def _yuv_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Full-range (JFIF) YCbCr -> RGB, vectorized; deterministic and
    engine-independent (pure integer inputs, fixed float coefficients,
    clip + round). Limited-range studio swing is not rescaled — frame
    STATISTICS downstream only need a fixed, documented mapping."""
    y = y.astype(np.float32)
    cb = cb.astype(np.float32) - 128.0
    cr = cr.astype(np.float32) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _frames_from_y4m(data: bytes) -> Iterator[tuple[int, np.ndarray]]:
    """Native YUV4MPEG2 (Y4M) parser — pure numpy, no codec library.
    Y4M is the uncompressed video interchange format (a text header +
    raw YUV planes per frame), i.e. exactly the video analogue of PNM
    for images. Yields (frame_index, HxWx3 uint8 RGB). Supports C444,
    C422 and the C420 family (jpeg/mpeg2/paldv siting differences only
    affect chroma placement, irrelevant to frame statistics); chroma is
    upsampled by nearest-neighbor repeat."""
    eol = data.index(b"\n")
    header = data[:eol].decode("ascii", "replace")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    width = height = 0
    cs = "420jpeg"
    for tok in header.split()[1:]:
        if tok[0] == "W":
            width = int(tok[1:])
        elif tok[0] == "H":
            height = int(tok[1:])
        elif tok[0] == "C":
            cs = tok[1:]
    if width <= 0 or height <= 0:
        raise ValueError(f"bad Y4M geometry in header: {header!r}")
    if cs.startswith("444"):
        cw, ch = width, height
    elif cs.startswith("422"):
        cw, ch = (width + 1) // 2, height
    elif cs.startswith("420"):
        cw, ch = (width + 1) // 2, (height + 1) // 2
    else:
        raise ValueError(f"unsupported Y4M colorspace C{cs}")
    ysz, csz = width * height, cw * ch
    pos, idx = eol + 1, 0
    while pos < len(data):
        feol = data.index(b"\n", pos)
        if not data[pos:feol].startswith(b"FRAME"):
            raise ValueError("malformed Y4M: missing FRAME marker")
        pos = feol + 1
        if pos + ysz + 2 * csz > len(data):
            raise ValueError("truncated Y4M frame")
        y = np.frombuffer(data, np.uint8, ysz, pos).reshape(height, width)
        cb = np.frombuffer(data, np.uint8, csz, pos + ysz).reshape(ch, cw)
        cr = np.frombuffer(data, np.uint8, csz, pos + ysz + csz).reshape(ch, cw)
        if (cw, ch) != (width, height):
            cb = np.repeat(np.repeat(cb, -(-height // ch), 0)[:height],
                           -(-width // cw), 1)[:, :width]
            cr = np.repeat(np.repeat(cr, -(-height // ch), 0)[:height],
                           -(-width // cw), 1)[:, :width]
        yield idx, _yuv_to_rgb(y, cb, cr)
        idx += 1
        pos += ysz + 2 * csz


def _frame_to_ppm(rgb: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 frame as binary PPM (P6) — the format the
    image half of this module decodes natively, so extracted frames
    feed straight into extract_image_features/resize_images with
    fake_decode=False."""
    h, w = rgb.shape[0], rgb.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def _extract_frames_real(
    payload: bytes, every_n: int, max_frames: int
) -> list[tuple[int, bytes]]:
    """Real frame extraction: native for Y4M; any other container is
    transcoded TO Y4M by the ffmpeg binary when present (one optional
    tool, one parser — the video twin of the Pillow pattern), else
    raises so a misconfigured production pipeline fails loudly instead
    of silently emitting stub frames."""
    data = payload or b""
    if not data:
        raise ValueError("empty video payload (no container bytes)")
    if not data.startswith(b"YUV4MPEG2"):
        if not video_decoder_available():
            raise RuntimeError(
                "compressed video container and no ffmpeg on PATH; "
                "install ffmpeg or pre-transcode to Y4M"
            )
        import subprocess

        # decode ONLY the frames the sampler can use: without
        # -frames:v, a 100 MB H.264 blob becomes multi-GB of raw YUV
        # held in one bytes object (stdout=PIPE) before sampling
        # throws most of it away — an executor OOM for long videos.
        needed = max(every_n, 1) * max_frames
        data = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", "pipe:0",
             "-frames:v", str(needed),
             "-f", "yuv4mpegpipe", "pipe:1"],
            input=data, stdout=subprocess.PIPE, check=True,
            timeout=120,
        ).stdout
    out = []
    for idx, rgb in _frames_from_y4m(data):
        if idx % max(every_n, 1):
            continue
        out.append((idx, _frame_to_ppm(rgb)))
        if len(out) >= max_frames:
            break
    return out


def sample_frames(
    media: DataFrame,
    every_n: int = 2,
    max_frames: int = 4,
    real_decode: bool = False,
) -> DataFrame:
    """Video frame-sampling: one input blob → N frame rows (flatMap
    shape via mapInPandas yielding more rows than input).

    real_decode=True routes through _extract_frames_real — native Y4M
    parsing in numpy (always available; exercised end-to-end by the
    test suite), ffmpeg-transcode-to-Y4M for compressed containers
    when the binary is on PATH (skip-if-absent test), loud failure
    otherwise. Extracted frames are emitted as P6 PPM blobs, so the
    output composes directly with extract_image_features /
    resize_images(fake_decode=False). The default keeps the
    deterministic byte-slicing stand-in so the plumbing stays testable
    against blobs that are not real video.

    Scale shape (either path): one Arrow batch pipeline over the blob
    column, no shuffle; decode parallelism == scan parallelism."""

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, blobs = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                if real_decode:
                    for idx, ppm in _extract_frames_real(
                        payload, every_n, max_frames
                    ):
                        ids.append(media_id)
                        idxs.append(idx)
                        blobs.append(ppm)
                else:
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


# ------------------------------------------------------------- audio

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("payload_sha256", T.StringType()),
    ]
)


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Native RIFF/WAVE PCM decode — stdlib ``wave`` parses the
    container, numpy vectorizes the sample conversion. No external
    dependency: WAV/PCM is to audio what PNM is to images (the
    uncompressed open format a from-scratch engine can own outright).
    Returns (samples float64 in [-1, 1], shape (n_frames, channels),
    sample_rate). 8/16/32-bit PCM supported."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw == 1:  # unsigned 8-bit
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:  # signed little-endian 16-bit
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:  # signed little-endian 32-bit
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width: {sw} bytes")
    return arr.reshape(-1, nch), rate


def audio_decoder_available() -> bool:
    """soundfile (libsndfile) presence — needed only for COMPRESSED
    audio (flac/ogg/...); WAV/PCM always decodes natively."""
    try:  # pragma: no cover - not installed in this sandbox
        import soundfile  # noqa: F401

        return True
    except Exception:
        return False


def _decode_audio_real(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV/PCM natively; compressed formats via soundfile when
    importable, else a LOUD error (the r5 Pillow pattern: never a
    silent fake on real media)."""
    if payload[:4] == b"RIFF":
        return _decode_wav(payload)
    try:  # pragma: no cover - soundfile not in this sandbox
        import io

        import soundfile as sf

        arr, rate = sf.read(io.BytesIO(payload), always_2d=True)
        return arr.astype(np.float64), int(rate)
    except ImportError:
        raise ImportError(
            "compressed audio decode needs the optional 'soundfile' "
            "package; WAV/PCM payloads decode natively without it"
        )


def extract_audio_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Per-clip audio features, Arrow-batched (mapInPandas), no
    shuffle: duration, RMS loudness, peak amplitude, zero-crossing
    rate (the crude pitch/noisiness proxy), plus the same
    payload-size/sha256 columns as the image path. All numpy —
    ~one vectorized pass per clip."""

    def features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = _decode_audio_real(bytes(payload))
                n = samples.shape[0]
                mono = samples.mean(axis=1) if samples.size else samples.reshape(0)
                rms = float(np.sqrt((mono**2).mean())) if n else 0.0
                peak = float(np.abs(samples).max()) if n else 0.0
                zcr = (
                    float((np.diff(np.signbit(mono)) != 0).mean())
                    if n > 1
                    else 0.0
                )
                out.append(
                    (
                        media_id,
                        int(rate),
                        int(samples.shape[1]),
                        int(n),
                        float(n / rate) if rate else 0.0,
                        rms,
                        peak,
                        zcr,
                        len(payload or b""),
                        hashlib.sha256(payload or b"").hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        features, AUDIO_FEATURES_SCHEMA
    )


def synthetic_audio(
    spark: SparkSession, n: int = 16, partitions: int = 4,
    rate: int = 8000, seconds: float = 0.25,
) -> DataFrame:
    """Deterministic REAL WAV clips (16-bit PCM mono sine, frequency
    keyed by id) — the audio analogue of the PNM test images: every
    byte is a valid RIFF container, so the native decode path is
    exercised end-to-end with zero external deps."""
    import io
    import wave

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                freq = 220.0 + 55.0 * (int(i) % 8)
                t = np.arange(int(rate * seconds)) / rate
                pcm = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(rate)
                    w.writeframes(pcm.tobytes())
                rows.append(
                    (int(i), "audio", "audio/wav", buf.getvalue(),
                     {"freq_hz": str(freq)})
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "mime", "payload", "meta"]
            )

    return spark.range(n).repartition(partitions).mapInPandas(gen, MEDIA_SCHEMA)
