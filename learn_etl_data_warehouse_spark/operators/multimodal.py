"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decode kernels are selected per modality by an executor-side codec probe
(:func:`decode_backend`): Pillow/cv2 for images and PyAV for video when
importable, else a clearly-marked deterministic STUB with the same
output shape/dtype. This container ships no codecs (verified), so CI
exercises the stub path plus the selection logic; on a deployment with
Pillow installed the real kernels activate with zero plan changes —
everything Spark-side (schema, batch iteration shape, partition sizing,
UDF signatures) is identical for both.

Design rules for 100 TB of media:
- media bytes ride in a ``binary`` column next to typed metadata
  (``media_type``, ``byte_len``, ``sha256``) so filters/joins run on
  metadata without touching payloads (parquet column pruning keeps the
  blob unread);
- per-batch processing via ``mapInPandas`` (Arrow batches) — the decode
  amortizes over a batch, and ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds memory per task;
- outputs are fixed-size feature arrays, never re-encoded blobs, so
  downstream joins/aggregations stay columnar.
"""

from __future__ import annotations

import functools
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image/audio/video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Typed metadata derivation — native expressions over the binary
    column (length + content hash); this is the columnar-filterable layer."""
    return df.withColumn("byte_len", F.length(F.col(payload_col)).cast("long")).withColumn(
        "sha256", F.sha2(F.col(payload_col), 256)
    )


# ---------------------------------------------------------------------------
# Codec probe + kernel registry
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def decode_backend(media_type: str) -> str:
    """Probe (once per Python worker) which decoder serves a modality:
    'pillow' | 'cv2' for images, 'pyav' for video,
    'soundfile' | 'librosa' for audio, else 'stub'. Runs EXECUTOR-side —
    the kernels call it inside the mapInPandas closure — so a
    heterogeneous cluster picks per-worker and the driver needs no codec
    installed."""
    if media_type == "image":
        try:
            import PIL.Image  # noqa: F401

            return "pillow"
        except Exception:
            pass
        try:
            import cv2  # noqa: F401

            return "cv2"
        except Exception:
            pass
    elif media_type == "video":
        try:
            import av  # noqa: F401

            return "pyav"
        except Exception:
            pass
    elif media_type == "audio":
        try:
            import soundfile  # noqa: F401

            return "soundfile"
        except Exception:
            pass
        try:
            import librosa  # noqa: F401

            return "librosa"
        except Exception:
            pass
    return "stub"


def _decode_media_stub(payload: bytes) -> list[float]:
    """STUB feature kernel — deterministic byte-histogram over
    FEATURE_DIM buckets, L1-normalized; shape/dtype match the real
    kernels so downstream plans are identical."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    counts = [0] * FEATURE_DIM
    for b in payload[:4096]:  # bounded work per item, like a thumbnail decode
        counts[b % FEATURE_DIM] += 1
    total = sum(counts) or 1
    return [c / total for c in counts]


def _image_features_pillow(payload: bytes) -> list[float]:
    """REAL image kernel (Pillow): decode → grayscale → 16-bin luminance
    histogram, L1-normalized. Undecodable payloads (corrupt files — or
    this repo's text-byte fixtures) yield the zero vector rather than
    failing the task; production would tee them to a quarantine sink."""
    from PIL import Image

    try:
        img = Image.open(io.BytesIO(payload)).convert("L")
    except Exception:
        return [0.0] * FEATURE_DIM
    hist = img.histogram()  # 256 luminance bins
    step = 256 // FEATURE_DIM
    counts = [sum(hist[j * step : (j + 1) * step]) for j in range(FEATURE_DIM)]
    total = sum(counts) or 1
    return [c / total for c in counts]


def _image_features_cv2(payload: bytes) -> list[float]:
    """REAL image kernel (OpenCV): same 16-bin luminance histogram as the
    Pillow kernel (decoder parity keeps features comparable cross-worker)."""
    import cv2
    import numpy as np

    img = cv2.imdecode(np.frombuffer(payload, dtype=np.uint8), cv2.IMREAD_GRAYSCALE)
    if img is None:
        return [0.0] * FEATURE_DIM
    hist = cv2.calcHist([img], [0], None, [FEATURE_DIM], [0, 256]).ravel()
    total = float(hist.sum()) or 1.0
    return [float(c) / total for c in hist]


def _audio_features_soundfile(payload: bytes) -> list[float]:
    """REAL audio kernel (soundfile): decode → mono mix → 16-bin
    amplitude histogram over [-1, 1], L1-normalized. Undecodable payloads
    yield the zero vector (quarantine semantics, same as images)."""
    import numpy as np
    import soundfile as sf

    try:
        data, _sr = sf.read(io.BytesIO(payload), dtype="float64")
    except Exception:
        return [0.0] * FEATURE_DIM
    wave = np.asarray(data, dtype=np.float64)
    if wave.ndim > 1:
        wave = wave.mean(axis=1)
    if wave.size == 0:
        return [0.0] * FEATURE_DIM
    hist, _ = np.histogram(np.clip(wave, -1.0, 1.0), bins=FEATURE_DIM, range=(-1.0, 1.0))
    total = float(hist.sum()) or 1.0
    return [float(c) / total for c in hist]


def _audio_features_librosa(payload: bytes) -> list[float]:
    """REAL audio kernel (librosa fallback): same 16-bin amplitude
    histogram as the soundfile kernel (decoder parity keeps features
    comparable across workers with different audio stacks)."""
    import librosa
    import numpy as np

    try:
        wave, _sr = librosa.load(io.BytesIO(payload), sr=None, mono=True)
    except Exception:
        return [0.0] * FEATURE_DIM
    wave = np.asarray(wave, dtype=np.float64)
    if wave.size == 0:
        return [0.0] * FEATURE_DIM
    hist, _ = np.histogram(np.clip(wave, -1.0, 1.0), bins=FEATURE_DIM, range=(-1.0, 1.0))
    total = float(hist.sum()) or 1.0
    return [float(c) / total for c in hist]


def _decode_media(payload: bytes, media_type: str) -> list[float]:
    """Feature kernel dispatch: real decoder when the worker has one for
    the modality, stub otherwise."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    backend = decode_backend(media_type)
    if backend == "pillow":
        return _image_features_pillow(payload)
    if backend == "cv2":
        return _image_features_cv2(payload)
    if backend == "soundfile":
        return _audio_features_soundfile(payload)
    if backend == "librosa":
        return _audio_features_librosa(payload)
    return _decode_media_stub(payload)


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction via ``mapInPandas``.

    The iterator-of-batches shape is the real production contract: each
    pandas batch holds ``maxRecordsPerBatch`` rows, the decode loop is
    per-batch Python (the unavoidable slow path for codec work), and the
    output schema is fixed so Catalyst can plan downstream joins.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_media(p, t)
                for p, t in zip(pdf[payload_col], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf[payload_col].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


THUMB_H, THUMB_W = 4, 4

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.DoubleType()), True),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("byte_offset", T.LongType(), False),
        T.StructField("frame_feature", T.DoubleType(), True),
    ]
)


def _resize_stub(payload: bytes, h: int, w: int) -> list[float]:
    """STUB for an image decode+resize (Pillow in production): emits a
    deterministic h×w 'grayscale' grid from payload byte means — same
    output shape/dtype as the real kernel."""
    if not payload:
        return [0.0] * (h * w)
    n = h * w
    chunk = max(len(payload) // n, 1)
    return [
        sum(payload[i * chunk : (i + 1) * chunk]) / max(len(payload[i * chunk : (i + 1) * chunk]), 1) / 255.0
        for i in range(n)
    ]


def _resize_pillow(payload: bytes, h: int, w: int) -> list[float]:
    """REAL resize kernel (Pillow): decode → grayscale → box-resample to
    h×w → row-major pixels in [0,1]. Undecodable payloads → zero grid
    (same quarantine note as the feature kernel)."""
    from PIL import Image

    try:
        img = Image.open(io.BytesIO(payload)).convert("L").resize((w, h))
    except Exception:
        return [0.0] * (h * w)
    return [p / 255.0 for p in img.getdata()]


def _resize_cv2(payload: bytes, h: int, w: int) -> list[float]:
    """REAL resize kernel (OpenCV): decode → grayscale → area-resample to
    h×w → row-major pixels in [0,1]. Mirrors the Pillow kernel so a
    cv2-only worker produces real (not stub) thumbnails — without this,
    extract_features and resize_images disagreed on the same payloads."""
    import cv2
    import numpy as np

    img = cv2.imdecode(np.frombuffer(payload, dtype=np.uint8), cv2.IMREAD_GRAYSCALE)
    if img is None:
        return [0.0] * (h * w)
    small = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
    return [float(p) / 255.0 for p in small.ravel()]


def _resize_one(payload: bytes, h: int, w: int) -> list[float]:
    backend = decode_backend("image")
    if backend == "pillow":
        return _resize_pillow(payload, h, w)
    if backend == "cv2":
        return _resize_cv2(payload, h, w)
    return _resize_stub(payload, h, w)


def resize_images(df: DataFrame, h: int = THUMB_H, w: int = THUMB_W) -> DataFrame:
    """Batch image resize via mapInPandas — the per-batch loop is where a
    real decoder amortizes; output is a fixed-size pixel array so the
    result is columnar again. Kernel chosen by the executor-side codec
    probe (Pillow when importable, stub otherwise)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": h,
                    "width": w,
                    "pixels": [_resize_one(p, h, w) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def _sample_frames_stub(payload: bytes, n_frames: int) -> list[tuple[int, int, float]]:
    """STUB frame sampler: evenly spaced byte offsets, byte-mean feature."""
    size = len(payload) if payload is not None else 0
    rows = []
    for i in range(n_frames):
        off = (size * i) // n_frames
        window = payload[off : off + 64] if payload else b""
        rows.append((i, off, (sum(window) / max(len(window), 1)) / 255.0))
    return rows


def _sample_frames_pyav(payload: bytes, n_frames: int) -> list[tuple[int, int, float]]:
    """REAL frame sampler (PyAV): demux the container from memory, seek
    to ``n_frames`` evenly spaced timestamps, decode one frame each and
    emit its mean luminance in [0,1]; byte_offset is the demuxer's packet
    position when the container reports one. Un-demuxable payloads fall
    back to the stub rows (quarantine note as above). Untestable in this
    image (no PyAV — the selection test pins the fallback instead)."""
    import av

    try:
        with av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            duration = container.duration  # microseconds (AV_TIME_BASE)
            rows = []
            for i in range(n_frames):
                ts = (duration * i) // n_frames if duration else 0
                container.seek(ts, any_frame=False, backward=True)
                frame = next(container.decode(stream), None)
                if frame is None:
                    return _sample_frames_stub(payload, n_frames)
                plane = frame.reformat(format="gray").to_ndarray()
                off = getattr(frame, "pts", None)
                rows.append((i, int(off or 0), float(plane.mean()) / 255.0))
            return rows
    except Exception:
        return _sample_frames_stub(payload, n_frames)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling: emit ``n_frames`` evenly spaced
    (frame_index, byte_offset, feature) rows per media item — a 1→N
    mapInPandas. Kernel chosen by the executor-side codec probe: PyAV
    demux+decode when importable, deterministic byte-mean stub otherwise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sampler = (
            _sample_frames_pyav
            if decode_backend("video") == "pyav"
            else _sample_frames_stub
        )
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_index": [],
                "byte_offset": [],
                "frame_feature": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, off, feat in sampler(payload, n_frames):
                    out["media_id"].append(mid)
                    out["frame_index"].append(i)
                    out["byte_offset"].append(off)
                    out["frame_feature"].append(feat)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def decode_batches(
    df: DataFrame,
    byte_budget: int,
    id_col: str = "media_id",
    type_col: str = "media_type",
    size_col: str = "byte_len",
) -> DataFrame:
    """Decode-batch scheduling: assign each media item to a per-modality,
    APPROXIMATELY budget-sized batch — the grouping step before the
    mapInPandas decode kernels (m02-m04) run, sized so an Arrow batch ≈
    one GPU/worker decode call.

    Same plan shape as t06 sequence packing: one shuffle on the modality,
    a running prefix-sum window within it, batch = floor(offset/budget).
    Deterministic (ordered by id), SQL-mirrorable, no Python.

    Packing bound (greedy by START offset, not by end): batch k owns the
    items whose prefix offset falls in [k·budget, (k+1)·budget), so the
    item straddling the upper boundary overflows into k — a batch carries
    at most ``budget + max(byte_len) - 1`` payload bytes, and an item
    larger than the budget overflows its batch by itself. Callers must
    size the decoder budget with that headroom (or pre-split oversized
    payloads). True reset-on-overflow greedy packing is a sequential
    recurrence — not expressible as a closed-form window — and buys
    nothing here because the decode kernels stream Arrow slices anyway.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(type_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    return df.select(
        F.col(id_col),
        F.col(type_col),
        F.col(size_col).cast("long").alias(size_col),
        offset.alias("byte_offset"),
        F.floor(offset / F.lit(byte_budget)).cast("long").alias("batch_id"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: treat document text bytes as an opaque
    payload so the multimodal plumbing exercises real (non-null) binary
    data from the fixture tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def media_payload_audit(
    df: DataFrame, type_col: str = "media_type", payload_col: str = "payload"
) -> DataFrame:
    """Byte-level PAYLOAD audit per modality (m07): count, byte mass,
    size extrema, distinct-content count and duplicate ppm — the
    ingest-ledger numbers a multimodal pipeline checks before spending
    decode cycles (all from :func:`attach_media_metadata`'s native
    binary expressions: no codec, no Python, works for any modality).
    Returns (media_type, n, sum_bytes, min_bytes, max_bytes,
    n_distinct, dup_ppm); output bounded by the modality alphabet."""
    m = attach_media_metadata(df, payload_col)
    return (
        m.groupBy(type_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("byte_len").cast("long").alias("sum_bytes"),
            F.min("byte_len").cast("long").alias("min_bytes"),
            F.max("byte_len").cast("long").alias("max_bytes"),
            F.countDistinct("sha256").cast("long").alias("n_distinct"),
        )
        .select(
            type_col,
            "n",
            "sum_bytes",
            "min_bytes",
            "max_bytes",
            "n_distinct",
            F.expr("(1000000 * (n - n_distinct)) div n")
            .cast("long")
            .alias("dup_ppm"),
        )
    )


def media_size_histogram(
    df: DataFrame, type_col: str = "media_type", payload_col: str = "payload"
) -> DataFrame:
    """Payload size histogram per modality (m08): digit-count buckets
    (the e19 log10-by-string-length trick — bucket b spans
    [10^(b−1), 10^b), no libm) over byte lengths, with per-bucket
    extrema and the within-modality share — the size-mix view next to
    m07's totals ledger: a modality whose mass migrates buckets
    (thumbnails appearing, clips lengthening) drifts HERE before the
    mean moves. Output bounded by |modalities| · ~10 buckets.

    Returns (media_type, size_bucket, n, min_bytes, max_bytes,
    share_ppm), all BIGINT; share truncating within modality.
    """
    m = attach_media_metadata(df, payload_col)
    b = m.select(
        F.col(type_col),
        F.col("byte_len"),
        F.length(F.col("byte_len").cast("string")).cast("long").alias(
            "size_bucket"
        ),
    )
    cells = b.groupBy(type_col, "size_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("byte_len").cast("long").alias("min_bytes"),
        F.max("byte_len").cast("long").alias("max_bytes"),
    )
    tot = cells.groupBy(type_col).agg(F.sum("n").alias("_t"))
    return cells.join(tot, type_col).select(
        type_col,
        "size_bucket",
        "n",
        "min_bytes",
        "max_bytes",
        F.expr("(1000000 * n) div _t").cast("long").alias("share_ppm"),
    )
