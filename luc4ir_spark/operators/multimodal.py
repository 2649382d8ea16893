"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step probes for a real codec at call time: with Pillow
importable, ``decode_image`` decodes to a grayscale perceptual-thumbnail
feature vector; without one (this sandbox bakes no image codecs in) it
raises NotImplementedError unless the deterministic fake decoder is
selected. The AUDIO path is fully real here: ``decode_audio`` /
``audio_stats`` / ``extract_audio_features`` parse WAV/PCM with the
stdlib ``wave`` reader (per-segment RMS features, header stats) — only
compressed audio (mp3/ogg) remains environment-blocked. Everything AROUND the decode is real and tested either
way: the schema contract, Arrow batch shapes, ``mapInPandas``
iteration, partition sizing for large binaries, and the feature-vector
output layout a downstream ANN/dedup stage consumes.

Schema contract:
    media(doc_id long, kind string, media binary,
          meta struct<mime string, width int, height int,
                      duration_ms int, sample_rate int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def _fake_feature(blob: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: hash the bytes
    into a unit vector. Same blob -> same vector, so downstream dedup /
    ANN stages are testable end-to-end."""
    h = hashlib.sha256(blob or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    vec = (raw.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def has_image_codec() -> bool:
    """True iff a real image codec library (Pillow) is importable in
    this environment. Probed lazily so the module imports everywhere."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(
    blob: bytes, fake: bool = False, dim: int = FEATURE_DIM
) -> np.ndarray:
    """Decode an image blob into a unit feature vector.

    The REAL path (Pillow, when importable): decode, convert to
    grayscale, resize to a sqrt(dim)-side grid, flatten the pixel
    intensities, L2-normalize — a deterministic perceptual thumbnail
    suitable for the downstream near-dup/ANN stages. In environments
    without an image codec (this sandbox) it raises NotImplementedError;
    ``fake=True`` routes to the hash-based deterministic stand-in."""
    if fake:
        return _fake_feature(blob, dim)
    if not has_image_codec():
        raise NotImplementedError(
            "image decoding requires Pillow (not importable here); "
            "use fake=True for the deterministic test double"
        )
    import io

    from PIL import Image

    side = max(2, int(round(dim ** 0.5)))
    img = Image.open(io.BytesIO(blob)).convert("L").resize(
        (side, side), Image.BILINEAR
    )
    vec = np.asarray(img, dtype=np.float64).reshape(-1)[:dim]
    if len(vec) < dim:
        vec = np.pad(vec, (0, dim - len(vec)))
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def extract_features(
    media: DataFrame,
    kind: str | None = None,
    fake_decoder: bool = True,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """media table -> (doc_id, kind, n_bytes, feature array<double>).

    ``mapInPandas`` so each Arrow batch of binaries is processed
    column-at-a-time; partition sizing guidance: keep
    spark.sql.files.maxPartitionBytes modest (<=64 MB) when media blobs
    are large so a batch of decoded frames fits executor memory."""
    from ..deploy import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)
    if kind is not None:
        media = media.filter(F.col("kind") == kind)
    media = media.select("doc_id", "kind", "media")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature(b, dim) if fake_decoder else decode_image(b)
                for b in pdf["media"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["media"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": [list(map(float, v)) for v in feats],
                }
            )

    return media.mapInPandas(
        run,
        "doc_id long, kind string, n_bytes long, feature array<double>",
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, fake_decoder: bool = True
) -> DataFrame:
    """Video frame sampling plumbing: expand each video row into frame
    rows at ``every_ms`` intervals of meta.duration_ms. Frame DECODE is
    the stub; the row expansion, timestamps, and per-frame feature
    layout are real."""
    from ..deploy import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)
    vids = media.filter(F.col("kind") == "video").select(
        "doc_id", "media", F.col("meta.duration_ms").alias("duration_ms")
    )
    frames = vids.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decoder:
                raise NotImplementedError(
                    "video frame decoding requires codec libraries"
                )
            feats = [
                _fake_feature((b or b"") + int(ts).to_bytes(8, "little"))
                for b, ts in zip(pdf["media"], pdf["frame_ts_ms"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "feature": [list(map(float, v)) for v in feats],
                }
            )

    return frames.select("doc_id", "media", "frame_ts_ms").mapInPandas(
        run, "doc_id long, frame_ts_ms long, feature array<double>"
    )


def decode_audio(blob: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """REAL audio decode for WAV/PCM containers — the stdlib ``wave``
    reader needs no external codec, so unlike the image path this one
    is fully functional in this sandbox (compressed codecs — mp3/ogg —
    remain environment-blocked and raise from ``wave`` itself).
    Channels are mean-downmixed; the feature is per-segment RMS energy
    over ``dim`` equal time slices, L2-normalized — the same output
    layout as ``decode_image`` so downstream ANN/dedup stages are
    modality-agnostic."""
    import io
    import wave

    with wave.open(io.BytesIO(blob), "rb") as w:
        sw = w.getsampwidth()
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width: {sw}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:
        x = x - 128.0  # 8-bit WAV is unsigned
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    if x.size == 0:
        return np.zeros(dim)
    vec = np.array(
        [
            np.sqrt((s ** 2).mean()) if s.size else 0.0
            for s in np.array_split(x, dim)
        ]
    )
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def audio_stats(blob: bytes) -> dict:
    """WAV header + signal stats: (n_channels, sample_rate, n_frames,
    duration_ms, rms) — the metadata backfill step for the media
    table's typed meta struct."""
    import io
    import wave

    with wave.open(io.BytesIO(blob), "rb") as w:
        sw, nch = w.getsampwidth(), w.getnchannels()
        sr, nf = w.getframerate(), w.getnframes()
        raw = w.readframes(nf)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width: {sw}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:
        x = x - 128.0
    rms = float(np.sqrt((x ** 2).mean())) if x.size else 0.0
    return {
        "n_channels": nch,
        "sample_rate": sr,
        "n_frames": nf,
        "duration_ms": int(round(1000.0 * nf / sr)) if sr else 0,
        "rms": rms,
    }


def extract_audio_features(
    media: DataFrame, dim: int = FEATURE_DIM
) -> DataFrame:
    """Audio rows of the media table -> (doc_id, n_bytes, sample_rate,
    duration_ms, feature array<double>) via the REAL WAV decoder — the
    same mapInPandas batch shape as ``extract_features``."""
    from ..deploy import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)
    aud = media.filter(F.col("kind") == "audio").select("doc_id", "media")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "n_bytes": [], "sample_rate": [],
                "duration_ms": [], "feature": [],
            }
            for did, blob in zip(pdf["doc_id"], pdf["media"]):
                st = audio_stats(blob)
                rows["doc_id"].append(did)
                rows["n_bytes"].append(len(blob))
                rows["sample_rate"].append(st["sample_rate"])
                rows["duration_ms"].append(st["duration_ms"])
                rows["feature"].append(
                    [float(v) for v in decode_audio(blob, dim)]
                )
            yield pd.DataFrame(rows)

    return aud.mapInPandas(
        run,
        "doc_id long, n_bytes long, sample_rate long, duration_ms long,"
        " feature array<double>",
    )


def vit_patch_plan(
    images: DataFrame,
    patch: int = 16,
    max_patches: int = 4096,
    id_col: str = "image_id",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """ViT patch-grid layout planning (Dosovitskiy et al. ICLR'21 —
    "an image is worth 16x16 words"; the NaViT/pix2struct variable-
    resolution packing era makes this a DATA-PIPELINE computation, not
    a model one): per image, the patch grid its encoder will see, the
    right/bottom padding the resize stage must add, and a budget flag
    for images whose sequence length exceeds ``max_patches`` (those go
    to the downscale path). Pure integer arithmetic — ceil by
    floor-div — over METADATA columns; the pixel decode stays behind
    the codec-probed Arrow kernels (`decode_image`), exactly the
    image/plumbing split the multimodal module documents.
    -> (image_id, width, height, patches_x, patches_y, n_patches,
    pad_x, pad_y, over_budget) — all integers, scan-local, zero
    shuffle."""
    from pyspark.sql import functions as F

    p = int(patch)
    w = F.col(width_col).cast("long")
    h = F.col(height_col).cast("long")
    px = F.floor((w + p - 1) / p).cast("long")
    py = F.floor((h + p - 1) / p).cast("long")
    return images.select(
        F.col(id_col).alias("image_id"),
        w.alias("width"),
        h.alias("height"),
        px.alias("patches_x"),
        py.alias("patches_y"),
        (px * py).cast("long").alias("n_patches"),
        (px * p - w).cast("long").alias("pad_x"),
        (py * p - h).cast("long").alias("pad_y"),
        (px * py > int(max_patches)).alias("over_budget"),
    )
