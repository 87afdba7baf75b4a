"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The Spark-side machinery here is real and tested: typed schemas for binary
payloads + metadata, Arrow-batched ``mapInPandas`` operators with correct
batch shapes and partitioning, deterministic synthesis of binary fixtures.
The actual codec step is STUBBED — image/audio libraries are not in this
container — behind :func:`decode_image`, which raises ``NotImplementedError``
unless ``fake=True`` selects the deterministic fake decoder used by tests.

At 100 TB the load-bearing decisions are exactly the ones exercised here:
  * binary payloads travel in Arrow record batches (zero-copy into pandas),
  * per-batch (not per-row) Python execution via ``mapInPandas``,
  * metadata (width/height/codec/duration) is columnar and filterable
    WITHOUT touching bytes — predicate pushdown on metadata prunes the
    payload scan (Parquet column pruning skips the binary column entirely
    for metadata-only queries),
  * partition sizing by byte budget, not row count
    (``repartition_by_bytes``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# typed media-asset schema: payload + queryable metadata
MEDIA_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_histogram", T.ArrayType(T.IntegerType()), False),
        T.StructField("content_md5", T.StringType(), False),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, seed_col: str) -> DataFrame:
    """Deterministic binary fixtures: payload = repeated md5 bytes of the
    seed column; metadata derived from the id. Lets the full binary path
    (schema → shuffle → Arrow → pandas) run without any codec library."""
    # concat of 8 binary copies (128 bytes); F.repeat is string-typed and
    # would mangle the bytes through a charset round-trip
    digest = F.unhex(F.md5(F.col(seed_col)))
    payload = F.concat(*[digest] * 8)
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.lit("fake").alias("codec"),
        (F.col(id_col) % 1920 + 1).cast("int").alias("width"),
        (F.col(id_col) % 1080 + 1).cast("int").alias("height"),
        (F.col(id_col) % 60000).cast("int").alias("duration_ms"),
        payload.alias("payload"),
    )


try:  # real codec path when pillow is installed; this container lacks it
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None


def decode_image(payload: bytes, fake: bool = False) -> list[list[int]]:
    """Decode an image payload to pixel rows (grayscale ints).

    Real path: PIL when available (guarded optional import — decodes any
    PIL-supported format, converts to 8-bit grayscale, returns the pixel
    matrix). The ``fake=True`` path is the deterministic stand-in used by
    tests — 2×2 "pixels" from the payload's first bytes — and keeps CI
    independent of codec libraries.
    """
    if fake:
        b = payload or b"\x00\x00\x00\x00"
        return [[b[0], b[1]], [b[2] if len(b) > 2 else 0, b[3] if len(b) > 3 else 0]]
    if _PILImage is None:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "install pillow (PIL) to enable the real decode path"
        )
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("L")
    w, h = img.size
    px = list(img.getdata())
    return [px[r * w : (r + 1) * w] for r in range(h)]


def extract_features(assets: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the canonical multimodal operator shape. The feature
    fn itself is trivially replaceable with a real model/codec call; the
    batching, schema, and shuffle behavior are what matter.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                hist = [0] * 8
                for byte in b:
                    hist[byte >> 5] += 1
                out.append(
                    {
                        "asset_id": asset_id,
                        "n_bytes": len(b),
                        "byte_mean": (sum(b) / len(b)) if b else 0.0,
                        "byte_histogram": hist,
                        "content_md5": hashlib.md5(b).hexdigest(),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES.fields])

    # NB: no blanket repartition here — shuffling binary payloads costs more
    # than the per-batch python work saves; use repartition_by_bytes when
    # real payloads make the work worth spreading
    return assets.select("asset_id", "payload").mapInPandas(_extract, IMAGE_FEATURES)


def repartition_by_bytes(assets: DataFrame, target_partition_mb: int = 128, est_row_bytes: int | None = None) -> DataFrame:
    """Partition-size by byte budget: binary rows are orders of magnitude
    wider than relational rows, so row-count-based defaults overload
    executors. Estimates bytes/row (metadata + payload length) if not given
    and repartitions so each partition ≈ target MB."""
    if est_row_bytes is None:
        sample = assets.select(
            (F.coalesce(F.length("payload"), F.lit(0)) + 64).alias("sz")
        ).agg(F.avg("sz").alias("avg_sz"), F.count("*").alias("n")).collect()[0]
        est_row_bytes = int(sample["avg_sz"] or 1)
        n_rows = int(sample["n"])
    else:
        n_rows = assets.count()
    total = est_row_bytes * n_rows
    parts = max(1, total // (target_partition_mb * 1024 * 1024))
    return assets.repartition(int(parts))


RESIZED = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("resized_mean", T.DoubleType(), False),
    ]
)


def resize_images(
    assets: DataFrame,
    out_w: int = 4,
    out_h: int = 4,
    src_w: int = 16,
    src_h: int = 8,
) -> DataFrame:
    """Nearest-neighbour resize over binary payloads via ``mapInPandas`` —
    the decode → transform → summarize shape of a real thumbnailing stage.
    The payload is interpreted as a ``src_h×src_w`` byte matrix (the layout
    of :func:`synthesize_media` fixtures: 8 repeats of the 16-byte md5
    digest); a real pipeline swaps the ``np.frombuffer`` line for a codec
    decode and keeps everything else — Arrow batching, numpy index-gather
    kernel (one vectorized op per image, no per-pixel Python), typed output
    schema — unchanged."""
    import numpy as np

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ri = (np.arange(out_h) * src_h) // out_h
        ci = (np.arange(out_w) * src_w) // out_w
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if len(b) < src_w * src_h:
                    b = b.ljust(src_w * src_h, b"\x00")
                m = np.frombuffer(b[: src_w * src_h], dtype=np.uint8).reshape(
                    src_h, src_w
                )
                resized = m[np.ix_(ri, ci)]
                rows.append(
                    {
                        "asset_id": asset_id,
                        "out_w": out_w,
                        "out_h": out_h,
                        "resized_mean": float(resized.mean()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED.fields])

    return assets.select("asset_id", "payload").mapInPandas(_resize, RESIZED)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode each video asset into the frame
    timestamps a decoder would extract (the decode itself is the stub).
    Demonstrates the explode-then-decode shape where frame extraction
    parallelizes across the cluster rather than per-file."""
    frames = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
    return (
        assets.filter(F.col("media_type") == "video")
        .select("asset_id", "duration_ms", F.explode(frames).alias("frame_ts_ms"))
    )


PCM_FRAMES = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("energy", T.LongType(), False),
        T.StructField("mean_amp", T.DoubleType(), False),
    ]
)


def synthesize_pcm(df: DataFrame, id_col: str, seed_col: str, blocks: int = 8) -> DataFrame:
    """Deterministic fake PCM audio: payload = ``blocks`` CONCATENATED
    md5 digests of (seed || '|' || block_idx) — unlike
    :func:`synthesize_media`'s repeated single digest, every 16-byte frame
    is distinct, so frame-level operators produce non-degenerate output.
    Bytes are md5-derived, so an engine-independent oracle can re-derive
    every sample value from hex arithmetic alone."""
    payload = F.concat(
        *[
            F.unhex(F.md5(F.concat(F.col(seed_col), F.lit(f"|{k}"))))
            for k in range(blocks)
        ]
    )
    return df.filter(F.col(seed_col).isNotNull()).select(
        F.col(id_col).alias("asset_id"),
        F.lit("pcm_u8").alias("codec"),
        F.lit(8000).alias("sample_rate"),
        payload.alias("payload"),
    )


def frame_energy(assets: DataFrame, frame_bytes: int = 16) -> DataFrame:
    """Per-frame audio energy/mean over unsigned-8-bit PCM payloads — the
    audio leg of the multimodal surface (silence trimming, VAD windowing,
    loudness normalization all start from exactly this frame scan). One
    numpy reshape+sum per Arrow batch (``mapInPandas``); integer-exact
    energies, so the query carries an exact hex-math SQL oracle."""
    import numpy as np

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_frames = len(b) // frame_bytes
                fr = b[: n_frames * frame_bytes].reshape(n_frames, frame_bytes).astype(np.int64)
                energy = (fr * fr).sum(axis=1)
                mean = fr.sum(axis=1) / float(frame_bytes)
                for i in range(n_frames):
                    out.append(
                        {
                            "asset_id": asset_id,
                            "frame_idx": i,
                            "energy": int(energy[i]),
                            "mean_amp": float(mean[i]),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in PCM_FRAMES.fields])

    return assets.select("asset_id", "payload").mapInPandas(_frames, PCM_FRAMES)
