"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs via
mapInPandas. Decode kernels: REAL for formats decodable without external
codecs — binary PPM/PGM images (pure numpy) and RIFF/WAVE audio (stdlib
`wave`) — and an honest deterministic fake (decode_status='stubbed_fake')
for compressed formats (JPEG/PNG/MP4) this container can't decode; swap the
fake for PIL/ffmpeg kernels where they ship.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "doc_id bigint, media_type string, payload binary, "
    "width int, height int, n_frames int, sample_rate int"
)

FEATURE_SCHEMA_DDL = (
    "doc_id bigint, media_type string, n_bytes bigint, sha1 string, "
    "feature array<float>, decode_status string"
)

_HAVE_REAL_DECODERS = False  # no PIL/cv2/ffmpeg in this container
FEATURE_DIM = 8


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for compressed formats (JPEG/PNG/MP4 — no
    codecs in this container): derives FEATURE_DIM floats from the payload
    digest. Replace with PIL/ffmpeg kernels where they ship (gate:
    _HAVE_REAL_DECODERS)."""
    digest = hashlib.sha1(payload or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """Parse a P5/P6 header: returns (width, height, maxval, data_offset) or
    None. Single bounded implementation shared by decode and resize so the
    two can never drift (and neither can loop past the payload end)."""
    if payload[:2] not in (b"P6", b"P5"):
        return None
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to EOL
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    try:
        width, height, maxval = (int(t) for t in tokens)
    except (ValueError, TypeError):
        return None
    # reject non-positive dims here (shared bar): a negative width from a
    # malformed header like 'P6\n-1 4\n255\n' would otherwise survive both
    # callers' size checks (need goes negative) and reshape(-1, ...) would
    # yield an empty image with NaN means under decode_status='ok_ppm'.
    if width <= 0 or height <= 0 or maxval <= 0:
        return None
    return width, height, maxval, i


def _decode_ppm(payload: bytes) -> tuple[list[float], str] | None:
    """REAL decode for binary PPM/PGM (P6/P5) images — pure numpy, no
    external codec. Features: per-quadrant mean intensity (4) + global
    mean/std + normalized width/height."""
    import numpy as np

    header = _parse_ppm_header(payload)
    if header is None:
        return None
    width, height, maxval, i = header
    channels = 3 if payload[:2] == b"P6" else 1
    need = width * height * channels
    raw = payload[i : i + need]
    if maxval > 255 or len(raw) < need or not need:
        return None
    px = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) / maxval
    img = px.reshape(height, width, channels).mean(axis=2)
    h2, w2 = max(height // 2, 1), max(width // 2, 1)
    quads = [
        float(img[:h2, :w2].mean()),
        float(img[:h2, w2:].mean() if width > 1 else img[:h2, :w2].mean()),
        float(img[h2:, :w2].mean() if height > 1 else img[:h2, :w2].mean()),
        float(
            img[h2:, w2:].mean()
            if height > 1 and width > 1
            else img[:h2, :w2].mean()
        ),
    ]
    feats = quads + [
        float(img.mean()),
        float(img.std()),
        min(width / 4096.0, 1.0),
        min(height / 4096.0, 1.0),
    ]
    return feats, "ok_ppm"


def _decode_wav(payload: bytes) -> tuple[list[float], str] | None:
    """REAL decode for RIFF/WAVE audio — stdlib `wave`, no external codec.
    Features: RMS energy over 6 equal time chunks + normalized duration +
    normalized sample rate."""
    import io
    import wave

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as w:
            n, width, rate = w.getnframes(), w.getsampwidth(), w.getframerate()
            frames = w.readframes(n)
    except (wave.Error, EOFError):
        return None
    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    else:
        return None
    if not len(x) or not rate:
        return None
    chunks = np.array_split(x, 6)
    rms = [float(np.sqrt((c**2).mean())) if len(c) else 0.0 for c in chunks]
    feats = rms + [min(len(x) / rate / 3600.0, 1.0), min(rate / 96000.0, 1.0)]
    return feats, "ok_wav"


def decode_features(payload: bytes) -> tuple[list[float], str]:
    """Best-available decode: real PPM/PGM and WAV kernels (pure
    stdlib/numpy), deterministic fake for formats needing codecs this
    container doesn't ship."""
    if payload:
        for dec in (_decode_ppm, _decode_wav):
            try:
                out = dec(payload)
            except Exception:  # noqa: BLE001 — corrupt media must not fail the job
                out = None
            if out is not None:
                return out
    return _fake_decode_features(payload), (
        "ok" if _HAVE_REAL_DECODERS else "stubbed_fake"
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode + featurize media payloads with an Arrow-batched kernel.

    Real plumbing: column pruning keeps only (doc_id, media_type, payload);
    batches arrive as pandas; output schema is fixed. The decode itself is a
    deterministic fake until real codecs are present."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            decoded = [
                decode_features(
                    bytes(p) if isinstance(p, (bytes, bytearray)) else b""
                )
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "sha1": payloads.map(
                        lambda p: hashlib.sha1(p or b"").hexdigest()
                    ),
                    "feature": [f for f, _ in decoded],
                    "decode_status": [s for _, s in decoded],
                }
            )

    pruned = media.select("doc_id", "media_type", "payload")
    return pruned.mapInPandas(run, schema=FEATURE_SCHEMA_DDL)


def _resize_ppm(payload: bytes, max_dim: int) -> bytes | None:
    """REAL nearest-neighbor resize for binary PPM (P6) payloads — pure
    numpy. Returns a re-encoded P6 whose longest side is ≤ max_dim, or None
    if the payload isn't decodable PPM (caller passes those through)."""
    import numpy as np

    if payload[:2] != b"P6":
        return None
    header = _parse_ppm_header(payload)
    if header is None:
        return None
    width, height, maxval, i = header
    # same validity bar as _decode_ppm, without paying a throwaway decode
    if maxval > 255 or width * height == 0 or len(payload) < i + width * height * 3:
        return None
    img = np.frombuffer(payload[i : i + width * height * 3], dtype=np.uint8)
    img = img.reshape(height, width, 3)
    scale = max(width, height) / max_dim
    if scale <= 1:
        return payload
    nw, nh = max(int(width / scale), 1), max(int(height / scale), 1)
    ys = (np.arange(nh) * height // nh).clip(0, height - 1)
    xs = (np.arange(nw) * width // nw).clip(0, width - 1)
    small = img[ys][:, xs]
    return b"P6\n%d %d\n%d\n" % (nw, nh, maxval) + small.tobytes()


def resize_media(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize op over the media table (Arrow-batched mapInPandas): PPM
    payloads are REALLY downsampled (nearest neighbor) to max_dim; other
    formats pass through unchanged with resize_status='passthrough'."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads, statuses = [], []
            for p in pdf["payload"]:
                raw = bytes(p) if isinstance(p, (bytes, bytearray)) else b""
                try:
                    resized = _resize_ppm(raw, max_dim)
                except Exception:  # noqa: BLE001 — corrupt media passes through
                    resized = None
                if resized is None:
                    out_payloads.append(raw)
                    statuses.append("passthrough")
                else:
                    out_payloads.append(resized)
                    statuses.append(
                        "resized" if resized is not raw else "already_small"
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out_payloads,
                    "resize_status": statuses,
                }
            )

    pruned = media.select("doc_id", "media_type", "payload")
    return pruned.mapInPandas(
        run,
        schema="doc_id bigint, media_type string, payload binary, resize_status string",
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: expands per-video frame indices natively
    (sequence+explode) so the decode UDF receives (payload, frame_idx) work
    units — the shuffle-free fan-out pattern for video pipelines."""
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ),
        )
        .select("doc_id", "payload", "frame_idx")
    )
