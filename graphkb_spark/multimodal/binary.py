"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Two decoder registries with the same (bytes) -> dict contract:

- ``REAL_DECODERS`` — actual media decoding, capability-gated at
  import: PIL / soundfile / av upgrades when those libraries exist,
  else pure-stdlib parsers that are still REAL (PNG/JPEG/GIF/BMP
  dimensions from the container headers, WAV duration via the
  ``wave`` module, MP4 duration from the ISO-BMFF ``mvhd`` box).
  Header parsing is what production feature-extraction does anyway —
  dimensions/duration never require pixel/sample decode.
- ``DECODERS`` — deterministic digest-derived fakes, kept as the
  oracle-checkable harness: the correctness queries feed text bytes
  through the full mapInPandas/Arrow round-trip and verify every cell
  against DuckDB, which needs decode output that is a pure function
  of the payload bytes in both engines.

``extract_features(media, decoders=REAL_DECODERS)`` selects the real
path; per-row failures land in ``decode_error`` either way (quarantine
semantics — a corrupt file must never kill a 100 TB job).

Scale notes: binary payloads blow up task sizes — the readers set
``maxRecordsPerBatch`` low so Arrow batches stay bounded, and media
tables should be written with small row groups and a metadata-only
sidecar so filters prune before any payload is read.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def _decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decoder: derives a plausible (width, height)
    from the payload digest. Replace with PIL.Image.open on a real
    cluster — same contract."""
    d = hashlib.sha256(payload).digest()
    return {"width": 64 + d[0] % 192, "height": 64 + d[1] % 192, "duration_s": None}


def _decode_audio_stub(payload: bytes) -> dict:
    d = hashlib.sha256(payload).digest()
    # 0.5 + k/16 is binary-exact — no float rounding ambiguity between
    # engines (Python rounds half-even, SQL engines half-away)
    return {"width": None, "height": None, "duration_s": 0.5 + d[2] / 16.0}


def _decode_video_stub(payload: bytes) -> dict:
    raise NotImplementedError(
        "video decode requires ffmpeg bindings not present in this container"
    )


DECODERS = {
    "image": _decode_image_stub,
    "audio": _decode_audio_stub,
    "video": _decode_video_stub,
}


# --- real decoders (capability-gated) --------------------------------


def _image_dims_from_headers(b: bytes) -> tuple[int, int]:
    """Width/height from container headers — no pixel decode needed.

    Handles the four formats that cover essentially all web corpora:
    PNG (IHDR), JPEG (SOF segment walk), GIF (logical screen), BMP
    (BITMAPINFOHEADER). Raises ValueError for anything else."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return w, h
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOFn frame header
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                raise ValueError("corrupt JPEG segment stream")
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # no payload
                i += 2
                continue
            seglen = int.from_bytes(b[i + 2:i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(b[i + 5:i + 7], "big")
                w = int.from_bytes(b[i + 7:i + 9], "big")
                return w, h
            i += 2 + seglen
        raise ValueError("JPEG without SOF frame header")
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack_from("<HH", b, 6)
        return w, h
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack_from("<ii", b, 18)
        return w, abs(h)  # negative height = top-down DIB
    raise ValueError("unrecognized image container")


def _wav_duration_s(b: bytes) -> float:
    try:
        with wave.open(io.BytesIO(b)) as f:
            rate = f.getframerate()
            if rate <= 0:
                raise ValueError("WAV with zero frame rate")
            return f.getnframes() / rate
    except wave.Error as exc:
        raise ValueError(f"not a RIFF/WAVE payload: {exc}") from exc


def _mp4_duration_s(b: bytes) -> float:
    """Duration from the ISO-BMFF ``moov``/``mvhd`` box — the metadata
    walk ffprobe does, in ~20 lines of stdlib. Raises ValueError for
    non-MP4 containers (mkv/webm need real ffmpeg bindings)."""

    def boxes(buf: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(buf[i:i + 4], "big")
            kind = buf[i + 4:i + 8]
            if size == 1:  # 64-bit largesize
                if i + 16 > end:
                    break
                size = int.from_bytes(buf[i + 8:i + 16], "big")
            if size < 8 or i + size > end:
                break
            yield kind, i + 8, i + size
            i += size

    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (MP4) container")
    for kind, s, e in boxes(b, 0, len(b)):
        if kind != b"moov":
            continue
        for k2, s2, e2 in boxes(b, s, e):
            if k2 != b"mvhd":
                continue
            version = b[s2]
            if version == 1:
                timescale = int.from_bytes(b[s2 + 20:s2 + 24], "big")
                duration = int.from_bytes(b[s2 + 24:s2 + 32], "big")
            else:
                timescale = int.from_bytes(b[s2 + 12:s2 + 16], "big")
                duration = int.from_bytes(b[s2 + 16:s2 + 20], "big")
            if timescale <= 0:
                raise ValueError("mvhd with zero timescale")
            return duration / timescale
    raise ValueError("MP4 without moov/mvhd box")


def _build_real_decoders() -> dict:
    """Best real decoder per kind, capability-gated at import time:
    the optional libraries upgrade the stdlib parsers when installed
    (PIL opens dozens of formats; soundfile reads flac/ogg; av probes
    any container), and the stdlib parsers keep the contract real —
    not stubbed — in minimal environments like this one."""
    try:  # pragma: no cover - not installed in this container
        from PIL import Image

        def image(payload: bytes) -> dict:
            with Image.open(io.BytesIO(payload)) as im:
                return {"width": im.width, "height": im.height, "duration_s": None}
    except ImportError:

        def image(payload: bytes) -> dict:
            w, h = _image_dims_from_headers(payload)
            return {"width": w, "height": h, "duration_s": None}

    try:  # pragma: no cover - not installed in this container
        import soundfile as sf

        def audio(payload: bytes) -> dict:
            info = sf.info(io.BytesIO(payload))
            return {"width": None, "height": None,
                    "duration_s": info.frames / info.samplerate}
    except ImportError:

        def audio(payload: bytes) -> dict:
            return {"width": None, "height": None,
                    "duration_s": _wav_duration_s(payload)}

    try:  # pragma: no cover - not installed in this container
        import av

        def video(payload: bytes) -> dict:
            with av.open(io.BytesIO(payload)) as container:
                dur = (container.duration or 0) / 1_000_000
                streams = container.streams.video
                w = streams[0].width if streams else None
                h = streams[0].height if streams else None
                return {"width": w, "height": h, "duration_s": dur}
    except ImportError:

        def video(payload: bytes) -> dict:
            return {"width": None, "height": None,
                    "duration_s": _mp4_duration_s(payload)}

    return {"image": image, "audio": audio, "video": video}


REAL_DECODERS = _build_real_decoders()


def extract_features(media: DataFrame, decoders: dict | None = None) -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas.

    ``decoders`` selects the registry: ``REAL_DECODERS`` for actual
    media (default for production), ``DECODERS`` (the deterministic
    digest fakes, and this function's default for backward
    compatibility with the oracle-checked plumbing queries). Per-row
    decode failures land in ``decode_error`` (quarantine semantics,
    like every parser in this engine) — a corrupt file must never kill
    a 100 TB job."""
    registry = DECODERS if decoders is None else decoders

    def safe(decoder):
        def decode(payload: bytes) -> dict:
            try:
                return decoder(payload)
            except (NotImplementedError, ValueError, OSError) as exc:
                return {"decode_error": str(exc)[:200]}

        return decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            payload = pdf["payload"].map(lambda p: b"" if p is None else p)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": payload.map(len).astype("int64").to_numpy(),
                    "digest": payload.map(
                        lambda p: hashlib.sha256(p).hexdigest()
                    ).to_numpy(),
                }
            )
            # object dtype keeps None (not NaN) so Arrow maps cleanly to
            # nullable int/double columns
            for c in ("width", "height", "duration_s", "decode_error"):
                out[c] = pd.Series([None] * n, dtype=object)
            # per-kind columnar dispatch: one .map pass per media kind in
            # the batch (no per-row DataFrame row construction)
            for kind in pd.unique(out["kind"]):
                mask = (out["kind"] == kind).to_numpy()
                decoder = registry.get(kind)
                if decoder is None:
                    out.loc[mask, "decode_error"] = f"unknown media kind {kind!r}"
                    continue
                decoded = payload[mask].map(safe(decoder)).tolist()
                for c in ("width", "height", "duration_s", "decode_error"):
                    out.loc[mask, c] = pd.Series(
                        [d.get(c) for d in decoded], dtype=object
                    ).to_numpy()
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resize_error", T.StringType(), True),
    ]
)


def _resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: a real implementation decodes with
    PIL, resizes, re-encodes — same (bytes, w, h) -> bytes contract.
    The stub emits a digest-derived payload scaled to the target pixel
    count so batch-size behavior (output rows smaller/larger than
    input) is exercised for real."""
    d = hashlib.sha256(payload).digest()
    n = max(1, (width * height) // 256)
    return (d * (n // len(d) + 1))[:n]


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize over binary payloads via mapInPandas — the
    normalize-resolution step every multimodal training pipeline runs
    before feature extraction. Non-image rows pass through untouched
    (payload preserved, target dims null); per-row failures land in
    ``resize_error`` instead of killing the job.

    Scale shape: one narrow mapInPandas pass, no shuffle; output
    payload size is bounded by the target resolution, so downstream
    Arrow batches shrink to the normalized size regardless of input
    skew (a 100 MB raw image and a thumbnail cost the same after this)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "mime": pdf["mime"].to_numpy(),
                    "payload": pdf["payload"].to_numpy(),
                }
            )
            for c in ("width", "height", "resize_error"):
                out[c] = pd.Series([None] * n, dtype=object)
            mask = (out["kind"] == "image").to_numpy()
            if mask.any():
                def do(p):
                    try:
                        return (_resize_image_stub(b"" if p is None else p, width, height), None)
                    except (ValueError, OSError) as exc:  # decode/encode failures
                        return (None, str(exc)[:200])

                resized = [do(p) for p in out.loc[mask, "payload"]]
                out.loc[mask, "payload"] = pd.Series(
                    [r[0] for r in resized], dtype=object
                ).to_numpy()
                out.loc[mask, "resize_error"] = pd.Series(
                    [r[1] for r in resized], dtype=object
                ).to_numpy()
                out.loc[mask, "width"] = width
                out.loc[mask, "height"] = height
            yield out[[f.name for f in RESIZED_SCHEMA.fields]]

    return media.select(
        "media_id", "kind", "mime", "payload"
    ).mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row into frame
    timestamps (decode stubbed). Shows the explode-side shape a real
    sampler would fill with frame payloads."""
    feats = extract_features(media.filter(F.col("kind") == "video"))
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.coalesce("duration_s", F.lit(0.0)) / every_s).cast("int"), F.lit(0)),
            )
        ).alias("frame_idx"),
    ).withColumn("frame_ts_s", F.col("frame_idx") * every_s)


PCM_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("energy", T.DoubleType(), True),
    ]
)


def pcm_frame_energy(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    frame_samples: int = 160,
) -> DataFrame:
    """A REAL audio decoder (not a stub — raw PCM needs no external
    library): interpret the binary payload as little-endian int16 PCM
    and emit per-frame RMS energy, the voice-activity/silence-trim
    signal an audio training pipeline computes first. Returns
    (media_id, frame_idx, n_samples, energy); a payload with an odd
    byte count drops the trailing byte (truncated write), an
    empty/NULL payload emits no frames.

    Engine-determinism: the per-frame sum of squares is exact int64
    (numpy), then ONE division and sqrt — correctly-rounded IEEE — and
    a 6-digit round, so an external engine computing from the same
    samples matches bit-for-bit. Scale shape: ``mapInPandas`` over the
    payload column — one scan, Arrow-batched, no shuffle; output rows
    are frames (payload_bytes / 2 / frame_samples per row)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "n_samples": [], "energy": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None or len(payload) < 2:
                    continue
                buf = bytes(payload)
                samples = np.frombuffer(
                    buf[: len(buf) - (len(buf) % 2)], dtype="<i2"
                ).astype(np.int64)
                for f in range(0, len(samples), frame_samples):
                    frame = samples[f : f + frame_samples]
                    ss = int((frame * frame).sum())
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(f // frame_samples)
                    out["n_samples"].append(int(len(frame)))
                    out["energy"].append(
                        round(float(np.sqrt(ss / len(frame))), 6)
                    )
            yield pd.DataFrame(out)

    return media.select(id_col, payload_col).mapInPandas(
        run, schema=PCM_FRAME_SCHEMA
    )
