"""Real (capability-gated) multimodal decoders: stdlib header parsers
must produce true dimensions/durations through the same mapInPandas
quarantine contract the stub path uses."""
import io
import struct
import wave

import pytest


@pytest.fixture(scope="module")
def spark():
    from graphkb_spark.session import get_spark

    return get_spark()


def _png(w, h):
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4)


def _jpeg(w, h):
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def _bmp(w, h):
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, -h) + b"\x00" * 8


def _wav(seconds, rate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(b"\x00\x00" * int(seconds * rate))
    return buf.getvalue()


def _mp4(duration, timescale=1000):
    mvhd = (b"\x00\x00\x00\x00" + b"\x00" * 8
            + struct.pack(">II", timescale, duration) + b"\x00" * 80)
    moov_payload = struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    moov = struct.pack(">I", 8 + len(moov_payload)) + b"moov" + moov_payload
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    return ftyp + moov


def test_header_parsers_direct():
    from graphkb_spark.multimodal.binary import (
        _image_dims_from_headers,
        _mp4_duration_s,
        _wav_duration_s,
    )

    assert _image_dims_from_headers(_png(640, 480)) == (640, 480)
    assert _image_dims_from_headers(_jpeg(1024, 768)) == (1024, 768)
    assert _image_dims_from_headers(_gif(320, 200)) == (320, 200)
    assert _image_dims_from_headers(_bmp(800, 600)) == (800, 600)
    with pytest.raises(ValueError):
        _image_dims_from_headers(b"not an image")
    assert _wav_duration_s(_wav(0.5)) == 0.5
    with pytest.raises(ValueError):
        _wav_duration_s(b"RIFFgarbage")
    assert _mp4_duration_s(_mp4(2500, 1000)) == 2.5
    with pytest.raises(ValueError):
        _mp4_duration_s(b"\x00\x00\x00\x08free")


def test_extract_features_real_path(spark):
    from graphkb_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        REAL_DECODERS,
        extract_features,
    )

    media = spark.createDataFrame(
        [
            (1, "image", "image/png", _png(640, 480), {}),
            (2, "image", "image/jpeg", _jpeg(1024, 768), {}),
            (3, "audio", "audio/wav", _wav(0.5), {}),
            (4, "video", "video/mp4", _mp4(2500), {}),
            (5, "image", "image/png", b"corrupt bytes", {}),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in
            extract_features(media, decoders=REAL_DECODERS).collect()}
    assert (rows[1].width, rows[1].height) == (640, 480)
    assert (rows[2].width, rows[2].height) == (1024, 768)
    assert rows[3].duration_s == 0.5
    assert rows[4].duration_s == 2.5
    # corrupt payload quarantines, never raises
    assert rows[5].decode_error is not None and rows[5].width is None
    assert all(rows[i].decode_error is None for i in (1, 2, 3, 4))


def test_extract_features_stub_path_unchanged(spark):
    """The deterministic digest-fake path (oracle harness) still
    decodes anything byte-deterministically."""
    from graphkb_spark.multimodal.binary import MEDIA_SCHEMA, extract_features

    media = spark.createDataFrame(
        [(1, "image", None, b"any bytes at all", {})], MEDIA_SCHEMA
    )
    r = extract_features(media).collect()[0]
    assert r.decode_error is None and r.width is not None
