"""ISO-BMFF metadata parsing (operators/mp4.py): writer->parser round
trip, 64-bit box sizes, v1 timestamps, and the multimodal hookup."""
import struct

import pytest

from information_extraction_t5_spark.operators.mp4 import (
    parse_mp4,
    write_minimal_mp4,
)


def test_round_trip_av_tracks():
    payload = write_minimal_mp4(
        12.5, [("video", "avc1", 1920, 1080), ("audio", "mp4a", 0, 0)]
    )
    meta = parse_mp4(payload)
    assert meta["brand"] == "isom"
    assert meta["duration_s"] == pytest.approx(12.5, abs=1e-3)
    kinds = [t["kind"] for t in meta["tracks"]]
    assert kinds == ["video", "audio"]
    v, a = meta["tracks"]
    assert (v["width"], v["height"]) == (1920, 1080)
    assert v["codec"] == "avc1"
    assert a["codec"] == "mp4a"
    assert v["duration_s"] == pytest.approx(12.5, abs=1e-3)


def test_video_only_and_odd_dims():
    meta = parse_mp4(write_minimal_mp4(0.04, [("video", "hev1", 640,
                                               360)], timescale=25))
    assert meta["duration_s"] == pytest.approx(0.04)
    assert meta["tracks"][0]["codec"] == "hev1"


def test_non_bmff_raises():
    with pytest.raises(NotImplementedError):
        parse_mp4(b"\x00\x01garbage not a box")
    with pytest.raises((ValueError, NotImplementedError)):
        # valid ftyp but truncated moov -> corrupt, not silently parsed
        good = write_minimal_mp4(1.0, [("video", "avc1", 64, 64)])
        parse_mp4(good[: len(good) // 2])


def test_largesize_and_v1_mvhd():
    """Hand-build a moov with a 64-bit box size and a version-1 mvhd
    (u64 times) — the shapes real muxers emit for >4GB files."""
    ts, dur = 90000, 90000 * 7
    mvhd_v1 = (b"\x01\x00\x00\x00"            # version 1
               + struct.pack(">QQIQ", 0, 0, ts, dur)
               + struct.pack(">IHH", 0x00010000, 0x0100, 0)
               + b"\x00" * 8 + b"\x00" * 36 + b"\x00" * 24
               + struct.pack(">I", 2))
    mvhd = struct.pack(">I", len(mvhd_v1) + 8) + b"mvhd" + mvhd_v1
    inner = mvhd
    moov = (struct.pack(">I", 1) + b"moov"
            + struct.pack(">Q", len(inner) + 16) + inner)
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    meta = parse_mp4(ftyp + moov)
    assert meta["timescale"] == ts
    assert meta["duration_s"] == pytest.approx(7.0)


def test_multimodal_hookup():
    from information_extraction_t5_spark.operators.multimodal import (
        decode_stdlib,
    )

    f = decode_stdlib(
        write_minimal_mp4(30.0, [("video", "avc1", 1280, 720),
                                 ("audio", "mp4a", 0, 0)]),
        "video",
    )
    assert f[0] == pytest.approx(30.0)
    assert f[1:4] == [1280.0, 720.0, pytest.approx(1280 / 720)]
    assert f[4] == 1.0 and f[5] == 1.0   # one video + one audio track
