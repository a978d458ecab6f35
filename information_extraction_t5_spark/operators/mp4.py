"""ISO-BMFF (MP4/MOV) metadata parsing — stdlib struct only.

Parses the box tree (ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/stbl/stsd)
and extracts what a data-curation pipeline routes and filters on:
duration, movie timescale, per-track kind (video/audio) + codec fourcc,
video width/height.  Frame DECODE stays on the codec injection point
(multimodal.decode_real) — h264/h265/aac entropy decoding has no
stdlib-tier implementation — but duration/dims/codec stats, the
frame_sample_plan inputs, come from the real container.

``write_minimal_mp4`` builds a structurally-valid metadata-only MP4
(ftyp + moov, no media data) so the parser is testable with no external
fixtures and synthetic corpora can carry real video *containers*.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(data: bytes, start: int, end: int, depth: int = 0):
    """Yield (fourcc, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4: pos + 8]
        body = pos + 8
        header = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError(f"corrupt mp4 box {fourcc!r} at {pos}")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
            header = 16  # a largesize below its own header is corrupt
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"corrupt mp4 box {fourcc!r} at {pos}")
        yield fourcc, body, pos + size
        pos += size


def parse_mp4(payload: bytes) -> Dict:
    """-> {brand, timescale, duration_s, tracks: [{kind, codec, width,
    height, duration_s}]}.  Raises ValueError/NotImplementedError on
    non-BMFF input."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise NotImplementedError("not an ISO-BMFF (mp4) payload")
    out: Dict = {"brand": payload[8:12].decode("latin1"),
                 "timescale": None, "duration_s": None, "tracks": []}

    def visit(fourcc: bytes, body: int, box_end: int,
              track: Optional[Dict]) -> None:
        if fourcc == b"mvhd":
            ver = payload[body]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", payload, body + 20)
            else:
                ts, dur = struct.unpack_from(">II", payload, body + 12)
            out["timescale"] = ts
            out["duration_s"] = round(dur / max(ts, 1), 6)
        elif fourcc == b"tkhd" and track is not None:
            ver = payload[body]
            off = body + (32 + 12 if ver == 1 else 20 + 12)
            # layer(2) alt(2) volume(2) reserved(2) matrix(36) -> w, h
            off += 8 + 36
            w16, h16 = struct.unpack_from(">II", payload, off)
            track["width"] = w16 >> 16
            track["height"] = h16 >> 16
        elif fourcc == b"mdhd" and track is not None:
            ver = payload[body]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", payload, body + 20)
            else:
                ts, dur = struct.unpack_from(">II", payload, body + 12)
            track["duration_s"] = round(dur / max(ts, 1), 6)
        elif fourcc == b"hdlr" and track is not None:
            handler = payload[body + 8: body + 12]
            track["kind"] = {b"vide": "video", b"soun": "audio"}.get(
                handler, handler.decode("latin1"))
        elif fourcc == b"stsd" and track is not None:
            (n,) = struct.unpack_from(">I", payload, body + 4)
            if n >= 1:
                track["codec"] = payload[body + 12: body + 16].decode(
                    "latin1")

    def recurse(start: int, end: int, track: Optional[Dict]) -> None:
        for fourcc, body, box_end in _walk(payload, start, end):
            if fourcc == b"trak":
                t: Dict = {"kind": None, "codec": None, "width": None,
                           "height": None, "duration_s": None}
                out["tracks"].append(t)
                recurse(body, box_end, t)
            elif fourcc in _CONTAINERS:
                recurse(body, box_end, track)
            else:
                visit(fourcc, body, box_end, track)

    recurse(0, len(payload), None)
    if out["timescale"] is None:
        raise ValueError("mp4 has no moov/mvhd (fragmented or truncated)")
    return out


# ---------------------------------------------------------------------------
# minimal writer (metadata-only container, for tests/synthetic corpora)
# ---------------------------------------------------------------------------

def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + fourcc + payload


def _matrix() -> bytes:
    return struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                       0x40000000)


def write_minimal_mp4(duration_s: float, tracks: List[Tuple[str, str,
                                                            int, int]],
                      timescale: int = 1000) -> bytes:
    """tracks: [(kind 'video'|'audio', codec fourcc, width, height)] ->
    structurally valid metadata-only MP4 bytes."""
    dur = int(round(duration_s * timescale))
    mvhd = _box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, timescale, dur)
                + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                + b"\x00" * 8 + _matrix() + b"\x00" * 24
                + struct.pack(">I", len(tracks) + 1))
    traks = b""
    for i, (kind, codec, w, h) in enumerate(tracks):
        tkhd = _box(b"tkhd", struct.pack(">IIIII", 0x7, 0, 0, i + 1, 0)
                    + struct.pack(">I", dur) + b"\x00" * 8
                    + struct.pack(">HHHH", 0, 0,
                                  0x0100 if kind == "audio" else 0, 0)
                    + _matrix()
                    + struct.pack(">II", w << 16, h << 16))
        mdhd = _box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, timescale,
                                         dur)
                    + struct.pack(">HH", 0x55C4, 0))  # 'und' language
        handler = b"vide" if kind == "video" else b"soun"
        hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + handler
                    + b"\x00" * 12 + b"handler\x00")
        entry = _box(codec.encode("latin1")[:4].ljust(4, b" "),
                     b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70)
        stsd = _box(b"stsd", struct.pack(">II", 0, 1) + entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        traks += _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov
