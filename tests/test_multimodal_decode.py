"""Real stdlib decode tier for multimodal payloads (r4).

WAV / P6 PPM / 24bpp BMP are genuinely parsed (stdlib wave + struct +
numpy); features are checked against independently computed values, and
the Spark mapInPandas stage runs the real decoder end-to-end with the
ok=False fallback exercised by undecodable payloads.
"""
import io
import math
import struct
import wave

import pytest

from information_extraction_t5_spark.operators.multimodal import (
    decode_stdlib,
    extract_features,
    synthetic_real_media_df,
)


def _sine_wav(rate=8000, nframes=800, freq=440.0, amp=20000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(
            struct.pack("<h", int(amp * math.sin(2 * math.pi * freq * t / rate)))
            for t in range(nframes)
        ))
    return buf.getvalue()


def test_wav_decode_features():
    rate, nframes, freq = 8000, 800, 440.0
    f = decode_stdlib(_sine_wav(rate, nframes, freq), "audio")
    assert len(f) == 8
    duration, rate_n, channels, rms, zcr, peak, mframes, width = f
    assert duration == pytest.approx(nframes / rate, abs=1e-6)
    assert rate_n == pytest.approx(rate / 48000, abs=1e-6)
    assert channels == 1.0 and width == 2.0
    # full-scale sine: rms ~ amp/sqrt(2)/32768, zcr ~ 2*freq/rate
    assert rms == pytest.approx(20000 / 32768 / math.sqrt(2), rel=0.01)
    assert zcr == pytest.approx(2 * freq / rate, rel=0.05)
    assert peak == pytest.approx(20000 / 32768, rel=0.01)


def test_ppm_decode_features():
    w, h = 4, 2
    # all pixels (10, 200, 30)
    payload = f"P6\n{w} {h}\n255\n".encode() + bytes([10, 200, 30]) * (w * h)
    f = decode_stdlib(payload, "image")
    assert f[:3] == [4.0, 2.0, 2.0]
    assert f[3] == pytest.approx(10 / 255, abs=1e-5)
    assert f[4] == pytest.approx(200 / 255, abs=1e-5)
    assert f[5] == pytest.approx(30 / 255, abs=1e-5)


def test_bmp_decode_features():
    w, h = 3, 2
    row = bytes([30, 200, 10]) * w  # BGR on disk
    row += b"\x00" * ((4 - (w * 3) % 4) % 4)
    pix = row * h
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pix), 2835, 2835, 0, 0))
    f = decode_stdlib(header + pix, "image")
    assert f[:3] == [3.0, 2.0, 1.5]
    # features report RGB: mean_r from the BGR byte 2
    assert f[3] == pytest.approx(10 / 255, abs=1e-5)
    assert f[4] == pytest.approx(200 / 255, abs=1e-5)
    assert f[5] == pytest.approx(30 / 255, abs=1e-5)


def test_png_decode_rgb_means():
    from information_extraction_t5_spark.operators.multimodal import write_png

    w, h = 5, 3
    pixels = bytes([40, 120, 220]) * (w * h)  # uniform RGB
    f = decode_stdlib(write_png(w, h, pixels, channels=3), "image")
    assert f[:3] == [5.0, 3.0, round(5 / 3, 6)]
    assert f[3] == pytest.approx(40 / 255, abs=1e-5)
    assert f[4] == pytest.approx(120 / 255, abs=1e-5)
    assert f[5] == pytest.approx(220 / 255, abs=1e-5)
    assert f[6] == 1.0  # no alpha channel -> opaque


def test_png_decode_rgba_and_gray():
    from information_extraction_t5_spark.operators.multimodal import write_png

    # RGBA: alpha mean must land in slot 6
    pixels = bytes([10, 20, 30, 128]) * 4
    f = decode_stdlib(write_png(2, 2, pixels, channels=4), "image")
    assert f[3] == pytest.approx(10 / 255, abs=1e-5)
    assert f[6] == pytest.approx(128 / 255, abs=1e-5)
    # grayscale: mean replicated across rgb slots
    g = decode_stdlib(write_png(3, 1, bytes([200, 100, 0]), channels=1),
                      "image")
    assert g[3] == g[4] == g[5] == pytest.approx(100 / 255, abs=1e-5)


def test_png_unfilters_all_filter_types():
    """Scanlines filtered with Sub/Up/Average/Paeth must reconstruct the
    original pixels — the test FORWARD-filters known rows per the PNG spec
    and checks the decoder's means against the unfiltered truth."""
    import struct
    import zlib

    from information_extraction_t5_spark.operators.multimodal import (
        PNG_SIG,
        _png_features,
    )

    w, h, ch = 4, 4, 3
    # deterministic non-uniform image
    img = [[((x * 31 + y * 17 + c * 7) % 256) for c in range(ch)]
           for y in range(h) for x in range(w)]
    rows = [img[y * w: (y + 1) * w] for y in range(h)]

    def flat(r):
        return [b for px in r for b in px]

    def forward(ftype, cur, prev):
        c_, p_ = flat(cur), flat(prev)
        out = []
        for x, v in enumerate(c_):
            a = c_[x - ch] if x >= ch else 0
            b = p_[x]
            cc = p_[x - ch] if x >= ch else 0
            if ftype == 1:
                out.append((v - a) % 256)
            elif ftype == 2:
                out.append((v - b) % 256)
            elif ftype == 3:
                out.append((v - (a + b) // 2) % 256)
            else:  # paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else cc)
                out.append((v - pred) % 256)
        return bytes(out)

    zero = [[0] * ch] * w
    raw = b"\x01" + forward(1, rows[0], zero)
    raw += b"\x02" + forward(2, rows[1], rows[0])
    raw += b"\x03" + forward(3, rows[2], rows[1])
    raw += b"\x04" + forward(4, rows[3], rows[2])

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF)

    payload = (PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
    f = _png_features(payload, 8)
    want = [sum(px[c] for px in img) / len(img) / 255.0 for c in range(3)]
    assert f[3] == pytest.approx(want[0], abs=1e-5)
    assert f[4] == pytest.approx(want[1], abs=1e-5)
    assert f[5] == pytest.approx(want[2], abs=1e-5)


def test_undecodable_raises():
    # a PNG signature with garbage chunks is NOT silently accepted
    with pytest.raises(NotImplementedError):
        decode_stdlib(b"\x89PNG\r\n\x1a\n....", "image")
    # palette/16-bit/interlaced PNGs stay on the codec injection point
    import struct
    import zlib

    from information_extraction_t5_spark.operators.multimodal import PNG_SIG

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF)

    palette = (PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
               + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_stdlib(palette, "image")
    with pytest.raises(NotImplementedError):
        decode_stdlib(b"\x00\x01garbage", "video")


def test_spark_stage_with_real_decoder(spark):
    media = synthetic_real_media_df(spark, n=16)
    feats = extract_features(media, decoder=decode_stdlib)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 16
    payloads = {r["media_id"]: (bytes(r["payload"]), r["kind"])
                for r in media.collect()}
    for mid, row in rows.items():
        payload, kind = payloads[mid]
        if kind == "video":  # the planted undecodable cycle
            assert row["ok"] is False
            # r5: undecodable -> NULL feature (not a zero vector), so a
            # forgotten ok-filter fails loudly downstream
            assert row["feature"] is None
        else:
            assert row["ok"] is True
            expected = decode_stdlib(payload, kind)
            got = [round(float(x), 6) for x in row["feature"]]
            assert got == pytest.approx(expected, abs=1e-4)


def test_corrupt_real_payloads_yield_ok_false(spark):
    """ADVICE r6 (high): parse errors from the real decoders (EOFError/
    ValueError/struct.error...) must degrade to feature=NULL, ok=False —
    not kill the task."""
    import numpy as np

    from information_extraction_t5_spark.operators.jpeg import (
        encode_baseline_jpeg,
    )
    from information_extraction_t5_spark.operators.multimodal import (
        decode_stdlib,
        extract_features,
    )

    img = (np.arange(16 * 16 * 3) % 255).reshape(16, 16, 3).astype(np.uint8)
    good = encode_baseline_jpeg(img)
    rows = [
        ("m1", "image/jpeg", bytearray(good[: len(good) // 2])),  # truncated
        ("m2", "video/mp4", bytearray(b"\x00\x00\x00\x01ftyp" + b"\x00" * 8)),
        ("m3", "image/png", bytearray(b"\x89PNG\r\n\x1a\n" + b"garbage")),
        ("m4", "image/jpeg", bytearray(good)),                     # control
    ]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, payload binary"
    )
    out = {r["media_id"]: r for r in
           extract_features(media, decoder=decode_stdlib).collect()}
    assert out["m4"]["ok"] and out["m4"]["feature"] is not None
    for mid in ("m1", "m2", "m3"):
        assert not out[mid]["ok"], mid
        assert out[mid]["feature"] is None, mid
