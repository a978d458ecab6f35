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


def test_undecodable_raises():
    with pytest.raises(NotImplementedError):
        decode_stdlib(b"\x89PNG\r\n\x1a\n....", "image")


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
