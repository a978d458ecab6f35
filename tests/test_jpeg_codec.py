"""Baseline JPEG codec (operators/jpeg.py): encoder->decoder round trips
with analytically checkable images, subsampling/restart handling, and the
multimodal feature hookup.

The encoder exists FOR these tests (and synthetic corpora): it emits its
own Huffman tables in DHT, so the decoder is exercised on the same
generic table-loading path a camera JPEG would use.
"""
import numpy as np
import pytest

from information_extraction_t5_spark.operators.jpeg import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
    zigzag_order,
)


def test_zigzag_is_the_standard_order():
    zz = zigzag_order()
    assert len(zz) == 64 and len(set(zz)) == 64
    assert zz[:10] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
                       (0, 2), (0, 3), (1, 2), (2, 1), (3, 0)]
    assert zz[-3:] == [(6, 7), (7, 6), (7, 7)]


def test_round_trip_uniform_color():
    # uniform blocks survive quantization almost exactly
    rgb = np.zeros((16, 24, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 80, 40
    out = decode_baseline_jpeg(encode_baseline_jpeg(rgb))
    assert out.shape == (16, 24, 3)
    err = np.abs(out.astype(int) - rgb.astype(int)).max()
    assert err <= 6, f"uniform color off by {err}"


def test_round_trip_gradient_means():
    h, w = 40, 56  # non-multiple of 8 exercises edge padding + crop
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    rgb = np.stack(
        [np.tile(x, (h, 1)), np.tile(y[:, None], (1, w)),
         np.full((h, w), 127.0)], axis=-1
    ).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(rgb))
    assert out.shape == (h, w, 3)
    for c in range(3):
        got = out[..., c].mean()
        want = rgb[..., c].mean()
        assert abs(got - want) < 3.0, f"channel {c}: {got} vs {want}"
    # per-pixel error bounded by quantization, not structural bugs
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 6.0


def test_blocky_image_per_pixel():
    # one flat color per 8x8 block: DCT is a pure DC problem
    rng = np.random.RandomState(3)
    blocks = rng.randint(30, 225, size=(4, 5, 3))
    rgb = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype(
        np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(rgb))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 8


def test_non_baseline_markers_raise():
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(b"not a jpeg")
    # progressive SOF2: decoder must refuse, not garble
    prog = (b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11"
            b"\x00\xff\xd9")
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(prog)


def test_multimodal_feature_hookup():
    from information_extraction_t5_spark.operators.multimodal import (
        decode_stdlib,
    )

    rgb = np.zeros((8, 16, 3), dtype=np.uint8)
    rgb[..., 0] = 250
    f = decode_stdlib(bytes(encode_baseline_jpeg(rgb)), "image")
    assert f[:3] == [16.0, 8.0, 2.0]
    assert abs(f[3] - 250 / 255) < 0.04   # mean_r
    assert f[4] < 0.04 and f[5] < 0.04    # g, b near zero


def test_round_trip_420_subsampled():
    """4:2:0 (the camera default) exercises the decoder's multi-block MCU
    loop and chroma upsampling."""
    h, w = 24, 40
    x = np.linspace(0, 255, w)
    rgb = np.stack(
        [np.tile(x, (h, 1)), np.full((h, w), 90.0),
         np.tile(x[::-1], (h, 1))], axis=-1
    ).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(rgb, subsample=True))
    assert out.shape == (h, w, 3)
    for c in range(3):
        assert abs(out[..., c].mean() - rgb[..., c].mean()) < 4.0
    # the horizontal gradient structure must survive 2x chroma smoothing:
    # R ascends, B descends (NOT their mean — that is flat by design)
    r = out[..., 0].astype(float)
    b = out[..., 2].astype(float)
    assert r[:, : w // 3].mean() + 60 < r[:, -w // 3:].mean()
    assert b[:, : w // 3].mean() > b[:, -w // 3:].mean() + 60


def test_round_trip_with_restart_markers():
    rng = np.random.RandomState(9)
    blocks = rng.randint(40, 215, size=(3, 6, 3))
    rgb = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype(
        np.uint8)
    payload = encode_baseline_jpeg(rgb, restart_interval=2)
    assert b"\xff\xdd" in payload          # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))
    out = decode_baseline_jpeg(payload)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 8


def test_round_trip_420_with_restarts_combined():
    rng = np.random.RandomState(21)
    blocks = rng.randint(60, 200, size=(2, 3, 3))
    rgb = np.repeat(np.repeat(blocks, 16, axis=0), 16, axis=1).astype(
        np.uint8)  # 32x48, 16px cells align with 4:2:0 MCUs
    payload = encode_baseline_jpeg(rgb, subsample=True,
                                   restart_interval=3)
    out = decode_baseline_jpeg(payload)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 10
