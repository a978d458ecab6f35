"""Baseline JPEG codec in pure Python + numpy (stdlib decode tier).

Decoder: baseline sequential DCT JPEG (SOI/DQT/SOF0/DHT/SOS/DRI/EOI),
arbitrary sampling factors (4:4:4, 4:2:0, 4:2:2 via box upsampling),
byte-stuffing and restart markers, Huffman tables read from the stream,
dequant + IDCT + YCbCr->RGB.  Enough to feature-probe real camera/web
baseline JPEGs; progressive (SOF2) and arithmetic coding stay on the
codec injection point (multimodal.decode_real).

Encoder: minimal valid baseline writer used by tests and synthetic
corpora — 4:4:4, one quant scale, simple canonical Huffman tables
emitted in DHT (the decoder reads whatever DHT carries, so the encoder
never needs the Annex-K defaults).  Compression ratio is irrelevant;
validity + round-trip accuracy is the contract.

Everything is O(pixels) driver/executor-local work behind the Arrow
batch boundary (multimodal.extract_features) — the Spark plumbing treats
payloads as opaque binary; this module only turns bytes into small
feature vectors.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

def zigzag_order() -> List[Tuple[int, int]]:
    """The standard JPEG zigzag scan, generated (not hardcoded): walk
    anti-diagonals, odd sums go down-left (row ascending), even sums go
    up-right."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(7, s) + 1)
        idx = rng if s % 2 == 1 else reversed(rng)
        out.extend((i, s - i) for i in idx)
    return out


_ZZ = zigzag_order()
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZZ])

# orthonormal 8x8 DCT-II matrix
_DCT_M = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_M[_k, _n] = np.cos(np.pi * (_n + 0.5) * _k / 8.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

# standard luminance/chrominance quant tables (JPEG Annex K) at scale 1,
# then scaled mildly (quality ~88) so round-trips stay tight
_QL_BASE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
])
_QC_BASE = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
])


def _scaled_q(base: np.ndarray, quality: int = 88) -> np.ndarray:
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc, self.nbits = 0, 0

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec

    def emit_marker(self, marker: int) -> None:
        """Byte-align and write a raw marker (RSTn) into the stream."""
        self.pad_to_byte()
        self.buf.append(0xFF)
        self.buf.append(marker)

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at markers (0xFF != 0x00 next) and exposes them."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise EOFError("jpeg entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                raise EOFError(f"marker 0x{nxt:02x} in entropy stream")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume a restart marker (byte-aligned) and reset bit state."""
        self.acc, self.nbits = 0, 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and \
                    0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise EOFError("restart marker not found")


# ---------------------------------------------------------------------------
# huffman
# ---------------------------------------------------------------------------

def _canonical_codes(bits: List[int], values: List[int]) -> Dict[int, Tuple[int, int]]:
    """DHT (BITS, HUFFVAL) -> {symbol: (code, length)}."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    def __init__(self, bits: List[int], values: List[int]):
        # (length, code) -> symbol
        self.lut: Dict[Tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in jpeg stream")


def _extend(v: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _category(v: int) -> int:
    m, c = abs(v), 0
    while m:
        m >>= 1
        c += 1
    return c


# ---------------------------------------------------------------------------
# encoder (minimal valid baseline, 4:4:4)
# ---------------------------------------------------------------------------

# simplest valid canonical tables: DC symbols 0..11 all 4 bits; AC all
# 256 symbols split 128@len8 + 128@len9 (DHT's per-length count is a
# single byte, so one length can't hold all 256; canonical codes:
# len8 = 0..127, len9 starts at 256 — both well inside their ranges)
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = list(range(256))


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _pad_edge(arr: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    h, w = arr.shape
    out = np.empty((target_h, target_w))
    out[:h, :w] = arr
    out[h:, :w] = arr[h - 1:h, :]
    out[:, w:] = out[:, w - 1:w]
    return out


def encode_baseline_jpeg(rgb: np.ndarray, quality: int = 88,
                         subsample: bool = False,
                         restart_interval: int = 0) -> bytes:
    """RGB uint8 (H, W, 3) -> baseline JFIF bytes.

    ``subsample=True`` writes 4:2:0 (2x2 box-averaged chroma, the camera
    default); ``restart_interval`` emits DRI + RSTn markers every N MCUs.
    Both exist so the decoder's real-world paths are testable without
    external JPEG fixtures."""
    h, w = rgb.shape[:2]
    ycc = _rgb_to_ycbcr(rgb.astype(np.float64))
    qs = [_scaled_q(_QL_BASE, quality), _scaled_q(_QC_BASE, quality)]
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    planes = []
    for c, (ch, cv) in enumerate(samp):
        src = ycc[..., c]
        fy, fx = vmax // cv, hmax // ch
        if fy > 1 or fx > 1:
            sh, sw = -(-h // fy) * fy, -(-w // fx) * fx
            tmp = _pad_edge(src, sh, sw)
            src = tmp.reshape(sh // fy, fy, sw // fx, fx).mean(axis=(1, 3))
        planes.append(
            _pad_edge(src, mcus_y * cv * 8, mcus_x * ch * 8) - 128.0
        )

    bw = _BitWriter()
    dc_pred = [0, 0, 0]

    def encode_block(blk: np.ndarray, q: np.ndarray, c: int) -> None:
        coef = _DCT_M @ blk @ _DCT_M.T
        qc = np.round(coef / q).astype(np.int64)
        zz = qc.flatten()[_ZZ_FLAT]
        diff = int(zz[0]) - dc_pred[c]
        dc_pred[c] = int(zz[0])
        ssss = _category(diff)
        code, ln = dc_codes[ssss]
        bw.write(code, ln)
        if ssss:
            bw.write(diff if diff >= 0 else diff + (1 << ssss) - 1, ssss)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else 0
        for i in range(1, 64):
            v = int(zz[i])
            if i > last_nz:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
                break
            if v == 0:
                run += 1
                if run == 16:
                    code, ln = ac_codes[0xF0]  # ZRL
                    bw.write(code, ln)
                    run = 0
                continue
            ssss = _category(v)
            code, ln = ac_codes[(run << 4) | ssss]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << ssss) - 1, ssss)
            run = 0

    mcu_count, rst = 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.emit_marker(0xD0 + rst % 8)
                rst += 1
                dc_pred = [0, 0, 0]
            mcu_count += 1
            for c, (ch, cv) in enumerate(samp):
                q = qs[0 if c == 0 else 1]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        encode_block(
                            planes[c][y0:y0 + 8, x0:x0 + 8], q, c
                        )

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        zz = q.flatten()[_ZZ_FLAT]
        return seg(0xDB, bytes([tid]) + bytes(int(x) for x in zz))

    def dht(cls: int, tid: int, bits: List[int], vals: List[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))

    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + bytes([
        1, (samp[0][0] << 4) | samp[0][1], 0,
        2, (samp[1][0] << 4) | samp[1][1], 1,
        3, (samp[2][0] << 4) | samp[2][1], 1,
    ]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dri = seg(0xDD, struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    return (b"\xff\xd8"
            + dqt(0, qs[0]) + dqt(1, qs[1])
            + dht(0, 0, _ENC_DC_BITS, _ENC_DC_VALS)
            + dht(1, 0, _ENC_AC_BITS, _ENC_AC_VALS)
            + dht(0, 1, _ENC_DC_BITS, _ENC_DC_VALS)
            + dht(1, 1, _ENC_AC_BITS, _ENC_AC_VALS)
            + dri + sof + sos + bw.flush() + b"\xff\xd9")


# ---------------------------------------------------------------------------
# decoder (general baseline)
# ---------------------------------------------------------------------------

def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> RGB uint8 (H, W, 3) (grayscale replicated).

    Raises NotImplementedError for progressive/arithmetic/12-bit streams
    (they stay on the injection point) and ValueError for corrupt data."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (no SOI)")
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, _HuffDecoder] = {}
    huff_ac: Dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        # runs of 0xFF are legal fill before a marker (spec B.1.1.2,
        # common in camera files) — skip them instead of reading a bogus
        # segment length; a header truncated mid-marker is corrupt
        # (ADVICE r6)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG header")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (length,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2: pos + length]
        pos += length
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZZ_FLAT] = np.frombuffer(body[i:i + 64], np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                i += 64
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x}) — "
                "progressive/lossless streams need an injected codec"
            )
        elif marker == 0xC0:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("12-bit baseline")
            comps = []
            for c in range(nc):  # header is P(1)+Y(2)+X(2)+Nf(1) = 6 bytes
                cid, samp, tq = body[6 + 3 * c: 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
            frame = {"w": fw, "h": fh, "comps": comps}
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1: i + 17])
                n = sum(bits)
                vals = list(body[i + 17: i + 17 + n])
                dec = _HuffDecoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                i += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_map = {}
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan_map[cid] = (tt >> 4, tt & 0x0F)
            return _decode_scan(payload, pos, frame, scan_map, qtables,
                                huff_dc, huff_ac, restart_interval)
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan_map, qtables, huff_dc, huff_ac,
                 restart_interval):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-frame["w"] // mcu_w)
    mcus_y = -(-frame["h"] // mcu_h)

    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        for c in comps
    ]
    br = _BitReader(data, pos)
    dc_pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_restart()
                dc_pred = [0] * len(comps)
            mcu_count += 1
            for ci, comp in enumerate(comps):
                dct_t, act_t = scan_map[comp["id"]]
                dq = qtables[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        ssss = huff_dc[dct_t].decode(br)
                        diff = _extend(br.bits(ssss), ssss)
                        dc_pred[ci] += diff
                        zz[0] = dc_pred[ci]
                        k = 1
                        while k < 64:
                            rs = huff_ac[act_t].decode(br)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC run overflow")
                            s = rs & 0x0F
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZZ_FLAT] = zz
                        blk = blk.reshape(8, 8) * dq
                        pix = _DCT_M.T @ blk @ _DCT_M
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix

    h, w = frame["h"], frame["w"]
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci] + 128.0
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255)
        return np.stack([g, g, g], axis=-1).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
