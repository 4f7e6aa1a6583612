"""Baseline JPEG codec — stdlib + numpy only (the container has no
PIL/libjpeg), so real ``.jpg`` corpus bytes decode end-to-end through
decode → filter → embed → ANN like the other raster formats.

Scope (ITU-T T.81 Huffman DCT modes — baseline sequential AND
progressive, together the formats ~all web JPEGs use):

- **decode**: SOF0/SOF1 (sequential) and SOF2 (progressive — spectral
  selection + successive approximation per T.81 G.1.2, r7), 8-bit,
  grayscale or 3-component YCbCr, any sampling factors (4:4:4 / 4:2:2 /
  4:2:0 tested), restart markers, 16-bit quant-table precision,
  multiple DQT/DHT segments, APPn/COM skipped. Arithmetic coding,
  12-bit, hierarchical, and lossless modes raise
  ``NotImplementedError`` — honestly unsupported, not faked.
- **encode**: fixture generator for tests and synthetic corpora —
  baseline (standard Annex K quantization + Huffman tables) or
  progressive (``progressive=True``: the canonical jpegtran scan script
  with per-scan OPTIMAL Huffman tables — Annex K tables lack the EOBn
  symbols progressive needs), grayscale or YCbCr with 4:4:4 or 4:2:0
  chroma subsampling, quality 1-100 via the IJG scaling curve. Both
  modes code the same quantized coefficients, so they must decode to
  IDENTICAL pixels — the differential the tests assert.

All tables (zigzag order, Annex K quantization matrices, the standard
DC/AC Huffman specifications) are from the public ITU-T T.81 spec.
Entropy decoding is per-bit Python — fine for the mapInPandas batch
sizes this feeds (thumbnails/tiles); a cluster deployment that needs
bulk JPEG throughput should swap in a codec library behind the same
``decode_jpeg`` signature.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[i] = raster index of the i-th coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K quantization tables (luminance, chrominance), raster order
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex K Huffman table specifications: (bits[1..16] counts, values)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II basis: forward F = C @ f @ C.T, inverse C.T @ F @ C
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = Annex K as-is, 1 worst, 100 lossless-ish."""
    q = min(100, max(1, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_tables(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the sequential decoder."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; RST markers are consumed by ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.bits = 0
        self.acc = 0

    def _fill(self) -> None:
        if self.pos + 1 >= len(self.d):
            # entropy data ran off the end of the buffer: corrupt input,
            # not an unsupported feature — keep the ValueError contract
            raise ValueError("truncated JPEG stream")
        b = self.d[self.pos]
        if b == 0xFF:
            nxt = self.d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker reached (EOI/RSTn handled by callers); per T.81 a
                # truncated final byte pads with 1-bits
                self.acc = (self.acc << 8) | 0xFF
                self.bits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.bits += 8

    def read_bit(self) -> int:
        if self.bits == 0:
            self._fill()
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.bits = 0
        self.acc = 0
        while (
            self.pos + 1 < len(self.d)
            and self.d[self.pos] == 0xFF
            and self.d[self.pos + 1] == 0xFF
        ):
            self.pos += 1  # fill bytes
        if self.pos + 1 >= len(self.d):
            raise ValueError("truncated JPEG stream (expected RST marker)")
        if self.d[self.pos] != 0xFF or not (0xD0 <= self.d[self.pos + 1] <= 0xD7):
            raise ValueError("expected RST marker in entropy stream")
        self.pos += 2

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def decode_jpeg(buf: bytes) -> tuple[int, int, str, np.ndarray]:
    """Decode baseline (SOF0/1) or progressive (SOF2) JPEG bytes →
    ``(width, height, mode, pixels)`` with mode 'L' (grayscale) or
    'RGB'. Progressive streams accumulate coefficients across their
    scans (spectral selection + successive approximation, T.81 G.1.2)
    and reconstruct at EOI. Raises NotImplementedError for
    arithmetic-coded/12-bit/hierarchical streams and ValueError for
    corrupt ones."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (h, w, components)
    restart_interval = 0
    progressive = False
    prog_ready = False  # at least one scan decoded
    while True:
        if pos + 1 >= len(buf):
            raise ValueError("truncated JPEG stream")
        if buf[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes (EXIF/camera writers pad) — skip them
        while pos + 1 < len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(buf):
            raise ValueError("truncated JPEG stream")
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            if progressive and prog_ready:
                h, w, comps = frame
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                for c in comps:
                    c["q"] = qts[c["tq"]]
                return _reconstruct(h, w, comps, hmax, vmax)
            raise ValueError("no scan data")
        if pos + 2 > len(buf):
            raise ValueError("truncated JPEG stream")
        (seglen,) = struct.unpack(">H", buf[pos : pos + 2])
        seg = buf[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec:
                    vals = np.frombuffer(seg, ">u2", count=64, offset=p)
                    p += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, count=64, offset=p)
                    p += 64
                qt = np.zeros(64)
                qt[ZIGZAG] = vals  # stored zigzag → raster
                qts[tid] = qt
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated DHT segment")
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _decode_tables(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            if len(seg) < 6:
                raise ValueError("truncated SOF segment")
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            if len(seg) < 6 + 3 * nc:
                raise ValueError("truncated SOF segment")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (h, w, comps)
            if progressive:
                _alloc_progressive(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) DCT "
                "JPEG is supported"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(seg) < 1 or len(seg) < 1 + 2 * seg[0] + 3:
                raise ValueError("truncated SOS segment")
            ns = seg[0]
            sel = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0xF)
            if progressive:
                ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
                pos = _decode_progressive_scan(
                    buf,
                    pos + seglen,
                    frame,
                    sel,
                    ss,
                    se,
                    a >> 4,
                    a & 0xF,
                    dc_tabs,
                    ac_tabs,
                    restart_interval,
                )
                prog_ready = True
                continue
            if ns < len(frame[2]):
                # a scan covering a subset of components means separate
                # per-component scans follow — refuse honestly instead of
                # KeyError-ing mid-decode
                raise NotImplementedError(
                    "multi-scan baseline JPEG (separate per-component "
                    "scans) not supported; only a single interleaved scan"
                )
            data_pos = pos + seglen
            return _decode_scan(
                buf, data_pos, frame, sel, qts, dc_tabs, ac_tabs, restart_interval
            )
        pos += seglen


def _read_block(r: "_BitReader", c: dict) -> np.ndarray:
    """Decode one 8×8 data unit (DC diff + AC runs) for component c,
    updating its DC predictor."""
    blk = np.zeros(64)
    s = r.read_huff(c["dc"])
    diff = _extend(r.read_bits(s), s) if s else 0
    c["pred"] += diff
    blk[0] = c["pred"]
    k = 1
    while k < 64:
        rs = r.read_huff(c["ac"])
        rr, ss = rs >> 4, rs & 0xF
        if ss == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("AC run past end of block")
        blk[ZIGZAG[k]] = _extend(r.read_bits(ss), ss)
        k += 1
    return blk


def _decode_scan(buf, pos, frame, sel, qts, dc_tabs, ac_tabs, restart_interval):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        td, ta = sel[c["id"]]
        c["dc"] = dc_tabs[td]
        c["ac"] = ac_tabs[ta]
        c["q"] = qts[c["tq"]]
        c["blocks_w"] = mcus_x * c["h"]
        c["blocks_h"] = mcus_y * c["v"]
        c["pred"] = 0

    r = _BitReader(bytes(buf), pos)
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — the
        # MCU is one data unit, traversed in raster order with
        # ceil(dim/8) geometry. (The interleaved path would wrongly tile
        # h×v-block MCUs when the lone component declares sampling
        # factors > 1, scrambling the image with no error.)
        c = comps[0]
        c["blocks_w"] = -(-w // 8)
        c["blocks_h"] = -(-h // 8)
        c["coef"] = np.zeros((c["blocks_h"] * c["blocks_w"], 64))
        c["h"] = c["v"] = 1
        hmax = vmax = 1  # upsample step becomes identity
        unit = 0
        for idx in range(c["blocks_h"] * c["blocks_w"]):
            if restart_interval and unit and unit % restart_interval == 0:
                r.restart()
                c["pred"] = 0
            unit += 1
            c["coef"][idx] = _read_block(r, c)
    else:
        for c in comps:
            c["coef"] = np.zeros((c["blocks_h"] * c["blocks_w"], 64))
        mcu_count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    r.restart()
                    for c in comps:
                        c["pred"] = 0
                mcu_count += 1
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            row = my * c["v"] + by
                            col = mx * c["h"] + bx
                            c["coef"][row * c["blocks_w"] + col] = _read_block(
                                r, c
                            )

    return _reconstruct(h, w, comps, hmax, vmax)


def _reconstruct(h, w, comps, hmax, vmax):
    """Dequantize + inverse DCT + upsample + color-convert the decoded
    coefficient planes (shared by the baseline single-scan path and the
    progressive at-EOI path). Coefficients are in RASTER index order
    within each 64-vector; the block grid is raster over
    (blocks_h, blocks_w)."""
    planes = []
    for c in comps:
        deq = (c["coef"].astype(np.float64) * c["q"][None, :]).reshape(-1, 8, 8)
        pix = np.einsum("kj,njl,lm->nkm", _C.T, deq, _C) + 128.0
        bh, bw = c["blocks_h"], c["blocks_w"]
        plane = (
            pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full MCU-grid resolution, then crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(comps) == 1:
        return w, h, "L", np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG not supported")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return w, h, "RGB", np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -- progressive decoding (T.81 G.1.2) --------------------------------------


def _alloc_progressive(frame) -> None:
    """Allocate each component's full-precision coefficient plane (int32,
    two's complement — successive-approximation refinement is bitwise)
    on the interleaved MCU grid, plus the non-interleaved block geometry
    AC scans traverse (ceil of the component's true sample dimensions,
    T.81 A.2.2 — a subset of the MCU grid's dummy-padded blocks)."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(comps) == 1:
        c = comps[0]
        # single-component frames are always non-interleaved: geometry
        # ignores the declared sampling factors (same rule as baseline)
        c["h"] = c["v"] = 1
        hmax = vmax = 1
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["blocks_w"] = mcus_x * c["h"]
        c["blocks_h"] = mcus_y * c["v"]
        # true (non-interleaved) dims: ceil(sample dim / 8)
        c["nbw"] = -(-(-(-w * c["h"] // hmax)) // 8)
        c["nbh"] = -(-(-(-h * c["v"] // vmax)) // 8)
        c["coef"] = np.zeros((c["blocks_h"] * c["blocks_w"], 64), dtype=np.int64)
        c["pred"] = 0


def _decode_progressive_scan(
    buf, pos, frame, sel, ss, se, ah, al, dc_tabs, ac_tabs, restart_interval
):
    """Entropy-decode one progressive scan into the components'
    coefficient planes; returns the buffer offset of the next marker.
    DC scans (ss == 0) may interleave several components; AC scans are
    always single-component and non-interleaved (T.81 B.2.3)."""
    h, w, comps = frame
    r = _BitReader(bytes(buf), pos)
    scan = [c for c in comps if c["id"] in sel]
    if len(scan) != len(sel):
        raise ValueError("scan names a component absent from the frame")
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        for c in scan:
            if ah == 0:
                c["dc"] = dc_tabs[sel[c["id"]][0]]
            c["pred"] = 0
        if len(scan) > 1:
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            unit = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and unit and unit % restart_interval == 0:
                        r.restart()
                        for c in scan:
                            c["pred"] = 0
                    unit += 1
                    for c in scan:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                row = my * c["v"] + by
                                col = mx * c["h"] + bx
                                _dc_unit(
                                    r, c, c["coef"][row * c["blocks_w"] + col], ah, al
                                )
        else:
            c = scan[0]
            unit = 0
            for row in range(c["nbh"]):
                for col in range(c["nbw"]):
                    if restart_interval and unit and unit % restart_interval == 0:
                        r.restart()
                        c["pred"] = 0
                    unit += 1
                    _dc_unit(r, c, c["coef"][row * c["blocks_w"] + col], ah, al)
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scans are never interleaved")
        c = scan[0]
        actab = ac_tabs[sel[c["id"]][1]]
        state = {"eobrun": 0}
        unit = 0
        for row in range(c["nbh"]):
            for col in range(c["nbw"]):
                if restart_interval and unit and unit % restart_interval == 0:
                    r.restart()
                    state["eobrun"] = 0
                unit += 1
                blk = c["coef"][row * c["blocks_w"] + col]
                if ah == 0:
                    _ac_first(r, blk, actab, ss, se, al, state)
                else:
                    _ac_refine(r, blk, actab, ss, se, al, state)
    # the entropy segment ends at the next non-RST, non-stuffing marker
    p = r.pos
    while p + 1 < len(buf) and not (
        buf[p] == 0xFF and buf[p + 1] != 0x00 and not (0xD0 <= buf[p + 1] <= 0xD7)
    ):
        p += 1
    if p + 1 >= len(buf):
        raise ValueError("truncated JPEG stream (no marker after scan)")
    return p


def _dc_unit(r: "_BitReader", c: dict, blk, ah: int, al: int) -> None:
    """One DC data unit: first pass (ah=0) decodes the diff at point
    transform al (value << al); refinement appends bit al to the
    two's-complement value (T.81 G.1.2.1)."""
    if ah == 0:
        s = r.read_huff(c["dc"])
        diff = _extend(r.read_bits(s), s) if s else 0
        c["pred"] += diff
        blk[0] = c["pred"] << al
    elif r.read_bit():
        blk[0] |= 1 << al

def _ac_first(r: "_BitReader", blk, actab, ss, se, al, state) -> None:
    """First pass over an AC spectral band: baseline run/size coding plus
    EOBn codes spanning 2^n..2^(n+1)-1 all-zero band remainders across
    consecutive blocks (T.81 G.1.2.2)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = r.read_huff(actab)
        rr, s = rs >> 4, rs & 0xF
        if s == 0:
            if rr != 15:
                state["eobrun"] = (1 << rr) - 1
                if rr:
                    state["eobrun"] += r.read_bits(rr)
                return
            k += 16  # ZRL
            continue
        k += rr
        if k > se:
            raise ValueError("AC run past spectral band")
        blk[int(ZIGZAG[k])] = _extend(r.read_bits(s), s) << al
        k += 1


def _ac_refine(r: "_BitReader", blk, actab, ss, se, al, state) -> None:
    """Successive-approximation refinement of an AC band (T.81 G.1.2.3):
    every nonzero-history coefficient passed gets one correction bit;
    run lengths count only zero-history positions; EOBn covers the
    remainder of this block (still emitting correction bits) plus whole
    following blocks."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = r.read_huff(actab)
            rr, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if rr != 15:
                    state["eobrun"] = 1 << rr
                    if rr:
                        state["eobrun"] += r.read_bits(rr)
                    break
                # rr == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("AC refinement magnitude must be 1")
                val = p1 if r.read_bit() else m1
            while k <= se:
                z = int(ZIGZAG[k])
                if blk[z] != 0:
                    if r.read_bit() and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] > 0 else m1
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val != 0:
                if k > se:
                    raise ValueError("newly-nonzero coefficient past band")
                blk[int(ZIGZAG[k])] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = int(ZIGZAG[k])
            if blk[z] != 0 and r.read_bit() and (blk[z] & p1) == 0:
                blk[z] += p1 if blk[z] > 0 else m1
            k += 1
        state["eobrun"] -= 1


# -- encoder (fixture generator) -------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.bits += 1
            if self.bits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.bits = 0

    def flush(self) -> None:
        if self.bits:
            self.write((1 << (8 - self.bits)) - 1, 8 - self.bits)  # pad with 1s

    def restart(self, i: int) -> None:
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (i % 8)])


def _encode_block(bw, blk, qt, dc_codes, ac_codes, pred):
    q = np.round((_C @ (blk - 128.0) @ _C.T) / qt.reshape(8, 8)).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    s = int(diff).bit_length() if diff else 0
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
                break
            run += 1
            if run == 16:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run = 0
            continue
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    return int(zz[0])


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode a (h, w) gray or (h, w, 3) RGB uint8 array as baseline JPEG
    with the standard Annex K tables. ``subsample=True`` uses 4:2:0
    chroma (box-mean downsample); default 4:4:4. ``restart_interval=N``
    emits a DRI segment and an RSTn marker every N MCUs (baseline only).
    ``progressive=True`` writes an SOF2 stream with the canonical
    jpegtran scan script (DC first at Al=1 → AC bands 1-5/6-63 at Al=2 →
    AC refine to Al=1 → DC refine → AC refine to Al=0) and per-scan
    OPTIMAL Huffman tables (progressive EOBn symbols don't exist in the
    Annex K tables, so optimized tables are mandatory, as in libjpeg).
    Both modes encode the same quantized coefficients, so they decode to
    identical pixels — the differential the tests assert."""
    px = np.asarray(pixels, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)

    if gray:
        planes = [px]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even, 2x2 box mean
            ph, pw = (h + 1) & ~1, (w + 1) & ~1
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for (sh, sv), pl in zip(samp, planes):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        padded.append(
            np.pad(pl, ((0, th - pl.shape[0]), (0, tw - pl.shape[1])), mode="edge")
        )

    if progressive:
        return _encode_progressive(
            gray, h, w, samp, qsel, padded, qt_l, qt_c, mcus_x, mcus_y
        )

    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*HUFF_AC_CHROMA)

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.restart(rst_idx)
                rst_idx += 1
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, ((sh, sv), pl) in enumerate(zip(samp, padded)):
                qt = qt_l if qsel[ci] == 0 else qt_c
                dcod = dc_l if ci == 0 or gray else dc_c
                acod = ac_l if ci == 0 or gray else ac_c
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = pl[y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(bw, blk, qt, dcod, acod, preds[ci])
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tid: int, qt: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(qt.reshape(-1)[ZIGZAG].astype(np.uint8)))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], qsel[i]])
    sos = bytes([nc])
    for i in range(nc):
        td_ta = 0x00 if (i == 0 or gray) else 0x11
        sos += bytes([i + 1, td_ta])
    sos += bytes([0, 63, 0])

    out = b"\xff\xd8" + dqt(0, qt_l)
    if not gray:
        out += dqt(1, qt_c)
    out += seg(0xC0, sof)
    out += dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, sos) + bytes(bw.out) + b"\xff\xd9"
    return out


# -- progressive encoding (T.81 G.1; scan script per jpegtran's default) ----


def _quantized_blocks(pl: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Forward DCT + quantization of one padded plane; returns
    (blocks_h, blocks_w, 64) int64 in ZIGZAG order. Per-block matmul in
    EXACTLY _encode_block's expression order — a vectorized einsum sums
    in a different float order and can round a knife-edge coefficient
    the other way, breaking the progressive ≡ baseline pixel identity
    the tests assert."""
    bh, bw = pl.shape[0] // 8, pl.shape[1] // 8
    qt8 = qt.reshape(8, 8)
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            blk = pl[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            q = np.round((_C @ (blk - 128.0) @ _C.T) / qt8).astype(np.int64)
            out[by, bx] = q.reshape(-1)[ZIGZAG]
    return out


def _gen_optimal_table(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """Optimal Huffman table from symbol frequencies — the T.81 Annex K.2
    flowchart (pairing least-frequent, then the 16-bit length
    adjustment), same procedure libjpeg's jpeg_gen_optimal_table uses.
    Symbol 256 is the reserved never-emitted code that guarantees no
    real symbol gets the all-ones code."""
    f = [0] * 257
    for sym, n in freq.items():
        f[sym] = n
    f[256] = 1
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1, v = -1, None
        for i in range(257):
            if f[i] and (v is None or f[i] <= v):
                v, c1 = f[i], i
        c2, v = -1, None
        for i in range(257):
            if f[i] and i != c1 and (v is None or f[i] <= v):
                v, c2 = f[i], i
        if c2 < 0:
            break
        f[c1] += f[c2]
        f[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32
    while i > 16:  # JPEG caps code lengths at 16 bits
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved symbol's slot (longest code)
    vals = [s for s in sorted(range(256), key=lambda s: (codesize[s], s)) if codesize[s]]
    return bits[1:17], vals


def _mag_bits(v: int, s: int) -> int:
    return v if v > 0 else v + (1 << s) - 1


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift, truncation toward zero
    (T.81 G.1.2.2 — DC uses an arithmetic shift instead)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _ev_dc_first(coefs, cis, samp, mcus_x, mcus_y, al, tid_of, events) -> None:
    preds = {ci: 0 for ci in cis}
    order = []
    if len(cis) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in cis:
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            order.append((ci, my * sv + by, mx * sh + bx))
    else:
        ci = cis[0]
        bh, bw = coefs[ci].shape[:2]
        order = [(ci, r_, c_) for r_ in range(bh) for c_ in range(bw)]
    for ci, row, col in order:
        v = int(coefs[ci][row, col, 0]) >> al
        diff = v - preds[ci]
        preds[ci] = v
        s = abs(diff).bit_length()
        events.append(("h", tid_of[ci], s))
        if s:
            events.append(("b", _mag_bits(diff, s), s))


def _ev_dc_refine(coefs, cis, samp, mcus_x, mcus_y, al, events) -> None:
    if len(cis) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in cis:
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(coefs[ci][my * sv + by, mx * sh + bx, 0])
                            events.append(("b", (v >> al) & 1, 1))
    else:
        ci = cis[0]
        for row in coefs[ci].reshape(-1, 64):
            events.append(("b", (int(row[0]) >> al) & 1, 1))


def _ev_ac_first(coef, nbh, nbw, bw_stride, ss, se, al, events) -> None:
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            rb = eobrun.bit_length() - 1
            events.append(("h", 0, rb << 4))
            if rb:
                events.append(("b", eobrun & ((1 << rb) - 1), rb))
            eobrun = 0

    flat = coef.reshape(-1, 64)
    for row in range(nbh):
        for col in range(nbw):
            zz = flat[row * bw_stride + col]
            run = 0
            for k in range(ss, se + 1):
                t = _pt_ac(int(zz[k]), al)
                if t == 0:
                    run += 1
                    continue
                flush_eob()
                while run > 15:
                    events.append(("h", 0, 0xF0))
                    run -= 16
                s = abs(t).bit_length()
                events.append(("h", 0, (run << 4) | s))
                events.append(("b", _mag_bits(t, s), s))
                run = 0
            if run > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()


def _ev_ac_refine(coef, nbh, nbw, bw_stride, ss, se, al, events) -> None:
    """Refinement-scan encoder (T.81 G.1.2.3, the jcphuff structure):
    newly-nonzero coefficients emit (run,1)+sign; already-nonzero ones
    emit buffered correction bits; band tails fold into EOBn runs whose
    buffered bits ride just after the EOBn symbol."""
    eobrun = 0
    bebits: list[int] = []

    def flush_eob():
        nonlocal eobrun, bebits
        if eobrun:
            rb = eobrun.bit_length() - 1
            events.append(("h", 0, rb << 4))
            if rb:
                events.append(("b", eobrun & ((1 << rb) - 1), rb))
            eobrun = 0
        for b in bebits:
            events.append(("b", b, 1))
        bebits = []

    flat = coef.reshape(-1, 64)
    for row in range(nbh):
        for col in range(nbw):
            zz = flat[row * bw_stride + col]
            absv = [0] * (se + 1)
            eobpos = ss - 1
            for k in range(ss, se + 1):
                m = int(zz[k])
                m = m if m >= 0 else -m
                absv[k] = m >> al
                if absv[k] == 1:
                    eobpos = k
            run = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eobpos:
                    flush_eob()
                    events.append(("h", 0, 0xF0))
                    run -= 16
                    for b in br:
                        events.append(("b", b, 1))
                    br = []
                if t > 1:
                    br.append(t & 1)  # correction bit for a history coef
                    continue
                flush_eob()
                events.append(("h", 0, (run << 4) | 1))
                events.append(("b", 1 if int(zz[k]) > 0 else 0, 1))
                for b in br:
                    events.append(("b", b, 1))
                br = []
                run = 0
            if run > 0 or br:
                eobrun += 1
                bebits.extend(br)
                if eobrun == 0x7FFF or len(bebits) > 900:
                    flush_eob()
    flush_eob()


def _encode_progressive(
    gray, h, w, samp, qsel, padded, qt_l, qt_c, mcus_x, mcus_y
) -> bytes:
    ncomp = len(padded)
    coefs = [
        _quantized_blocks(pl, qt_l if qsel[ci] == 0 else qt_c)
        for ci, pl in enumerate(padded)
    ]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    nbw = [-(-(-(-w * samp[ci][0] // hmax)) // 8) for ci in range(ncomp)]
    nbh = [-(-(-(-h * samp[ci][1] // vmax)) // 8) for ci in range(ncomp)]
    tid_of = {ci: (0 if ci == 0 else 1) for ci in range(ncomp)}

    cis = list(range(ncomp))
    script: list[tuple] = [("dc0", cis, 0, 0, 0, 1)]
    for ci in cis:
        script += [("ac0", [ci], 1, 5, 0, 2), ("ac0", [ci], 6, 63, 0, 2)]
    for ci in cis:
        script.append(("acr", [ci], 1, 63, 2, 1))
    script.append(("dcr", cis, 0, 0, 1, 0))
    for ci in cis:
        script.append(("acr", [ci], 1, 63, 1, 0))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tid: int, qt: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(qt.reshape(-1)[ZIGZAG].astype(np.uint8)))

    out = b"\xff\xd8" + dqt(0, qt_l)
    if not gray:
        out += dqt(1, qt_c)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], qsel[i]])
    out += seg(0xC2, sof)

    for kind, scan_cis, ss, se, ah, al in script:
        events: list[tuple] = []
        if kind == "dc0":
            _ev_dc_first(coefs, scan_cis, samp, mcus_x, mcus_y, al, tid_of, events)
        elif kind == "dcr":
            _ev_dc_refine(coefs, scan_cis, samp, mcus_x, mcus_y, al, events)
        else:
            ci = scan_cis[0]
            stride = coefs[ci].shape[1]
            if kind == "ac0":
                _ev_ac_first(coefs[ci], nbh[ci], nbw[ci], stride, ss, se, al, events)
            else:
                _ev_ac_refine(coefs[ci], nbh[ci], nbw[ci], stride, ss, se, al, events)
        # per-scan optimal Huffman tables (EOBn symbols are absent from
        # the Annex K tables, so this is mandatory, not an optimization)
        freqs: dict[int, dict[int, int]] = {}
        for ev in events:
            if ev[0] == "h":
                freqs.setdefault(ev[1], {}).setdefault(ev[2], 0)
                freqs[ev[1]][ev[2]] += 1
        codes = {}
        for tid, f in sorted(freqs.items()):
            spec = _gen_optimal_table(f)
            cls = 0 if kind == "dc0" else 1
            out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(spec[0]) + bytes(spec[1]))
            codes[tid] = _canonical_codes(*spec)
        sos = bytes([len(scan_cis)])
        for ci in scan_cis:
            td = tid_of[ci] if kind == "dc0" else 0
            ta = 0 if kind in ("dc0", "dcr") else tid_of[ci] * 0  # AC tables use id 0
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        bw_ = _BitWriter()
        for ev in events:
            if ev[0] == "h":
                code, ln = codes[ev[1]][ev[2]]
                bw_.write(code, ln)
            else:
                bw_.write(ev[1], ev[2])
        bw_.flush()
        out += seg(0xDA, sos) + bytes(bw_.out)
    return out + b"\xff\xd9"
