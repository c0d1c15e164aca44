"""Baseline JPEG codec (ITU-T T.81 / ISO 10918-1), stdlib + numpy only.

Shrinks the injected-codec seam of ``operators/multimodal.py`` (which
already decodes PPM/WAV/PNG with the stdlib) by one more real web
format: **baseline sequential Huffman JPEG** — marker parse, DQT/DHT
table decode, interleaved and single-component scans, restart markers,
dequantization, 2-D IDCT, chroma upsampling, and YCbCr→RGB. After
this, only genuinely-non-stdlib containers (MP4/H.264) remain behind
``require_real_decoder()``.

The encoder exists to PLANT fixtures: it emits spec-correct baseline
JPEG (grayscale, 4:4:4, and 4:2:0; per-image optimal Huffman tables
with the libjpeg-style reserved all-ones codepoint; optional restart
markers) so the decoder is exercised end-to-end on genuine
entropy-coded bytes. JPEG is lossy, so round-trip tests bound pixel
error — EXCEPT for flat-color images, where the whole pipeline is
arithmetically exact by construction:

- FDCT coefficients are snapped to integers when within 1e-6 (a flat
  block's true spectrum is integral: DC = 8·(v−128), AC = 0);
- quantization is ``sign·⌊(2|c|+q)/(2q)⌋`` — for integral ``c`` this
  is an exact integer computation in float64;
- IDCT outputs are snapped to the nearest 1/8 (a DC-only block's true
  samples are ``Q·q/8``), then rounded via ``⌊x+0.5⌋``.

That determinism is what lets ``jpeg_decode_stats`` (queries/
documents.py) certify this decoder against a pure-SQL DuckDB oracle:
at quality 50 the luma DC quant step is exactly 16, so every output
sample of a planted flat-``v`` image equals
``min(255, 128 + 2·sign(s)·⌊(|s|+1)/2⌋)`` with ``s = v−128`` — a
closed form both engines compute independently.

Reference parity note: the reference ETL (418-line pandas job,
SURVEY.md header) has no media handling at all; this module serves the
multimodal training-data surface (north-star requirement).
"""

from __future__ import annotations

import heapq
import math
import struct
from typing import Any

import numpy as np

# Annex K.1 base quantization tables (public spec constants), row-major.
_QT_LUMA = np.array(
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
    dtype=np.int64,
).reshape(8, 8)

_QT_CHROMA = np.array(
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
    dtype=np.int64,
).reshape(8, 8)


def quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled table clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError(f"jpeg quality {quality} out of range 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _zigzag() -> list[tuple[int, int]]:
    """The spec zigzag scan order as (row, col) pairs, generated from
    the diagonal walk rather than hand-typed (no transcription risk)."""
    order: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        order.extend(diag[::-1] if s % 2 == 0 else diag)
    return order


ZIGZAG = _zigzag()
_ZZ_ROWS = np.array([r for r, _ in ZIGZAG])
_ZZ_COLS = np.array([c for _, c in ZIGZAG])

# Orthonormal 8-point DCT-II matrix: fdct(b) = M b Mᵀ, idct(F) = Mᵀ F M.
_DCT_M = np.array(
    [
        [
            math.sqrt((1 if u == 0 else 2) / 8)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Forward DCT over an (n, 8, 8) stack, with integral coefficients
    snapped exactly (see module docstring)."""
    out = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
    snapped = np.rint(out)
    return np.where(np.abs(out - snapped) < 1e-6, snapped, out)


def idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Inverse DCT over an (n, 8, 8) stack, snapped to the nearest 1/8
    (DC-only blocks reconstruct to exact multiples of 1/8)."""
    # _DCT_M is indexed [u][x] (frequency, sample): the inverse is
    # Mᵀ F M, i.e. contract the FREQUENCY axis of M with F on both
    # sides — "ux,nuv,vy". ("xu,...,yv" would re-apply the forward
    # transform: a DC-only block would decode to a cosine dome, not a
    # flat field.)
    out = np.einsum("ux,nuv,vy->nxy", _DCT_M, blocks, _DCT_M)
    snapped = np.rint(out * 8) / 8
    return np.where(np.abs(out - snapped) < 1e-6, snapped, out)


def quantize(coeffs: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """``sign(c)·⌊(2|c|+q)/(2q)⌋`` — the usual round-half-away
    magnitude quantizer, written so integral coefficients divide
    exactly in float64 (exact-integer numerator/denominator; IEEE
    division of exact integers only lands ON an integer when it truly
    divides)."""
    mag = np.floor((2 * np.abs(coeffs) + qtable) / (2 * qtable))
    return (np.sign(coeffs) * mag).astype(np.int64)


# --------------------------------------------------------------- Huffman


def canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C code assignment: symbol → (length, code)."""
    if len(bits) != 16:
        raise ValueError("huffman BITS list must have 16 entries")
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(values):
                raise ValueError("huffman BITS/HUFFVAL mismatch")
            out[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    if k != len(values):
        raise ValueError("huffman BITS/HUFFVAL mismatch")
    return out


_PHANTOM = -1  # reserved codepoint so the all-1s code stays unused


def build_huffman(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Per-image optimal Huffman table → (BITS[16], HUFFVAL) for DHT.

    A phantom zero-use symbol is included (libjpeg's trick) so the
    all-ones code of the maximum length is never assigned to a real
    symbol. Falls back to fixed-length codes in the (tiny-alphabet,
    pathological-skew) case where tree depth would exceed 16.
    """
    syms = sorted(freqs)
    if not syms:
        raise ValueError("cannot build a huffman table with no symbols")
    # (count, tiebreak, symbols): phantom gets the largest tiebreak so
    # ties push it deepest; merged nodes keep the smallest tiebreak.
    heap: list[tuple[int, int, list[int]]] = [
        (freqs[s], i, [s]) for i, s in enumerate(syms)
    ]
    heap.append((1, len(syms), [_PHANTOM]))
    heapq.heapify(heap)
    depth: dict[int, int] = dict.fromkeys([*syms, _PHANTOM], 0)
    while len(heap) > 1:
        c1, t1, s1 = heapq.heappop(heap)
        c2, t2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, min(t1, t2), s1 + s2))
    if len(syms) == 1:
        depth = {syms[0]: 1, _PHANTOM: 1}
    if max(depth.values()) > 16:
        flat = max(1, math.ceil(math.log2(len(syms) + 1)))
        depth = dict.fromkeys(syms, flat)
        depth[_PHANTOM] = flat
    by_len: dict[int, list[int]] = {}
    for s, d in depth.items():
        by_len.setdefault(d, []).append(s)
    bits = [0] * 16
    values: list[int] = []
    for length in range(1, 17):
        row = sorted(by_len.get(length, []))
        # the phantom sorts first (-1) but must take the LAST code of
        # the deepest length to reserve all-ones: emit it last, and
        # only implicitly — it is dropped from HUFFVAL, its slot freed.
        row = [s for s in row if s != _PHANTOM]
        bits[length - 1] = len(row)
        values.extend(row)
    return bits, values


class BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (spec fill bits)."""
        if self._nbits:
            self.write((1 << (8 - self._nbits)) - 1, 8 - self._nbits)


class BitReader:
    """MSB-first reader over entropy-coded data: un-stuffs 0xFF00 and
    stops (without consuming) at any real marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg entropy data truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("jpeg entropy data truncated at 0xFF")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
                self._acc = (self._acc << 8) | 0xFF
                self._nbits += 8
                return
            raise ValueError("jpeg entropy decode ran into a marker")
        self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def read_bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self._nbits = 0
        self._acc = 0

    def at_marker(self) -> bool:
        return (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] != 0x00
        )


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t received bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return abs(v).bit_length()


# --------------------------------------------------------------- encoder

_MODES = {"gray": 1, "444": 3, "420": 3}


def _pad_replicate(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (bh - h % bh) % bh
    pw = (bw - w % bw) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    mode: str = "444",
    quality: int = 50,
    restart_interval: int = 0,
) -> bytes:
    """Spec-correct baseline JPEG encoder for planting fixtures.

    ``pixels``: grayscale bytes (``gray``) or interleaved RGB
    (``444``/``420``). Per-image optimal Huffman tables; 4:2:0 chroma
    is 2×2 box-averaged; planes pad by edge replication.
    """
    if mode not in _MODES:
        raise ValueError(f"unsupported jpeg mode {mode!r}")
    ncomp = _MODES[mode]
    if len(pixels) != width * height * ncomp:
        raise ValueError(
            f"pixels is {len(pixels)} bytes, expected {width * height * ncomp}"
        )
    qy = quality_scale(_QT_LUMA, quality)
    qc = quality_scale(_QT_CHROMA, quality)

    px = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    if ncomp == 1:
        planes = [px.reshape(height, width)]
    else:
        rgb = px.reshape(height, width, 3)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
        cb = np.floor(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)
        cr = np.floor(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)
        planes = [np.clip(p, 0, 255) for p in (y, cb, cr)]

    if mode == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
        sub = []
        for i, p in enumerate(planes):
            if i == 0:
                sub.append(p)
            else:
                p2 = _pad_replicate(p, 2, 2)
                # 2×2 box mean, round-half-up in integer arithmetic
                s = p2[0::2, 0::2] + p2[0::2, 1::2] + p2[1::2, 0::2] + p2[1::2, 1::2]
                sub.append(np.floor((s + 2) / 4))
        planes = sub
    else:
        samp = [(1, 1)] * ncomp

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)

    # per-component block grids, padded to whole MCUs
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    comp_blocks: list[np.ndarray] = []  # (by, bx, 8, 8) quantized coeffs
    for i, p in enumerate(planes):
        hi, vi = samp[i]
        p = _pad_replicate(p, mcus_y * vi * 8, mcus_x * hi * 8)
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coeffs = fdct_blocks(blocks - 128.0)
        q = quantize(coeffs, qy if i == 0 else qc)
        comp_blocks.append(q.reshape(by, bx, 8, 8))

    # MCU-ordered (comp, block) stream of zigzagged coefficient vectors
    def mcu_stream() -> list[tuple[int, np.ndarray]]:
        seq = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    hi, vi = samp[ci]
                    for byy in range(vi):
                        for bxx in range(hi):
                            blk = comp_blocks[ci][my * vi + byy, mx * hi + bxx]
                            seq.append((ci, blk[_ZZ_ROWS, _ZZ_COLS]))
        return seq

    stream = mcu_stream()
    blocks_per_mcu = sum(h * v for h, v in samp)

    # pass 1: symbol statistics (DC diffs restart-aware)
    def symbols(emit_dc, emit_ac) -> None:
        pred = [0] * ncomp
        for n, (ci, zz) in enumerate(stream):
            if (
                restart_interval
                and n
                and n % (restart_interval * blocks_per_mcu) == 0
            ):
                pred = [0] * ncomp
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            emit_dc(ci, diff)
            run = 0
            last_nz = max(np.nonzero(zz[1:])[0], default=-1)
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    emit_ac(ci, 0xF0, 0, 0)
                    run -= 16
                sz = _category(v)
                emit_ac(ci, (run << 4) | sz, v, sz)
                run = 0
            if last_nz < 62:  # zz[1:] index of last nonzero < 62 → EOB
                emit_ac(ci, 0x00, 0, 0)

    dc_freq: list[dict[int, int]] = [{} for _ in range(2)]
    ac_freq: list[dict[int, int]] = [{} for _ in range(2)]

    def tsel(ci: int) -> int:
        return 0 if ci == 0 else 1

    symbols(
        lambda ci, diff: dc_freq[tsel(ci)].update(
            {_category(diff): dc_freq[tsel(ci)].get(_category(diff), 0) + 1}
        ),
        lambda ci, sym, v, sz: ac_freq[tsel(ci)].update(
            {sym: ac_freq[tsel(ci)].get(sym, 0) + 1}
        ),
    )
    ntables = 1 if ncomp == 1 else 2
    dc_tabs = [build_huffman(dc_freq[t]) for t in range(ntables)]
    ac_tabs = [build_huffman(ac_freq[t]) for t in range(ntables)]
    dc_codes = [canonical_codes(*t) for t in dc_tabs]
    ac_codes = [canonical_codes(*t) for t in ac_tabs]

    # pass 2: entropy-coded segment
    w = BitWriter()
    pred = [0] * ncomp
    rst_n = 0
    for n, (ci, zz) in enumerate(stream):
        if restart_interval and n and n % (restart_interval * blocks_per_mcu) == 0:
            w.align()
            w.out.extend(bytes([0xFF, 0xD0 + rst_n]))
            rst_n = (rst_n + 1) % 8
            pred = [0] * ncomp
        t = tsel(ci)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        cat = _category(diff)
        ln, code = dc_codes[t][cat]
        w.write(code, ln)
        if cat:
            w.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[t][0xF0]
                w.write(code, ln)
                run -= 16
            sz = _category(v)
            ln, code = ac_codes[t][(run << 4) | sz]
            w.write(code, ln)
            w.write(v if v >= 0 else v + (1 << sz) - 1, sz)
            run = 0
        if run:
            ln, code = ac_codes[t][0x00]
            w.write(code, ln)
    w.align()

    # ----- assemble segments
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        zz = table[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        return seg(0xFFDB, bytes([tid]) + zz)

    def dht(tclass: int, tid: int, bits: list[int], values: list[int]) -> bytes:
        return seg(
            0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(values)
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += dqt(0, qy)
    if ncomp == 3:
        out += dqt(1, qc)
    sof_comps = b"".join(
        bytes([i + 1, (samp[i][0] << 4) | samp[i][1], 0 if i == 0 else 1])
        for i in range(ncomp)
    )
    out += seg(
        0xFFC0, struct.pack(">BHHB", 8, height, width, ncomp) + sof_comps
    )
    for t in range(ntables):
        out += dht(0, t, *dc_tabs[t])
        out += dht(1, t, *ac_tabs[t])
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos_comps = b"".join(
        bytes([i + 1, (tsel(i) << 4) | tsel(i)]) for i in range(ncomp)
    )
    out += seg(0xFFDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder


def decode_jpeg_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full baseline decode → (width, height, ncomp, samples).

    ``samples`` is interleaved RGB for 3-component images (JFIF YCbCr
    color convert, nearest-neighbour chroma upsampling) or the raw
    luma plane for grayscale. Rejects progressive/arithmetic/12-bit
    streams with ValueError — reject, never guess.
    """
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a jpeg (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
    restart = 0
    frame: dict[str, Any] | None = None

    def read_seg(p: int) -> tuple[int, bytes, int]:
        if p + 4 > len(payload):
            raise ValueError("truncated jpeg segment header")
        (marker, ln) = struct.unpack(">HH", payload[p : p + 4])
        if ln < 2 or p + 2 + ln > len(payload):
            raise ValueError("truncated jpeg segment body")
        return marker, payload[p + 4 : p + 2 + ln], p + 2 + ln

    while True:
        if pos + 2 > len(payload):
            raise ValueError("jpeg ended before SOS")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            raise ValueError("jpeg EOI before any scan")
        if not (0xFF00 < marker <= 0xFFFF):
            raise ValueError(f"bad jpeg marker 0x{marker:04x}")
        if marker in (0xFFC2, 0xFFC6, 0xFFCA, 0xFFCE):
            raise ValueError("progressive jpeg unsupported (baseline decoder)")
        if marker in (0xFFC9, 0xFFCB, 0xFFCD, 0xFFCF, 0xFFC3, 0xFFC7):
            raise ValueError("arithmetic/lossless jpeg unsupported")
        if marker == 0xFFDB:  # DQT
            _, body, pos = read_seg(pos)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                n = 64 * (2 if pq == 1 else 1)
                if bp + n > len(body):
                    raise ValueError("truncated DQT")
                vals = (
                    np.frombuffer(body[bp : bp + n], dtype=">u2")
                    if pq == 1
                    else np.frombuffer(body[bp : bp + n], dtype=np.uint8)
                ).astype(np.int64)
                tbl = np.zeros((8, 8), dtype=np.int64)
                tbl[_ZZ_ROWS, _ZZ_COLS] = vals
                qtables[tq] = tbl
                bp += n
        elif marker == 0xFFC4:  # DHT
            _, body, pos = read_seg(pos)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                values = list(body[bp + 17 : bp + 17 + nv])
                if len(values) != nv:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = canonical_codes(bits, values)
                bp += 17 + nv
        elif marker in (0xFFC0, 0xFFC1):  # SOF0/1 (both baseline-Huffman)
            _, body, pos = read_seg(pos)
            prec, h, w_, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported jpeg sample precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": w_, "h": h, "comps": comps}
        elif marker == 0xFFDD:  # DRI
            _, body, pos = read_seg(pos)
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFDA:  # SOS
            _, body, pos = read_seg(pos)
            break
        elif 0xFFE0 <= marker <= 0xFFEF or marker == 0xFFFE:  # APPn/COM
            _, _, pos = read_seg(pos)
        else:
            raise ValueError(f"unexpected jpeg marker 0x{marker:04x}")

    if frame is None:
        raise ValueError("jpeg SOS before SOF")
    ns = body[0]
    scan_sel = []
    for i in range(ns):
        cs, tt = body[1 + 2 * i : 3 + 2 * i]
        scan_sel.append((cs, tt >> 4, tt & 0x0F))
    comps = frame["comps"]
    if ns != len(comps):
        raise ValueError("partial-scan baseline jpeg unsupported")
    by_id = {c["id"]: c for c in comps}
    for cs, td, ta in scan_sel:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        by_id[cs]["td"], by_id[cs]["ta"] = td, ta

    w_, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(comps) == 1:
        # single-component scans are non-interleaved: 1 block per MCU
        comps[0]["h"] = comps[0]["v"] = hmax = vmax = 1
    mcus_x = -(-w_ // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    for c in comps:
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        c["pred"] = 0
        if c["tq"] not in qtables:
            raise ValueError(f"missing quant table {c['tq']}")

    reader = BitReader(payload, pos)
    n_mcus = mcus_x * mcus_y

    def decode_symbol(table: dict[int, tuple[int, int]]) -> int:
        # codes are prefix-free; walk bit by bit up to 16
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            for sym, (ln, cd) in table.items():
                if ln == length and cd == code:
                    return sym
        raise ValueError("invalid huffman code in jpeg scan")

    # pre-index tables by (length, code) for O(1) lookup
    fast: dict[int, dict[tuple[int, int], int]] = {}

    def decode_sym(tkey: tuple[int, int]) -> int:
        tid = id(huff[tkey])
        idx = fast.get(tid)
        if idx is None:
            idx = {(ln, cd): sym for sym, (ln, cd) in huff[tkey].items()}
            fast[tid] = idx
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            sym = idx.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in jpeg scan")

    for n in range(n_mcus):
        if restart and n and n % restart == 0:
            reader.align()
            if not (
                reader.pos + 1 < len(payload)
                and payload[reader.pos] == 0xFF
                and 0xD0 <= payload[reader.pos + 1] <= 0xD7
            ):
                raise ValueError("expected jpeg restart marker")
            reader.pos += 2
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(n, mcus_x)
        for c in comps:
            td, ta = c.get("td"), c.get("ta")
            if td is None or ta is None:
                raise ValueError("component missing scan table selector")
            for byy in range(c["v"]):
                for bxx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t_ = decode_sym((0, td))
                    diff = _extend(reader.receive(t_), t_)
                    c["pred"] += diff
                    zz[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = decode_sym((1, ta))
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("jpeg AC run past block end")
                        zz[k] = _extend(reader.receive(s), s)
                        k += 1
                    bi = (my * c["v"] + byy) * c["bw"] + (mx * c["h"] + bxx)
                    c["coef"][bi] = zz

    # dequant + IDCT + reassemble planes
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        coeffs = np.zeros((c["coef"].shape[0], 8, 8), dtype=np.float64)
        coeffs[:, _ZZ_ROWS, _ZZ_COLS] = c["coef"] * q[_ZZ_ROWS, _ZZ_COLS]
        spatial = idct_blocks(coeffs) + 128.0
        px = np.clip(np.floor(spatial + 0.5), 0, 255)
        plane = (
            px.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # crop to this component's true dims, then upsample to full res
        cw = -(-w_ * c["h"] // hmax) if len(comps) > 1 else w_
        ch = -(-h * c["v"] // vmax) if len(comps) > 1 else h
        plane = plane[:ch, :cw]
        if len(comps) > 1 and (c["h"] != hmax or c["v"] != vmax):
            ys = (np.arange(h) * c["v"]) // vmax
            xs = (np.arange(w_) * c["h"]) // hmax
            plane = plane[np.ix_(ys, xs)]
        else:
            plane = plane[:h, :w_]
        planes.append(plane)

    if len(planes) == 1:
        return w_, h, 1, planes[0].astype(np.uint8).tobytes()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.floor(p + 0.5), 0, 255) for p in (r, g, b)], axis=-1
    )
    return w_, h, 3, rgb.astype(np.uint8).tobytes()


def decode_jpeg(payload: bytes, want_entropy: bool = True) -> dict[str, Any]:
    """Features-contract wrapper (same dict shape as decode_ppm/
    decode_png in operators/multimodal.py)."""
    w, h, ncomp, samples = decode_jpeg_pixels(payload)
    arr = np.frombuffer(samples, dtype=np.uint8)
    n = arr.size
    mean = int(np.floor(arr.mean() + 0.5)) if n else 0
    ent = 0.0
    if n and want_entropy:
        counts = np.bincount(arr, minlength=256)
        p = counts[counts > 0] / n
        ent = float(-(p * np.log2(p)).sum())
    return {
        "format": "jpeg",
        "width": w,
        "height": h,
        "n_samples": n,
        "feat_mean": mean,
        "feat_entropy": int(round(ent * 100)),
    }
