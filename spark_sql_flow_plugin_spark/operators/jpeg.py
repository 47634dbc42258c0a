"""Baseline JPEG codec — stdlib + numpy only (no Pillow/libjpeg).

Decoder: baseline/extended-sequential huffman JPEG (SOF0/SOF1): segment
walk, DQT/DHT/DRI/SOS parsing, byte-unstuffing entropy decode with restart
markers, per-component MCU assembly for any sampling layout (4:4:4, 4:2:2,
4:2:0, ...), dequantize + dezigzag, exact float IDCT via the 8×8 cosine
basis (one numpy matmul pair per block), nearest-neighbor chroma
upsampling, and BT.601 YCbCr→RGB. PROGRESSIVE (SOF2) huffman JPEG decodes
natively too (T.81 Annex G): multi-scan coefficient accumulation with
spectral selection and successive approximation (DC/AC first + refinement
passes, EOB-run state, restart handling), then one vectorized
dequantize+IDCT at EOI. Arithmetic-coded / hierarchical / lossless
processes raise NotImplementedError — a loud capability gate, never a
wrong pixel.

Encoder: the matching baseline writer (Annex K quantization tables scaled
by quality, Annex K huffman tables, optional 2×2 chroma subsampling and
restart intervals), plus a progressive writer (``encode_jpeg_progressive``)
whose scan script exercises every Annex G decode path with quantization
identical to the baseline writer — so progressive encode→decode must equal
baseline encode→decode pixel-for-pixel, which the test suite asserts. A
production pipeline would use the writers for thumbnail sinks; the test
suite uses them to drive the decoder through every entropy / sampling path
and checks analytic cases (solid colors are DC-only blocks and must decode
to the exact color after quantization).

Scale posture: decode runs inside ``mapInPandas`` batches (see
operators.multimodal) — per-row Python work on opaque binary columns is
the documented exception to the no-Python-in-hot-path rule, and the
per-image cost is independent of corpus size.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 — luminance / chrominance quantization tables
QUANT_LUMA = np.array(
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
)
QUANT_CHROMA = np.array(
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
)

# Annex K.3 huffman specs: (BITS counts per code length 1..16, HUFFVAL)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
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
AC_CHROMA_SPEC = (
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

# 8×8 DCT-II basis: A[u, x] = C(u)/2 * cos((2x+1) u π / 16).
# forward: F = A @ f @ A.T ; inverse: f = A.T @ F @ A  (orthonormal).
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _build_huffman(bits, huffval):
    """Canonical huffman table → {(length, code): symbol}."""
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


def _canonical_codes(bits, huffval):
    """Canonical huffman table → {symbol: (code, length)} for encoding."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    byte-unstuffing; stops at any non-stuffing marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker: feed padding; caller handles the marker
                raise _MarkerReached(self.pos)
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self):
        self.nbits = 0
        self.bitbuf = 0


class _MarkerReached(Exception):
    def __init__(self, pos):
        self.pos = pos


def _huff_table(tables, idx, kind):
    tbl = tables.get(idx)
    if tbl is None:
        raise ValueError(
            f"scan references undefined {kind} huffman table {idx} — "
            "corrupt or truncated JPEG header"
        )
    return tbl


def _decode_huff_symbol(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB array (grayscale JPEGs are
    replicated across channels)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    progressive = False
    decoded_scans = 0
    coeffs: dict[int, np.ndarray] = {}  # progressive: cid -> (bh, bw, 64)

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xFF:
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
            # marker — consume ONE fill byte and rescan, or the real
            # marker byte would be misread as a segment length
            pos -= 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            if progressive and coeffs and decoded_scans:
                return _reconstruct_progressive(frame, coeffs, quant)
            break
        seg_len = int.from_bytes(payload[pos : pos + 2], "big")
        data = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(data[i : i + 64], np.uint8).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(data[i : i + 128], ">u2").astype(np.int64)
                    i += 128
                quant[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            h = int.from_bytes(data[1:3], "big")
            w = int.from_bytes(data[3:5], "big")
            ncomp = data[5]
            if ncomp not in (1, 3):
                # 4-component (Adobe CMYK/YCCK) and exotic layouts must
                # gate loudly — dropping the K plane would silently emit
                # wrong pixels, violating the module contract
                raise NotImplementedError(
                    f"only 1- or 3-component JPEG decodes natively "
                    f"(got {ncomp} components) — use Pillow for CMYK/YCCK"
                )
            comps = []
            for c in range(ncomp):
                cid = data[6 + c * 3]
                hv = data[7 + c * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, data[8 + c * 3]))
            frame = (h, w, comps)
            if marker == 0xC2:
                progressive = True
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                coeffs = {
                    cid: np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64)
                    for cid, hs, vs, _tq in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding process (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0x0F
                bits = list(data[i + 1 : i + 17])
                nval = sum(bits)
                huffval = list(data[i + 17 : i + 17 + nval])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, huffval)
                i += 17 + nval
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(data[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = data[0]
            scan_tables = {}
            scan_cids = []
            for c in range(ns):
                cid = data[1 + c * 2]
                tdta = data[2 + c * 2]
                scan_tables[cid] = (tdta >> 4, tdta & 0x0F)
                scan_cids.append(cid)
            if progressive:
                ss, se = data[1 + ns * 2], data[2 + ns * 2]
                ahal = data[3 + ns * 2]
                pos = _decode_progressive_scan(
                    payload, pos + seg_len, frame, scan_cids, scan_tables,
                    ss, se, ahal >> 4, ahal & 0x0F, huff_dc, huff_ac,
                    coeffs, restart_interval,
                )
                decoded_scans += 1
                continue
            if frame is not None and ns != len(frame[2]):
                raise NotImplementedError(
                    "non-interleaved (multi-scan) sequential JPEG is not "
                    "supported — one interleaved scan covering every "
                    "component is required"
                )
            return _decode_scan(
                payload,
                pos + seg_len,
                frame,
                quant,
                huff_dc,
                huff_ac,
                scan_tables,
                restart_interval,
            )
        pos += seg_len
    if progressive and decoded_scans:
        # scans were decoded but the stream ended before EOI — reconstruct
        # from the coefficients accumulated so far (a truncated progressive
        # stream is still a valid lower-fidelity image by design)
        if coeffs:
            return _reconstruct_progressive(frame, coeffs, quant)
        raise ValueError("truncated JPEG: missing EOI")
    raise ValueError("no SOS segment found")


def _decode_scan(
    payload, pos, frame, quant, huff_dc, huff_ac, scan_tables, restart_interval
):
    if frame is None:
        raise ValueError("SOS before SOF")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component block planes at the component's sampled resolution
    planes = {
        cid: np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        for cid, hs, vs, _tq in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    reader = _BitReader(payload, pos)

    try:
        _decode_mcus(
            payload, reader, comps, planes, pred, huff_dc, huff_ac,
            scan_tables, quant, mcus_x, mcus_y, restart_interval,
        )
    except (_MarkerReached, IndexError) as exc:
        # truncated entropy data or a desynced huffman stream running into
        # a marker/EOF: surface the module's documented error type
        raise ValueError("truncated or corrupt JPEG entropy stream") from exc

    return _planes_to_rgb(planes, frame)


def _planes_to_rgb(planes, frame):
    """Upsample component planes (nearest neighbor), crop, color-convert."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(p[:h, :w])

    if len(out) == 1:  # grayscale
        y = np.clip(out[0] + 128.0, 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = out[0] + 128.0, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _decode_mcus(
    payload, reader, comps, planes, pred, huff_dc, huff_ac, scan_tables,
    quant, mcus_x, mcus_y, restart_interval,
):
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                # byte-align, expect RSTn, reset DC predictors
                reader.byte_align()
                p = reader.pos
                while payload[p] == 0xFF and payload[p + 1] == 0x00:
                    p += 2
                if payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7:
                    reader.pos = p + 2
                pred = {cid: 0 for cid in pred}
            for cid, hs, vs, tq in comps:
                dc_tbl = _huff_table(huff_dc, scan_tables[cid][0], "DC")
                ac_tbl = _huff_table(huff_ac, scan_tables[cid][1], "AC")
                q = quant[tq]
                for by in range(vs):
                    for bx in range(hs):
                        block = _decode_block(reader, dc_tbl, ac_tbl, pred, cid, q)
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_index += 1


def _decode_block(reader, dc_tbl, ac_tbl, pred, cid, q):
    coeffs = np.zeros(64, dtype=np.int64)
    t = _decode_huff_symbol(reader, dc_tbl)
    diff = _extend(reader.receive(t), t)
    pred[cid] += diff
    coeffs[0] = pred[cid]
    k = 1
    while k < 64:
        rs = _decode_huff_symbol(reader, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: skip 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coeffs[k] = _extend(reader.receive(s), s)
        k += 1
    dq = np.zeros(64, dtype=np.float64)
    dq[ZIGZAG] = coeffs * q
    return _A.T @ dq.reshape(8, 8) @ _A


# ---------------------------------------------------------------------------
# progressive decoding (SOF2) — T.81 Annex G
# ---------------------------------------------------------------------------
#
# A progressive image arrives as several scans, each delivering a slice of
# the DCT coefficient space: a spectral band [Ss, Se] at a successive-
# approximation bit position (Ah = previous precision, Al = this scan's).
# Coefficients accumulate in integer arrays across scans (zigzag index
# order); dequantization + IDCT happen ONCE at EOI.  DC scans may be
# interleaved over all components; AC scans are per-component
# non-interleaved by spec (T.81 G.1.1.1.1).


def _comp_block_dims(frame, cid):
    """Non-interleaved scans walk ceil(comp_size/8) blocks, NOT the
    MCU-padded grid (T.81 A.2.2)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for c, hs, vs, _tq in comps:
        if c == cid:
            cw = -(-w * hs // hmax)
            ch = -(-h * vs // vmax)
            return -(-ch // 8), -(-cw // 8)
    raise ValueError(f"scan references unknown component id {cid}")


def _skip_restart(reader, payload):
    """Byte-align, consume an expected RSTn marker (tolerating stuffing)."""
    reader.byte_align()
    p = reader.pos
    while payload[p] == 0xFF and payload[p + 1] == 0x00:
        p += 2
    if payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7:
        reader.pos = p + 2


def _decode_progressive_scan(
    payload, pos, frame, scan_cids, scan_tables, ss, se, ah, al,
    huff_dc, huff_ac, coeffs, restart_interval,
):
    """Decode one progressive scan into the coefficient accumulators and
    return the stream position of the next marker."""
    if frame is None:
        raise ValueError("SOS before SOF")
    # T.81 G.1.1.1.1 scan-header constraints — enforced loudly so sequential
    # entropy data relabeled SOF2 can never be mis-decoded as progressive
    if ss == 0 and se != 0:
        raise ValueError(
            "invalid progressive scan header: a DC scan requires Se=0 "
            "(sequential scan data under an SOF2 marker?)"
        )
    if ss > 0 and len(scan_cids) != 1:
        raise ValueError(
            "invalid progressive scan header: AC scans are single-component"
        )
    if not (ss <= se <= 63):
        raise ValueError("invalid progressive spectral band")
    h, w, comps = frame
    comp_by_id = {c[0]: c for c in comps}
    reader = _BitReader(payload, pos)
    pred = {cid: 0 for cid in scan_cids}
    eobrun = 0
    unit = 0  # restart unit: MCU (interleaved) or block (non-interleaved)

    def _maybe_restart():
        nonlocal pred, eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            _skip_restart(reader, payload)
            pred = {cid: 0 for cid in scan_cids}
            eobrun = 0

    try:
        if ss == 0 and len(scan_cids) > 1:
            # interleaved DC scan: baseline MCU geometry
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    _maybe_restart()
                    for cid in scan_cids:
                        _c, hs, vs, _tq = comp_by_id[cid]
                        dc_tbl = (_huff_table(huff_dc, scan_tables[cid][0], "DC")
                                  if ah == 0 else None)
                        for by in range(vs):
                            for bx in range(hs):
                                block = coeffs[cid][my * vs + by, mx * hs + bx]
                                if ah == 0:
                                    _dc_first_block(reader, block, dc_tbl, pred, cid, al)
                                else:
                                    _dc_refine_block(reader, block, al)
                    unit += 1
        else:
            # non-interleaved scan (single component): raster over its blocks
            (cid,) = scan_cids
            bh, bw = _comp_block_dims(frame, cid)
            dc_tbl = (_huff_table(huff_dc, scan_tables[cid][0], "DC")
                      if ss == 0 and ah == 0 else None)
            ac_tbl = (_huff_table(huff_ac, scan_tables[cid][1], "AC")
                      if ss > 0 else None)
            for by in range(bh):
                for bx in range(bw):
                    _maybe_restart()
                    block = coeffs[cid][by, bx]
                    if ss == 0:
                        if ah == 0:
                            _dc_first_block(reader, block, dc_tbl, pred, cid, al)
                        else:
                            _dc_refine_block(reader, block, al)
                    elif ah == 0:
                        eobrun = _ac_first_block(
                            reader, block, ac_tbl, ss, se, al, eobrun
                        )
                    else:
                        eobrun = _ac_refine_block(
                            reader, block, ac_tbl, ss, se, al, eobrun
                        )
                    unit += 1
    except (_MarkerReached, IndexError) as exc:
        raise ValueError("truncated or corrupt JPEG entropy stream") from exc

    # advance to the next marker (skip trailing stuffed bytes / RSTn / fill)
    p = reader.pos
    while p + 1 < len(payload):
        if payload[p] != 0xFF:
            p += 1
        elif payload[p + 1] == 0x00:
            p += 2
        elif payload[p + 1] == 0xFF or 0xD0 <= payload[p + 1] <= 0xD7:
            p += 1 if payload[p + 1] == 0xFF else 2
        else:
            break
    return p


def _dc_first_block(reader, block, dc_tbl, pred, cid, al):
    t = _decode_huff_symbol(reader, dc_tbl)
    diff = _extend(reader.receive(t), t)
    pred[cid] += diff
    block[0] = pred[cid] << al


def _dc_refine_block(reader, block, al):
    if reader.read_bit():
        block[0] = int(block[0]) | (1 << al)


def _ac_first_block(reader, block, ac_tbl, ss, se, al, eobrun):
    """First AC scan for the band [ss, se] at bit position al (T.81 G.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff_symbol(reader, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past end of spectral band")
        block[k] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, block, ac_tbl, ss, se, al, eobrun):
    """Successive-approximation AC refinement (T.81 G.7): newly-significant
    coefficients arrive as run-length-coded ±1<<al; coefficients already
    nonzero receive one correction bit each as the run passes over them."""
    p1 = 1 << al
    m1 = -p1
    k = ss

    def _correct(idx):
        v = int(block[idx])
        if reader.read_bit() and (v & p1) == 0:
            block[idx] = v + (p1 if v >= 0 else m1)

    if eobrun == 0:
        while k <= se:
            rs = _decode_huff_symbol(reader, ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                newval = 0  # ZRL: 16 zero-history positions, no new coefficient
            else:
                if s != 1:
                    raise ValueError(
                        "invalid magnitude in AC refinement scan (must be 1)"
                    )
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                if block[k] != 0:
                    _correct(k)
                else:
                    if r == 0:
                        if newval:
                            block[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        # EOB run covers this block: refine the remaining nonzero history
        while k <= se:
            if block[k] != 0:
                _correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, coeffs, quant):
    """Dequantize + IDCT every accumulated block (vectorized) and finish
    through the shared upsample/color-convert path."""
    _h, _w, comps = frame
    planes = {}
    for cid, _hs, _vs, tq in comps:
        arr = coeffs[cid]  # (bh, bw, 64) int64, zigzag order
        bh, bw, _ = arr.shape
        q = quant[tq]
        dq = np.zeros((bh, bw, 64), dtype=np.float64)
        dq[..., ZIGZAG] = arr * q
        blocks = dq.reshape(bh, bw, 8, 8)
        spatial = np.einsum("ux,bcuv,vy->bcxy", _A, blocks, _A)
        planes[cid] = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _planes_to_rgb(planes, frame)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def pad_to_byte(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (bit-length t, t-bit magnitude code) per T.81 F.1.2.1.2."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


def _prepare_planes(rgb, quality: int, subsample: bool):
    """Shared writer preprocessing: RGB→YCbCr, quality-scaled zigzag quant
    tables, MCU-padded planes, optional 2×2 chroma averaging. BOTH writers
    must quantize identically — the progressive==baseline pixel-equality
    contract (asserted by the fuzz suite) rests on this being the single
    copy of the math. Returns (h, w, ypl, cbs, crs, ql, qc, hs_y, vs_y,
    mcus_x, mcus_y)."""
    rgb = np.asarray(rgb, dtype=np.float64)
    h, w = rgb.shape[:2]
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b

    ql = _scale_quant(QUANT_LUMA, quality)[ZIGZAG]
    qc = _scale_quant(QUANT_CHROMA, quality)[ZIGZAG]

    if subsample:
        hs_y = vs_y = 2
        mcu_w = mcu_h = 16
    else:
        hs_y = vs_y = 1
        mcu_w = mcu_h = 8
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    def _pad(plane, ph, pw):
        out = np.empty((ph, pw))
        hh, ww = plane.shape
        out[:hh, :ww] = plane
        out[hh:, :ww] = plane[hh - 1 : hh, :]  # edge-replicate
        out[:, ww:] = out[:, ww - 1 : ww]
        return out

    ypl = _pad(y, mcus_y * mcu_h, mcus_x * mcu_w)
    if subsample:
        cbf = _pad(cb, mcus_y * 16, mcus_x * 16)
        crf = _pad(cr, mcus_y * 16, mcus_x * 16)
        cbs = cbf.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
        crs = crf.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
    else:
        cbs = _pad(cb, mcus_y * 8, mcus_x * 8)
        crs = _pad(cr, mcus_y * 8, mcus_x * 8)
    return h, w, ypl, cbs, crs, ql, qc, hs_y, vs_y, mcus_x, mcus_y


def encode_jpeg(rgb: np.ndarray, quality: int = 90, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes. ``subsample=True`` writes
    4:2:0 (2×2-averaged chroma); ``restart_interval`` (in MCUs) emits DRI +
    RSTn markers so the decoder's restart path is exercised.

    The quant tables from _prepare_planes are already permuted into zigzag
    order: both the DQT payload and the per-coefficient quantization below
    consume zigzag positions (DQT stores zigzag per T.81), so a raster-
    order table here would scramble the effective weighting vs every spec
    decoder."""
    h, w, ypl, cbs, crs, ql, qc, hs_y, vs_y, mcus_x, mcus_y = _prepare_planes(
        rgb, quality, subsample
    )
    dc_l = _canonical_codes(*DC_LUMA_SPEC)
    ac_l = _canonical_codes(*AC_LUMA_SPEC)
    dc_c = _canonical_codes(*DC_CHROMA_SPEC)
    ac_c = _canonical_codes(*AC_CHROMA_SPEC)

    writer = _BitWriter()
    pred = [0, 0, 0]

    # zigzag direction: the decoder scatters with dq[ZIGZAG] = coeffs (the
    # i-th entropy-coded value lands at raster position ZIGZAG[i]), so the
    # encoder gathers with coef[ZIGZAG]; q tables above are already
    # permuted into the same zigzag order (DQT stores zigzag per T.81).
    def _emit_block(plane, y0, x0, q, dc_codes, ac_codes, ci):
        block = plane[y0 : y0 + 8, x0 : x0 + 8]
        coef = (_A @ block @ _A.T).flatten()
        zz = np.round(coef[ZIGZAG] / q).astype(np.int64)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t, code = _magnitude(diff)
        c, ln = dc_codes[t]
        writer.write(c, ln)
        if t:
            writer.write(code, t)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]  # ZRL
                writer.write(c, ln)
                run -= 16
            t, code = _magnitude(v)
            c, ln = ac_codes[(run << 4) | t]
            writer.write(c, ln)
            writer.write(code, t)
            run = 0
        if last_nz < 63:
            c, ln = ac_codes[0x00]  # EOB
            writer.write(c, ln)

    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.pad_to_byte()
                writer.out.append(0xFF)
                writer.out.append(0xD0 + rst)
                rst = (rst + 1) % 8
                pred[0] = pred[1] = pred[2] = 0
            for by in range(vs_y):
                for bx in range(hs_y):
                    _emit_block(
                        ypl,
                        (my * vs_y + by) * 8,
                        (mx * hs_y + bx) * 8,
                        ql,
                        dc_l,
                        ac_l,
                        0,
                    )
            _emit_block(cbs, my * 8, mx * 8, qc, dc_c, ac_c, 1)
            _emit_block(crs, my * 8, mx * 8, qc, dc_c, ac_c, 2)
            mcu_index += 1
    writer.pad_to_byte()

    # ---- assemble the JFIF byte stream ----
    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql.astype(np.uint8)))
    out += seg(0xDB, bytes([0x01]) + bytes(qc.astype(np.uint8)))
    sof = bytearray([8])
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    sof += bytes([1, (hs_y << 4) | vs_y, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += seg(0xC0, bytes(sof))
    for tc_th, spec in (
        (0x00, DC_LUMA_SPEC),
        (0x10, AC_LUMA_SPEC),
        (0x01, DC_CHROMA_SPEC),
        (0x11, AC_CHROMA_SPEC),
    ):
        bits, vals = spec
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2) — spectral selection + successive approximation
# ---------------------------------------------------------------------------
#
# Exists to drive the progressive decoder through every scan type with
# pixel-exact expectations: the scan script below quantizes identically to
# the baseline encoder, so progressive encode -> decode must reproduce the
# EXACT pixels of baseline encode -> decode for the same input.
#
# AC scans need EOBn symbols (0x10..0xE0), which the Annex K sequential AC
# tables do not contain, so progressive AC uses a fixed flat canonical
# table covering all 256 symbols (2 codes of length 8, 254 of length 9) —
# bulky output, trivially valid, and decodable by any conformant decoder.

PROG_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 2, 254, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def _fwd_coeffs(plane, q):
    """MCU-padded plane -> (bh, bw, 64) quantized zigzag coefficients."""
    ph, pw = plane.shape
    bh, bw = ph // 8, pw // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    freq = np.einsum("ux,bcxy,vy->bcuv", _A, blocks, _A)
    flat = freq.reshape(bh, bw, 64)
    return np.round(flat[..., ZIGZAG] / q).astype(np.int64)


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform: v / 2^al truncated toward zero (T.81 G.1.2.2)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


class _ProgACState:
    """Per-scan EOB-run + buffered-correction-bit state."""

    def __init__(self, writer, ac_codes):
        self.w = writer
        self.codes = ac_codes
        self.eobrun = 0
        self.be_bits: list[int] = []

    def flush_eob(self):
        if self.eobrun == 0 and not self.be_bits:
            return
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            c, ln = self.codes[nbits << 4]
            self.w.write(c, ln)
            if nbits:
                self.w.write(self.eobrun - (1 << nbits), nbits)
        for b in self.be_bits:
            self.w.write(b, 1)
        self.eobrun = 0
        self.be_bits = []


def _emit_ac_first(zz, st, ss, se, al):
    band = [(k, _trunc_shift(int(zz[k]), al)) for k in range(ss, se + 1)]
    if all(v == 0 for _k, v in band):
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob()
        return
    st.flush_eob()
    r = 0
    for _k, v in band:
        if v == 0:
            r += 1
            continue
        while r > 15:
            c, ln = st.codes[0xF0]
            st.w.write(c, ln)
            r -= 16
        t, code = _magnitude(v)
        c, ln = st.codes[(r << 4) | t]
        st.w.write(c, ln)
        st.w.write(code, t)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob()


def _emit_ac_refine(zz, st, ss, se, al):
    mags = [(k, _trunc_shift(abs(int(zz[k])), al)) for k in range(ss, se + 1)]
    eob_idx = max((k for k, t in mags if t == 1), default=ss - 1)
    if eob_idx < ss:
        # no newly-significant coefficient: whole block folds into the EOB
        # run; history-nonzero coefficients contribute buffered bits
        st.be_bits.extend(t & 1 for _k, t in mags if t >= 2)
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob()
        return
    st.flush_eob()
    r = 0
    br: list[int] = []
    for k, t in mags:
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob_idx:
            c, ln = st.codes[0xF0]
            st.w.write(c, ln)
            r -= 16
            for b in br:
                st.w.write(b, 1)
            br = []
        if t >= 2:  # history-nonzero: one buffered correction bit
            br.append(t & 1)
            continue
        # newly significant (t == 1): run-length symbol + sign bit
        c, ln = st.codes[(r << 4) | 1]
        st.w.write(c, ln)
        st.w.write(1 if int(zz[k]) > 0 else 0, 1)
        for b in br:
            st.w.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.be_bits.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush_eob()


def encode_jpeg_progressive(rgb: np.ndarray, quality: int = 90,
                            subsample: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → progressive (SOF2) JFIF bytes.

    Scan script: interleaved DC first at Al=1, per-component AC first scans
    (the Y band split in two to exercise spectral selection), DC refinement,
    then per-component AC refinement — every Annex G decode path.
    Quantization is identical to ``encode_jpeg``, so decoding both streams
    must yield identical pixels.
    """
    h, w, ypl, cbs, crs, ql, qc, hs_y, vs_y, mcus_x, mcus_y = _prepare_planes(
        rgb, quality, subsample
    )

    # quantized zigzag coefficients per component
    zz = {1: _fwd_coeffs(ypl, ql), 2: _fwd_coeffs(cbs, qc), 3: _fwd_coeffs(crs, qc)}
    samp = {1: (hs_y, vs_y), 2: (1, 1), 3: (1, 1)}

    dc_codes = {1: _canonical_codes(*DC_LUMA_SPEC), 2: _canonical_codes(*DC_CHROMA_SPEC)}
    dc_codes[3] = dc_codes[2]
    ac_codes = _canonical_codes(*PROG_AC_SPEC)

    # non-interleaved block dims per component (true, not MCU-padded)
    def _nb_dims(cid):
        hs, vs = samp[cid]
        cw = -(-w * hs // (8 * hs_y))
        ch = -(-h * vs // (8 * vs_y))
        return ch, cw

    def _dc_scan(al):
        wtr = _BitWriter()
        pred = {1: 0, 2: 0, 3: 0}
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid in (1, 2, 3):
                    hs, vs = samp[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            v = int(zz[cid][my * vs + by, mx * hs + bx, 0]) >> al
                            diff = v - pred[cid]
                            pred[cid] = v
                            t, code = _magnitude(diff)
                            c, ln = dc_codes[cid][t]
                            wtr.write(c, ln)
                            if t:
                                wtr.write(code, t)
        wtr.pad_to_byte()
        return bytes(wtr.out)

    def _dc_refine_scan(al):
        wtr = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid in (1, 2, 3):
                    hs, vs = samp[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            v = int(zz[cid][my * vs + by, mx * hs + bx, 0])
                            wtr.write((v >> al) & 1, 1)
        wtr.pad_to_byte()
        return bytes(wtr.out)

    def _ac_scan(cid, ss, se, ah, al):
        wtr = _BitWriter()
        st = _ProgACState(wtr, ac_codes)
        bh, bw = _nb_dims(cid)
        emit = _emit_ac_first if ah == 0 else _emit_ac_refine
        for by in range(bh):
            for bx in range(bw):
                emit(zz[cid][by, bx], st, ss, se, al)
        st.flush_eob()
        wtr.pad_to_byte()
        return bytes(wtr.out)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def sos(comps_tbls, ss, se, ah, al):
        body = bytearray([len(comps_tbls)])
        for cid, td, ta in comps_tbls:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, bytes(body))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql.astype(np.uint8)))
    out += seg(0xDB, bytes([0x01]) + bytes(qc.astype(np.uint8)))
    sof = bytearray([8])
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    sof += bytes([1, (hs_y << 4) | vs_y, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += seg(0xC2, bytes(sof))
    for tc_th, spec in (
        (0x00, DC_LUMA_SPEC),
        (0x01, DC_CHROMA_SPEC),
        (0x10, PROG_AC_SPEC),
    ):
        bits, vals = spec
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

    # scan script
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1)
    out += _dc_scan(1)
    out += sos([(1, 0, 0)], 1, 5, 0, 1)
    out += _ac_scan(1, 1, 5, 0, 1)
    out += sos([(1, 0, 0)], 6, 63, 0, 1)
    out += _ac_scan(1, 6, 63, 0, 1)
    out += sos([(2, 0, 0)], 1, 63, 0, 1)
    out += _ac_scan(2, 1, 63, 0, 1)
    out += sos([(3, 0, 0)], 1, 63, 0, 1)
    out += _ac_scan(3, 1, 63, 0, 1)
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0)
    out += _dc_refine_scan(0)
    out += sos([(1, 0, 0)], 1, 5, 1, 0)
    out += _ac_scan(1, 1, 5, 1, 0)
    out += sos([(1, 0, 0)], 6, 63, 1, 0)
    out += _ac_scan(1, 6, 63, 1, 0)
    out += sos([(2, 0, 0)], 1, 63, 1, 0)
    out += _ac_scan(2, 1, 63, 1, 0)
    out += sos([(3, 0, 0)], 1, 63, 1, 0)
    out += _ac_scan(3, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)
