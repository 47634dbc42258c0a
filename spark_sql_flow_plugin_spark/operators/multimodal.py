"""Multimodal column plumbing (NEW — SURVEY.md §7 M7).

Images/audio/video are carried as opaque ``binary`` columns next to a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signatures, partitioning — is real and tested. The codec
layer decodes natively, stdlib+numpy only: PPM (P6), uncompressed 24-bit
BMP, PNG (zlib + all five filters, every 8/16-bit color type, Adam7
interlace), GIF (pure-python LZW, interlace, local/global palettes),
huffman JPEG — baseline AND progressive (operators.jpeg — any chroma
sampling, restart markers) — and WAV (integer/float PCM + G.711).
``multimodal_image_decode_stats`` / ``multimodal_jpeg_roundtrip`` run REAL
decode→feature pipelines on them. Only perceptual audio codecs (mp3/ogg/
flac) and arithmetic/hierarchical JPEG still need soundfile/Pillow, which
this container lacks — those paths raise ``NotImplementedError`` behind an
import gate; the remaining pipelines use a deterministic fake "decode"
(byte inspection / md5 features) so correctness stays oracle-checkable.

At 100 TB the pattern matters more than the stub: binary payloads stay in
Arrow buffers end to end (no base64, no driver collect), batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, and per-batch
work is vectorized.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..partitioning import spread
from ..registry import register
from ..sources import load


def decode_image(payload: bytes) -> "object":
    """Decode an image payload → (h, w, 3) uint8 RGB numpy array.

    REAL decode paths, stdlib+numpy only: binary PPM (P6), uncompressed
    24-bit BMP, PNG in every 8/16-bit color type incl. palette and Adam7
    interlace (zlib inflate + full filter reconstruction:
    None/Sub/Up/Average/Paeth), and huffman JPEG —
    baseline / extended-sequential (any chroma sampling, restart markers)
    AND progressive SOF2 (multi-scan successive approximation) — see
    operators.jpeg. Arithmetic-coded / hierarchical JPEG and other codecs
    fall through to Pillow, which this container doesn't ship, so they
    raise NotImplementedError behind the import gate.
    """
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:2] in (b"II", b"MM") and payload[2:4] in (b"*\x00", b"\x00*"):
        return _decode_tiff(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        try:
            return decode_jpeg(payload)
        except NotImplementedError:
            pass  # arithmetic/hierarchical/CMYK: try Pillow below
    try:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "PPM(P6)/BMP24/PNG(8/16-bit, Adam7)/huffman-JPEG decode "
            "natively; other codecs require Pillow on the cluster image"
        ) from exc


def _decode_ppm(payload: bytes) -> "object":
    """Binary PPM (P6): ASCII header `P6 <w> <h> <maxval>` (whitespace/
    `#`-comment separated), one whitespace byte, then h×w×3 raw RGB bytes."""
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    pos += 1  # single whitespace after maxval
    data = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return data.reshape(h, w, 3)


def _decode_bmp(payload: bytes) -> "object":
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): rows 4-byte padded,
    bottom-up when height is positive, pixels stored BGR."""
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=abs(h) * row_bytes, offset=off
    ).reshape(abs(h), row_bytes)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR → RGB


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass grid: (x_origin, y_origin, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw, at, ph, rowbytes, bpp):
    """Reconstruct ``ph`` scanlines of ``rowbytes`` each from the filtered
    stream starting at ``raw[at]``; returns ((ph, rowbytes) int32, new
    offset). None/Up are row-vectorized; Sub vectorizes per byte lane
    (recon[x] = line[x] + recon[x-bpp] is a lane-wise running sum, and
    addition mod 256 commutes with cumsum); Average/Paeth carry a
    non-linear left dependency, so those rows walk pixel-at-a-time with
    the bpp lanes vectorized (r14: the per-BYTE walk made PNG decode the
    dominant cost of the whole multimodal battery at 14 ms/72x64 image)."""
    out = np.zeros((ph, rowbytes), dtype=np.int32)
    for r in range(ph):
        ftype = raw[at]
        at += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=rowbytes, offset=at).astype(
            np.int32
        )
        at += rowbytes
        prior = out[r - 1] if r > 0 else np.zeros(rowbytes, dtype=np.int32)
        if ftype == 0:
            out[r] = line
        elif ftype == 2:  # Up
            out[r] = (line + prior) % 256
        elif ftype == 1:  # Sub: lane-wise running sum mod 256
            recon = out[r]
            for lane in range(bpp):
                recon[lane::bpp] = np.cumsum(line[lane::bpp], dtype=np.int64) % 256
        elif ftype in (3, 4):  # Average / Paeth: native-int byte walk —
            # numpy scalar indexing boxes every element (~10x slower than
            # python ints in a tight loop), so these rows walk plain lists
            ln = line.tolist()
            pr_row = prior.tolist()
            rc = [0] * rowbytes
            for x in range(rowbytes):
                a = rc[x - bpp] if x >= bpp else 0
                b = pr_row[x]
                if ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = pr_row[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rc[x] = (ln[x] + pred) & 255
            out[r] = rc
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
    return out, at


def _png_bytes_to_px(recon, pw, channels, depth):
    """(ph, rowbytes) reconstructed bytes -> (ph, pw, channels) samples."""
    ph = recon.shape[0]
    if depth == 8:
        return recon.reshape(ph, pw, channels)
    pairs = recon.reshape(ph, pw, channels, 2)
    return (pairs[..., 0] << 8) | pairs[..., 1]  # network byte order


def _decode_png(payload: bytes) -> "object":
    """PNG via stdlib zlib: walks the chunk stream (IHDR / PLTE / IDAT* /
    IEND), inflates the concatenated IDAT payload, reconstructs scanlines
    through the five PNG filters, and handles every 8/16-bit color type —
    grayscale(0), RGB(2), palette(3, 8-bit), gray+alpha(4), RGBA(6) — plus
    Adam7 interlacing (seven filtered sub-images scattered on the pass
    grid). 16-bit samples downscale with >> 8; alpha is DROPPED (straight
    RGB — compositing policy belongs to the caller). Sub-8-bit palette /
    grayscale depths (1/2/4) gate to Pillow."""
    import zlib

    pos, w, h, idat, plte = 8, None, None, bytearray(), None
    depth = ct = interlace = None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc32
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ct, comp, filt, interlace = data[8:13]
            if (
                ct not in _PNG_CHANNELS
                or depth not in (8, 16)
                or (ct == 3 and depth != 8)
                or comp != 0
                or filt != 0
                or interlace not in (0, 1)
            ):
                raise NotImplementedError(
                    "PNG layout not supported natively (8/16-bit color "
                    "types 0/2/3/4/6, filter 0, Adam7 or none) — use "
                    "Pillow for exotic layouts"
                )
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if ct == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    channels = _PNG_CHANNELS[ct]
    bpp = channels * (depth // 8)
    raw = zlib.decompress(bytes(idat))

    if interlace == 0:
        expect = h * (w * bpp + 1)
        if len(raw) != expect:
            raise ValueError("PNG scanline data length mismatch")
        recon, _ = _png_unfilter(raw, 0, h, w * bpp, bpp)
        img = _png_bytes_to_px(recon, w, channels, depth)
    else:
        img = np.zeros((h, w, channels), dtype=np.int32)
        at = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            recon, at = _png_unfilter(raw, at, ph, pw * bpp, bpp)
            img[y0::dy, x0::dx] = _png_bytes_to_px(recon, pw, channels, depth)
        if at != len(raw):
            raise ValueError("PNG interlaced data length mismatch")

    if depth == 16:
        img = img >> 8
    if ct == 3:
        return plte[img[:, :, 0]]
    if ct in (4, 6):  # drop alpha
        img = img[:, :, : channels - 1]
    if img.shape[2] == 1:  # grayscale -> replicate
        img = np.repeat(img, 3, axis=2)
    return img.astype(np.uint8)


def _png_filter_rows(rows, bpp):
    """Filter (ph, rowbytes) sample bytes with type (row % 5) — cycling
    through all five PNG filters so round-trips exercise every
    reconstruction path. Returns the filtered scanline stream."""
    ph, rowbytes = rows.shape
    zero = np.zeros(bpp, dtype=np.int32)
    scan = bytearray()
    for r in range(ph):
        ftype = r % 5
        raw = rows[r]
        prior = rows[r - 1] if r > 0 else np.zeros(rowbytes, dtype=np.int32)
        left = np.concatenate([zero, raw[:-bpp]]) if rowbytes > bpp else np.zeros(
            rowbytes, dtype=np.int32
        )
        upleft = np.concatenate([zero, prior[:-bpp]]) if rowbytes > bpp else np.zeros(
            rowbytes, dtype=np.int32
        )
        if ftype == 0:
            filt = raw
        elif ftype == 1:
            filt = (raw - left) % 256
        elif ftype == 2:
            filt = (raw - prior) % 256
        elif ftype == 3:
            filt = (raw - (left + prior) // 2) % 256
        else:
            p = left + prior - upleft
            pa = np.abs(p - left)
            pb = np.abs(p - prior)
            pc = np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, upleft)
            )
            filt = (raw - pred) % 256
        scan.append(ftype)
        scan.extend(filt.astype(np.uint8).tobytes())
    return scan


def _png_samples(arr, color_type, bit_depth):
    """RGB uint8 input -> (h, w, channels) samples + optional palette.

    gray takes channel 0; alpha channels take channel 1 (decode drops
    them, so any deterministic content exercises the filter paths)."""
    if color_type == 0:
        samples = arr[:, :, :1]
    elif color_type == 2:
        samples = arr
    elif color_type == 3:
        flat = arr.reshape(-1, 3)
        palette, idx = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError("palette PNG needs <= 256 distinct colors")
        return idx.reshape(arr.shape[0], arr.shape[1], 1).astype(np.uint8), palette
    elif color_type == 4:
        samples = np.stack([arr[:, :, 0], arr[:, :, 1]], axis=2)
    elif color_type == 6:
        samples = np.concatenate([arr, arr[:, :, 1:2]], axis=2)
    else:
        raise ValueError(f"unsupported color type {color_type}")
    if bit_depth == 16:
        return samples.astype(np.uint16) * 257, None  # v<<8 | v
    return samples.astype(np.uint8), None


def encode_png(arr, *, color_type: int = 2, bit_depth: int = 8,
               interlace: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → PNG. Defaults to the 8-bit RGB non-interlaced
    layout; ``color_type``/``bit_depth``/``interlace`` select grayscale /
    palette / alpha variants, 16-bit samples, and Adam7 — the writer-side
    twin the test suite uses to drive every native decode path. Scanline
    filters cycle through all five types per row."""
    import zlib

    h, w = arr.shape[0], arr.shape[1]
    samples, palette = _png_samples(np.asarray(arr), color_type, bit_depth)
    channels = samples.shape[2]
    bpp = channels * (bit_depth // 8)

    def to_rows(block):
        bh, bw = block.shape[0], block.shape[1]
        if bit_depth == 16:
            by = np.zeros((bh, bw, channels, 2), dtype=np.int32)
            by[..., 0] = block >> 8
            by[..., 1] = block & 0xFF
            return by.reshape(bh, bw * bpp)
        return block.astype(np.int32).reshape(bh, bw * bpp)

    scan = bytearray()
    if interlace == 0:
        scan = _png_filter_rows(to_rows(samples), bpp)
    else:
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] <= 0 or sub.shape[1] <= 0:
                continue
            scan.extend(_png_filter_rows(to_rows(sub), bpp))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([bit_depth, color_type, 0, 0, interlace])
    )
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return out + chunk(b"IDAT", zlib.compress(bytes(scan))) + chunk(b"IEND", b"")


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6)."""
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(arr).tobytes()


def encode_bmp(arr) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP (bottom-up, BGR)."""
    h, w = arr.shape[0], arr.shape[1]
    row_bytes = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    data = body.tobytes()
    header = (
        b"BM"
        + (54 + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + data


_GIF_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]  # (start, step)


def _lzw_decode(min_code_size: int, data: bytes) -> list:
    """GIF-flavor LZW: LSB-first variable-width codes, CLEAR/EOI handling,
    dictionary growth to 4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    big = int.from_bytes(data, "little")
    total_bits = len(data) * 8
    bitpos = 0
    code_size = min_code_size + 1
    table = {i: (i,) for i in range(clear)}
    next_code = eoi + 1
    prev = None
    out = []
    while bitpos + code_size <= total_bits:
        code = (big >> bitpos) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = {i: (i,) for i in range(clear)}
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)
            else:
                raise ValueError("corrupt GIF LZW stream")
            if next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out.extend(entry)
        prev = entry
    return out


def _decode_gif(payload: bytes) -> "object":
    """GIF87a/89a via a pure-python LZW decoder: logical screen descriptor,
    global/local color tables, extension-block skipping, sub-block
    reassembly, and the 4-pass interlace row order. Animations decode as
    their FIRST frame (the corpus-stats contract; temporal sampling is
    multimodal_frame_sample's job)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = payload[10]
    gct = None
    pos = 13
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
            iflags = payload[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF image with no color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data.extend(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(min_code, bytes(data))
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data truncated")
            grid = np.array(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
                out = np.zeros_like(grid)
                src_r = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for r in range(start, ih, step):
                        out[r] = grid[src_r]
                        src_r += 1
                grid = out
            if int(grid.max(initial=0)) >= len(table):
                raise ValueError(
                    "GIF pixel index exceeds color table size — corrupt "
                    "stream (never substitute a wrong color silently)"
                )
            return table[grid]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
    raise ValueError("GIF contains no image data")


def encode_gif(arr, *, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB (<= 256 distinct colors) → GIF89a.

    Writer-side twin for the decoder tests: palette from unique colors,
    fixed-width LZW with periodic CLEAR codes (the classic
    "uncompressed GIF" technique — every pixel emits one literal code and
    the dictionary never grows past the current code width)."""
    h, w = arr.shape[0], arr.shape[1]
    flat = np.asarray(arr).reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("GIF needs <= 256 distinct colors")
    depth = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    table_n = 1 << depth
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    grid = idx.reshape(h, w)
    if interlace:
        rows = []
        for start, step in _GIF_INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        grid = grid[rows]
    codes = grid.reshape(-1).tolist()

    min_code = depth
    clear = 1 << min_code
    eoi = clear + 1
    code_size = min_code + 1
    span = clear - 2  # literals per CLEAR before the width would grow
    bits = bitlen = 0
    stream = bytearray()

    def emit(c):
        nonlocal bits, bitlen
        bits |= c << bitlen
        bitlen += code_size
        while bitlen >= 8:
            stream.append(bits & 0xFF)
            bits >>= 8
            bitlen -= 8

    emit(clear)
    for i, c in enumerate(codes):
        if i and i % span == 0:
            emit(clear)
        emit(int(c))
    emit(eoi)
    if bitlen:
        stream.append(bits & 0xFF)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0])
    out += pal.tobytes()
    out += b"\x2c" + (0).to_bytes(2, "little") * 2
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([min_code])
    for i in range(0, len(stream), 255):
        block = stream[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def _decode_packbits(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773)."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op per spec
    if len(out) < expected:
        raise ValueError("TIFF PackBits data truncated")
    return bytes(out[:expected])


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW (compression 5): MSB-first variable-width codes,
    Clear=256/EOI=257, EarlyChange width bumps at 2^w - 1."""
    big = int.from_bytes(data, "big")
    total_bits = len(data) * 8
    bitpos = 0
    width = 9
    table = {i: bytes([i]) for i in range(256)}
    next_code = 258
    prev = None
    out = bytearray()
    while bitpos + width <= total_bits and len(out) < expected:
        code = (big >> (total_bits - bitpos - width)) & ((1 << width) - 1)
        bitpos += width
        if code == 256:  # Clear
            width = 9
            table = {i: bytes([i]) for i in range(256)}
            next_code = 258
            prev = None
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            if code not in table:
                raise ValueError("corrupt TIFF LZW stream")
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt TIFF LZW stream")
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) - 1 and width < 12:
                    width += 1  # EarlyChange
        out += entry
        prev = entry
    if len(out) < expected:
        raise ValueError("TIFF LZW data truncated")
    return bytes(out[:expected])


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Greedy TIFF LZW writer (EarlyChange), for the decoder tests."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    bits = 0
    nbits = 0
    out = bytearray()

    def emit(c):
        nonlocal bits, nbits
        bits = (bits << width) | c
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bits >> nbits) & 0xFF)

    emit(256)  # Clear
    buf = b""
    for byte in data:
        cand = buf + bytes([byte])
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        if next_code >= 4093:
            # table nearly full: restart (libtiff practice) so encoder and
            # decoder can never disagree about the 12-bit boundary
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        else:
            table[cand] = next_code
            next_code += 1
            # the decoder registers each entry one code later, so its
            # EarlyChange trigger (2^w - 1) fires one entry after ours
            if next_code == (1 << width) and width < 12:
                width += 1
        buf = bytes([byte])
    if buf:
        emit(table[buf])
    emit(257)  # EOI
    if nbits:
        out.append((bits << (8 - nbits)) & 0xFF)
    return bytes(out)


def _decode_tiff(payload: bytes) -> "object":
    """Baseline TIFF: II/MM byte orders, first IFD, 8-bit grayscale or RGB,
    chunky planar config, strip layout, compression none(1), LZW(5) with
    horizontal-predictor support, or PackBits(32773). JPEG-in-TIFF, tiles,
    planar=2, and non-8-bit depths gate loudly to Pillow — never a wrong
    pixel."""
    if payload[:2] == b"II":
        bo = "little"
    elif payload[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("not a TIFF")
    if int.from_bytes(payload[2:4], bo) != 42:
        raise ValueError("bad TIFF magic")

    def u16(o):
        return int.from_bytes(payload[o : o + 2], bo)

    def u32(o):
        return int.from_bytes(payload[o : o + 4], bo)

    ifd = u32(4)
    n_entries = u16(ifd)
    tags = {}
    for e in range(n_entries):
        at = ifd + 2 + e * 12
        tag, typ, cnt = u16(at), u16(at + 2), u32(at + 4)
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            continue  # RATIONAL/etc — not needed for the supported layout
        total = size * cnt
        off = at + 8 if total <= 4 else u32(at + 8)
        vals = [
            int.from_bytes(payload[off + i * size : off + (i + 1) * size], bo)
            for i in range(cnt)
        ]
        tags[tag] = vals
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as exc:
        raise ValueError("TIFF missing required tag") from exc
    comp = tags.get(259, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * spp)
    rows_per_strip = tags.get(278, [h])[0]
    planar = tags.get(284, [1])[0]
    predictor = tags.get(317, [1])[0]
    if (
        comp not in (1, 5, 32773)
        or spp not in (1, 3)
        or any(b != 8 for b in bits)
        or planar != 1
        or predictor not in (1, 2)
        or 322 in tags  # TileWidth: tiled layout
    ):
        raise NotImplementedError(
            "TIFF layout not supported natively (8-bit gray/RGB, chunky, "
            "strips, compression none/PackBits/LZW, predictor none/"
            "horizontal) — use Pillow"
        )
    raw = bytearray()
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = payload[off : off + cnt]
        n_rows = min(rows_per_strip, h - s * rows_per_strip)
        expected = n_rows * w * spp
        if comp == 32773:
            raw += _decode_packbits(strip, expected)
        elif comp == 5:
            raw += _lzw_decode_tiff(strip, expected)
        else:
            raw += strip[:expected]
    if len(raw) < h * w * spp:
        raise ValueError("TIFF strip data truncated")
    arr = np.frombuffer(bytes(raw), np.uint8, h * w * spp).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: undo the per-row deltas
        arr = arr.astype(np.int32).reshape(h, w * spp)
        arr = np.cumsum(arr.reshape(h, w, spp), axis=1, dtype=np.int64) % 256
        arr = arr.astype(np.uint8).reshape(h, w, spp)
    if spp == 1:
        if tags.get(262, [1])[0] == 0:  # WhiteIsZero
            arr = 255 - arr
        arr = np.repeat(arr, 3, axis=2)
    return arr


def encode_tiff(arr, *, packbits: bool = False, lzw: bool = False,
                predictor: bool = False, byte_order: str = "little",
                rows_per_strip: int = 4) -> bytes:
    """(h, w, 3) uint8 RGB → baseline TIFF (strips; optional PackBits or
    LZW compression, optional horizontal predictor with LZW).

    Writer-side twin for the decoder tests; PackBits encoding uses
    maximal repeat runs + literal spans."""
    bo = byte_order
    h, w = arr.shape[0], arr.shape[1]
    work = np.ascontiguousarray(arr)
    if predictor:
        d = work.astype(np.int32)
        d[:, 1:, :] = (d[:, 1:, :] - d[:, :-1, :]) % 256
        work = d.astype(np.uint8)
    data = work.reshape(h, w * 3)

    def pack_row_bytes(rows):
        flat = rows.tobytes()
        if lzw:
            return _lzw_encode_tiff(flat)
        if not packbits:
            return flat
        out = bytearray()
        i = 0
        n = len(flat)
        while i < n:
            # find repeat run
            j = i
            while j + 1 < n and flat[j + 1] == flat[i] and j - i < 126:
                j += 1
            if j > i + 1:  # run of >= 3
                out.append(257 - (j - i + 1))
                out.append(flat[i])
                i = j + 1
                continue
            # literal span until next run of >= 3
            lit = i
            while (
                lit < n
                and lit - i < 127
                and not (
                    lit + 2 < n
                    and flat[lit] == flat[lit + 1] == flat[lit + 2]
                )
            ):
                lit += 1
            out.append(lit - i - 1)
            out += flat[i:lit]
            i = lit
        return bytes(out)

    strips = []
    for r0 in range(0, h, rows_per_strip):
        strips.append(pack_row_bytes(data[r0 : r0 + rows_per_strip]))

    def b16(v):
        return v.to_bytes(2, bo)

    def b32(v):
        return v.to_bytes(4, bo)

    n_strips = len(strips)
    # layout: header(8) + IFD + [strip offsets array][counts array][bits]
    entries = 11 if predictor else 10
    ifd_at = 8
    ifd_len = 2 + entries * 12 + 4
    arrays_at = ifd_at + ifd_len
    off_arr_at = arrays_at
    cnt_arr_at = off_arr_at + 4 * n_strips
    bits_at = cnt_arr_at + 4 * n_strips
    data_at = bits_at + 6
    strip_offsets = []
    pos = data_at
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    def entry(tag, typ, cnt, val, inline_u16=False):
        out = b16(tag) + b16(typ) + b32(cnt)
        if inline_u16:
            out += b16(val) + b16(0)
        else:
            out += b32(val)
        return out

    e = b""
    e += entry(256, 4, 1, w)
    e += entry(257, 4, 1, h)
    e += entry(258, 3, 3, bits_at)
    e += entry(259, 3, 1, 5 if lzw else (32773 if packbits else 1), inline_u16=True)
    e += entry(262, 3, 1, 2, inline_u16=True)  # RGB
    e += entry(273, 4, n_strips, off_arr_at if n_strips > 1 else strip_offsets[0])
    e += entry(277, 3, 1, 3, inline_u16=True)
    e += entry(278, 4, 1, rows_per_strip)
    e += entry(279, 4, n_strips, cnt_arr_at if n_strips > 1 else len(strips[0]))
    e += entry(284, 3, 1, 1, inline_u16=True)
    if predictor:
        e += entry(317, 3, 1, 2, inline_u16=True)
    ifd = b16(entries) + e + b32(0)

    out = bytearray()
    out += (b"II" if bo == "little" else b"MM") + b16(42) + b32(ifd_at)
    out += ifd
    for o in strip_offsets:
        out += b32(o)
    for s in strips:
        out += b32(len(s))
    out += b16(8) + b16(8) + b16(8)
    for s in strips:
        out += s
    return bytes(out)


def decode_audio(payload: bytes) -> "object":
    """Decode an audio payload → (n_samples,) float64 waveform in [-1, 1).

    REAL decode paths, stdlib+numpy only, via a manual RIFF chunk walker:
    integer PCM (8/16/24/32-bit), IEEE float (32/64-bit), and the G.711
    telephony codecs µ-law / A-law (table decode built from the segment
    structure), including WAVE_FORMAT_EXTENSIBLE headers; multi-channel
    audio is downmixed by channel mean. Perceptual codecs (mp3/ogg/flac/…)
    need soundfile or librosa, which this container lacks — they gate
    behind NotImplementedError."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    raise NotImplementedError(
        "only WAV containers (PCM/float/G.711) decode natively; perceptual "
        "codecs require soundfile/librosa — install on the cluster image"
    )


def _g711_ulaw_table() -> "object":
    """All 256 µ-law codes → int16 linear (G.711 segment expansion)."""
    u = (~np.arange(256)) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _g711_alaw_table() -> "object":
    """All 256 A-law codes → int16 linear."""
    a = np.arange(256) ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


_ULAW_TABLE = _g711_ulaw_table()
_ALAW_TABLE = _g711_alaw_table()


def _wav_chunks(payload: bytes):
    """Yield (chunk_id, data) from a RIFF/WAVE stream (sizes pad to even)."""
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        yield cid, payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)


def _decode_wav(payload: bytes) -> "object":
    fmt = data = fact_len = None
    for cid, chunk in _wav_chunks(payload):
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        elif cid == b"fact" and len(chunk) >= 4:
            # compressed formats carry the true sample count here — the
            # only way to distinguish real samples from final-block padding
            fact_len = int.from_bytes(chunk[0:4], "little")
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real format in GUID
        if len(fmt) < 26:
            raise ValueError("extensible WAV missing subformat")
        audio_format = int.from_bytes(fmt[24:26], "little")
    if audio_format == 1:  # integer PCM
        if bits == 8:  # unsigned
            arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            arr = v.astype(np.float64) / 8388608.0
        elif bits == 32:
            arr = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"unsupported PCM sample width {bits // 8}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"unsupported float WAV width {bits}")
    elif audio_format == 0x11:  # IMA ADPCM
        if n_ch != 1:
            raise NotImplementedError("IMA ADPCM decodes mono natively")
        block_align = int.from_bytes(fmt[12:14], "little")
        vals = []
        for b0 in range(0, len(data), block_align):
            vals.extend(_ima_adpcm_decode_block(data[b0 : b0 + block_align]))
        if fact_len is not None:
            # drop decoded final-block zero padding (each pad nibble would
            # otherwise add step>>3 to the predictor — a spurious ramp)
            vals = vals[:fact_len]
        arr = np.array(vals, dtype=np.float64) / 32768.0
    elif audio_format == 6:  # G.711 A-law
        arr = _ALAW_TABLE[np.frombuffer(data, dtype=np.uint8)].astype(np.float64) / 32768.0
    elif audio_format == 7:  # G.711 µ-law
        arr = _ULAW_TABLE[np.frombuffer(data, dtype=np.uint8)].astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(
            f"WAV audio format {audio_format} not supported natively "
            "(PCM/IEEE-float/A-law/µ-law decode; perceptual codecs need "
            "soundfile)"
        )
    if n_ch > 1:
        arr = arr.reshape(-1, n_ch).mean(axis=1)
    return arr


_IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64
)
_IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)


def _ima_adpcm_decode_block(block: bytes) -> list:
    """One mono IMA ADPCM block: 4-byte header (int16 predictor, step
    index, reserved) then 4-bit nibbles, low nibble first."""
    pred = int.from_bytes(block[0:2], "little", signed=True)
    index = min(max(block[2], 0), 88)
    out = [pred]
    step = int(_IMA_STEP_TABLE[index])
    for byte in block[4:]:
        for nib in (byte & 0x0F, byte >> 4):
            diff = step >> 3
            if nib & 4:
                diff += step
            if nib & 2:
                diff += step >> 1
            if nib & 1:
                diff += step >> 2
            pred = pred - diff if nib & 8 else pred + diff
            pred = min(32767, max(-32768, pred))
            index = min(88, max(0, index + int(_IMA_INDEX_TABLE[nib])))
            step = int(_IMA_STEP_TABLE[index])
            out.append(pred)
    return out


def encode_ima_adpcm(samples, sample_rate: int = 8000,
                     block_align: int = 256) -> bytes:
    """int16 numpy samples → mono IMA ADPCM WAV (format 0x11).

    Standard greedy quantizer: each nibble encodes sign + the 3-bit
    magnitude that best approximates the prediction residual at the
    current step size; the decoder below is its exact inverse state
    machine, so roundtrips track the waveform within the adaptive step."""
    s = np.asarray(samples, dtype=np.int64)
    spb = (block_align - 4) * 2 + 1  # samples per block (mono)
    blocks = bytearray()
    n_blocks = 0
    index = 0  # the adapted step index CARRIES across blocks via the header
    for b0 in range(0, len(s), spb):
        chunk = s[b0 : b0 + spb]
        pred = int(chunk[0])  # block's first sample is stored verbatim
        blocks += int(pred).to_bytes(2, "little", signed=True)
        blocks += bytes([index, 0])
        step = int(_IMA_STEP_TABLE[index])
        nibs = []
        for v in chunk[1:]:
            delta = int(v) - pred
            nib = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            diff = step >> 3
            if nib & 4:
                diff += step
            if nib & 2:
                diff += step >> 1
            if nib & 1:
                diff += step >> 2
            pred = pred - diff if nib & 8 else pred + diff
            pred = min(32767, max(-32768, pred))
            index = min(88, max(0, index + int(_IMA_INDEX_TABLE[nib])))
            step = int(_IMA_STEP_TABLE[index])
            nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)
        for lo, hi in zip(nibs[0::2], nibs[1::2]):
            blocks.append(lo | (hi << 4))
        # pad the final block to block_align
        short = block_align - 4 - len(nibs) // 2
        blocks += b"\x00" * short
        n_blocks += 1
    fmt = (
        (0x11).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align // spb).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little")
        + spb.to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"fact" + (4).to_bytes(4, "little") + len(s).to_bytes(4, "little")
        + b"data" + len(blocks).to_bytes(4, "little") + bytes(blocks)
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def encode_g711(samples, law: str = "ulaw", sample_rate: int = 8000) -> bytes:
    """int16 numpy samples → mono G.711 WAV bytes (µ-law or A-law).

    Encoding is nearest-codeword quantization against the decode table —
    equivalent to the spec's segment quantizer up to ties, and it
    guarantees decode(encode(x)) is the closest representable level."""
    table = _ULAW_TABLE if law == "ulaw" else _ALAW_TABLE
    order = np.argsort(table, kind="stable")
    levels = table[order].astype(np.int64)
    s = np.asarray(samples, dtype=np.int64)
    idx = np.searchsorted(levels, s)
    idx = np.clip(idx, 1, len(levels) - 1)
    lo, hi = levels[idx - 1], levels[idx]
    pick = np.where((s - lo) <= (hi - s), idx - 1, idx)
    codes = order[pick].astype(np.uint8)
    fmt_code = 7 if law == "ulaw" else 6
    fmt = (
        fmt_code.to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + sample_rate.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(codes).to_bytes(4, "little") + codes.tobytes()
    )
    return b"RIFF" + (len(body)).to_bytes(4, "little") + body


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """int16 numpy samples → mono PCM WAV bytes (stdlib ``wave``).

    Sample width is fixed at 2 bytes: the frame payload below is always
    written as ``<i2``, so accepting any other width would produce a WAV
    whose header and payload disagree."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct to documents.

    Stands in for reading real image/audio bytes: payload = utf-8 bytes of
    the text. Schema shape is what a production multimodal table looks like:
    (id, payload binary, meta struct<mime,n_bytes,kind>).
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").alias("n_bytes"),
            (F.col("doc_id") % 3).cast("int").alias("kind"),
        ).alias("meta"),
    )


@register(
    "multimodal_meta_extract",
    """
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
           CAST(doc_id % 3 AS INT) AS kind
    FROM documents
    """,
    "multimodal",
)
def multimodal_meta_extract(spark, sf_dir):
    """mapInPandas 'decode' over a binary column: inspects raw bytes.

    The fake decode reads payload bytes (length + first byte) — exactly the
    shape a real feature extractor has, minus the codec.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    binary = with_binary_payload(d)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0]).astype("int32"),
                    "kind": pdf["kind"].astype("int32"),
                }
            )

    return binary.select("doc_id", "payload", F.col("meta.kind").alias("kind")).mapInPandas(
        extract, "doc_id bigint, byte_len bigint, first_byte int, kind int"
    )


@register(
    "multimodal_thumbnail",
    """
    SELECT doc_id, md5(substr(text, 1, 16)) AS thumb_sig,
           CAST(LEAST(strlen(text), 16) AS INT) AS thumb_bytes
    FROM documents
    """,
    "multimodal",
)
def multimodal_thumbnail(spark, sf_dir):
    """'Thumbnail' extraction shape: slice a fixed-size prefix from each
    binary payload inside mapInPandas (stand-in for a resize/crop codec) and
    emit a content signature + size. The corpus is ASCII so byte slicing
    equals char slicing and the md5 signature is oracle-checkable."""
    d = load(spark, sf_dir, "documents")["documents"]
    binary = with_binary_payload(d)

    def thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sliced = pdf["payload"].map(lambda b: bytes(b[:16]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb_sig": sliced.map(lambda b: hashlib.md5(b).hexdigest()),
                    "thumb_bytes": sliced.map(len).astype("int32"),
                }
            )

    return binary.select("doc_id", "payload").mapInPandas(
        thumb, "doc_id bigint, thumb_sig string, thumb_bytes int"
    )


@register(
    "multimodal_frame_sample",
    """
    WITH f AS (
        SELECT doc_id, n_chars,
               unnest(generate_series(0, CAST(floor(n_chars / 50) AS BIGINT), 2)) AS frame_id
        FROM documents)
    SELECT doc_id, frame_id,
           substr(md5(concat(CAST(doc_id AS VARCHAR), ':', CAST(frame_id AS VARCHAR))), 1, 8) AS feature
    FROM f
    """,
    "multimodal",
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling: explode every 2nd 'frame', extract a feature per frame
    via a deterministic fake decode (md5) inside mapInPandas."""
    d = load(spark, sf_dir, "documents")["documents"]
    frames = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.floor(F.col("n_chars") / 50), F.lit(2))
        ).alias("frame_id"),
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = pdf["doc_id"].astype(str) + ":" + pdf["frame_id"].astype(str)
            pdf = pdf.assign(
                feature=keys.map(lambda k: hashlib.md5(k.encode()).hexdigest()[:8])
            )
            yield pdf[["doc_id", "frame_id", "feature"]]

    return frames.mapInPandas(featurize, "doc_id bigint, frame_id bigint, feature string")


_IMG_W, _IMG_H = 16, 8  # 384 pixel bytes — spans the full 0..255 range


@register(
    "multimodal_image_decode_stats",
    f"""
    WITH px AS (
        SELECT doc_id, unnest(generate_series(0, {_IMG_W * _IMG_H * 3 - 1})) AS i
        FROM documents),
    v AS (
        SELECT doc_id, (doc_id + i) % 256 AS val, i % 3 AS ch FROM px)
    SELECT doc_id,
           {_IMG_W} AS width, {_IMG_H} AS height,
           AVG(CASE WHEN ch = 0 THEN val END) AS mean_r,
           AVG(CASE WHEN ch = 1 THEN val END) AS mean_g,
           AVG(CASE WHEN ch = 2 THEN val END) AS mean_b,
           CAST(MIN(val) AS INT) AS min_px, CAST(MAX(val) AS INT) AS max_px
    FROM v GROUP BY doc_id
    """,
    "multimodal",
)
def multimodal_image_decode_stats(spark, sf_dir):
    """REAL decode→feature pipeline, no codec libraries: synthesize a
    deterministic gradient image per document (pixel i = (doc_id+i) % 256),
    container-encode it — PPM / BMP (bottom-up BGR rows, 4-byte padding) /
    PNG (zlib-compressed, scanline filters cycling through all five PNG
    filter types) by doc_id % 3 — then ``decode_image`` parses the bytes
    back and per-channel statistics come off the decoded array. The oracle
    recomputes the stats from the closed-form pixel values, so a decoder
    bug (row order, BGR swap, padding, filter reconstruction) breaks the
    value hash.

    Channel means are k/128 (count per channel = 2^7), exactly
    representable as doubles, so Spark and DuckDB agree bit-for-bit with
    no rounding. Per-payload decode is an honest Python loop inside the
    Arrow batch — codecs are inherently per-file; the batch boundary is
    what keeps the pipeline vectorized end to end at scale.
    """
    # gate-spread before the Python codec (partitioning.spread): the
    # single-row-group source would pin the whole mapInPandas batch loop
    # to one core
    d = spread(
        spark,
        load(spark, sf_dir, "documents")["documents"].select("doc_id"),
        sf_dir,
        "documents",
        "doc_id",
    )
    npx = _IMG_W * _IMG_H * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.arange(npx, dtype=np.int64)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                arr = ((base + did) % 256).astype(np.uint8).reshape(
                    _IMG_H, _IMG_W, 3
                )
                payload = [encode_ppm, encode_bmp, encode_png][did % 3](arr)
                img = decode_image(payload)
                rows.append(
                    (
                        did,
                        img.shape[1],
                        img.shape[0],
                        img[:, :, 0].mean(),
                        img[:, :, 1].mean(),
                        img[:, :, 2].mean(),
                        int(img.min()),
                        int(img.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "mean_r", "mean_g",
                    "mean_b", "min_px", "max_px",
                ],
            )

    return d.mapInPandas(
        run,
        "doc_id bigint, width int, height int, mean_r double, "
        "mean_g double, mean_b double, min_px int, max_px int",
    )


def iter_ppm_frames(payload: bytes):
    """Split a stream of concatenated binary PPM (P6) images — the raw-frame
    'video container' used by ffmpeg's image2pipe — yielding one decoded
    (h, w, 3) array per frame. Each frame's byte length comes from its own
    header, so frames of different sizes interleave correctly."""
    pos = 0
    while pos < len(payload):
        if payload[pos : pos + 2] != b"P6":
            raise ValueError(f"not a PPM frame at offset {pos}")
        # parse the header exactly like _decode_ppm to find the pixel offset
        p, fields = pos + 2, []
        while len(fields) < 3:
            while payload[p : p + 1].isspace():
                p += 1
            if payload[p : p + 1] == b"#":
                p = payload.index(b"\n", p) + 1
                continue
            start = p
            while p < len(payload) and not payload[p : p + 1].isspace():
                p += 1
            fields.append(int(payload[start:p]))
        w, h, _ = fields
        end = p + 1 + h * w * 3
        yield _decode_ppm(payload[pos:end])
        pos = end


@register(
    "multimodal_image_resize_stats",
    f"""
    WITH px AS (
        SELECT doc_id, unnest(generate_series(0, {(_IMG_H // 2) * (_IMG_W // 2) * 3 - 1})) AS i
        FROM documents),
    v AS (
        SELECT doc_id, i % 3 AS ch,
               (doc_id + ((2 * (i // {(_IMG_W // 2) * 3}) * {_IMG_W}
                           + 2 * ((i % {(_IMG_W // 2) * 3}) // 3)) * 3 + i % 3)) % 256 AS val
        FROM px)
    SELECT doc_id, {_IMG_W // 2} AS width, {_IMG_H // 2} AS height,
           AVG(CASE WHEN ch = 0 THEN val END) AS mean_r,
           AVG(CASE WHEN ch = 1 THEN val END) AS mean_g,
           AVG(CASE WHEN ch = 2 THEN val END) AS mean_b
    FROM v GROUP BY doc_id
    """,
    "multimodal",
)
def multimodal_image_resize_stats(spark, sf_dir):
    """REAL image RESIZE pipeline: synthesize the same gradient image as
    `multimodal_image_decode_stats`, container-encode (PPM/BMP/PNG by
    doc_id % 3), decode, 2× nearest-neighbor downscale on the decoded
    array (out[r,c] = in[2r,2c] — the thumbnailing a multimodal ingest
    runs before feature extraction), and emit the resized per-channel
    means. The oracle recomputes them closed-form from the sampled pixel
    positions, so an off-by-one in the sampling grid (or any decoder bug
    upstream) breaks the value hash. Channel means are k/32 — exactly
    representable, bit-identical across engines."""
    # gate-spread before the Python codec (partitioning.spread): the
    # single-row-group source would pin the whole mapInPandas batch loop
    # to one core
    d = spread(
        spark,
        load(spark, sf_dir, "documents")["documents"].select("doc_id"),
        sf_dir,
        "documents",
        "doc_id",
    )
    npx = _IMG_W * _IMG_H * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.arange(npx, dtype=np.int64)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                arr = ((base + did) % 256).astype(np.uint8).reshape(
                    _IMG_H, _IMG_W, 3
                )
                payload = [encode_ppm, encode_bmp, encode_png][did % 3](arr)
                img = decode_image(payload)
                small = img[::2, ::2, :]
                rows.append(
                    (
                        did,
                        small.shape[1],
                        small.shape[0],
                        small[:, :, 0].mean(),
                        small[:, :, 1].mean(),
                        small[:, :, 2].mean(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return d.mapInPandas(
        run,
        "doc_id bigint, width int, height int, mean_r double, "
        "mean_g double, mean_b double",
    )


_VID_W, _VID_H, _VID_FRAMES = 8, 4, 4


@register(
    "multimodal_video_frame_stats",
    f"""
    WITH f AS (
        SELECT doc_id, unnest([0, 2]) AS frame_id FROM documents),
    px AS (
        SELECT doc_id, frame_id,
               unnest(generate_series(0, {_VID_W * _VID_H * 3 - 1})) AS i
        FROM f)
    SELECT doc_id, CAST(frame_id AS INT) AS frame_id,
           AVG((doc_id + frame_id * 31 + i) % 256) AS mean_px
    FROM px GROUP BY doc_id, frame_id
    """,
    "multimodal",
)
def multimodal_video_frame_stats(spark, sf_dir):
    """REAL video frame-sampling pipeline over a raw-frame container:
    each document carries a 4-frame 'clip' of concatenated binary PPMs
    (ffmpeg image2pipe layout; frame f pixel i = (doc_id + 31f + i) mod
    256), the decoder walks the stream header-by-header
    (`iter_ppm_frames`), samples every 2nd frame, and emits the decoded
    frame's pixel mean. Replaces nothing at scale: per-payload work stays
    inside the Arrow batch, exactly like a GPU-decode handoff would."""
    # gate-spread before the Python codec (partitioning.spread): the
    # single-row-group source would pin the whole mapInPandas batch loop
    # to one core
    d = spread(
        spark,
        load(spark, sf_dir, "documents")["documents"].select("doc_id"),
        sf_dir,
        "documents",
        "doc_id",
    )
    npx = _VID_W * _VID_H * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.arange(npx, dtype=np.int64)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                clip = b"".join(
                    encode_ppm(
                        ((base + did + 31 * f) % 256)
                        .astype(np.uint8)
                        .reshape(_VID_H, _VID_W, 3)
                    )
                    for f in range(_VID_FRAMES)
                )
                for fid, frame in enumerate(iter_ppm_frames(clip)):
                    if fid % 2:
                        continue
                    rows.append((did, fid, frame.astype(np.float64).mean()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_id", "mean_px"])

    return d.mapInPandas(run, "doc_id bigint, frame_id int, mean_px double")


_WAV_N, _WAV_FRAME = 400, 100  # 25 ms @ 16 kHz, 4 frames per clip


@register(
    "multimodal_audio_frame_rms",
    f"""
    WITH s AS (
        SELECT doc_id, i // {_WAV_FRAME} AS frame_id,
               (doc_id * 7919 + i * 104729) % 65536 - 32768 AS v
        FROM (SELECT doc_id, unnest(generate_series(0, {_WAV_N - 1})) AS i
              FROM documents))
    SELECT doc_id, CAST(frame_id AS INT) AS frame_id,
           CAST(SUM(v) AS DOUBLE) / {_WAV_FRAME * 32768}.0 AS mean_amp,
           sqrt(CAST(SUM(v * v) AS DOUBLE) / {_WAV_FRAME * 32768 * 32768}.0) AS rms
    FROM s GROUP BY doc_id, frame_id
    """,
    "multimodal",
)
def multimodal_audio_frame_rms(spark, sf_dir):
    """REAL audio decode→feature pipeline, stdlib only: synthesize a
    deterministic 16-bit PCM clip per document (sample_i =
    (doc_id·7919 + i·104729) mod 2^16 − 2^15), container-encode it as RIFF
    WAV, ``decode_audio`` parses it back via the stdlib ``wave`` module,
    and per-frame mean amplitude + RMS come off the waveform — the VAD /
    loudness-filter front door of an audio-corpus pipeline.

    Cross-engine determinism: per-frame sums are computed over EXACT
    integers (sample values and their squares stay below 2^37, far inside
    int64), so both engines do one identical double division (and one
    IEEE-exact sqrt) at the end — no float-summation-order divergence.
    """
    # gate-spread before the Python codec (partitioning.spread): the
    # single-row-group source would pin the whole mapInPandas batch loop
    # to one core
    d = spread(
        spark,
        load(spark, sf_dir, "documents")["documents"].select("doc_id"),
        sf_dir,
        "documents",
        "doc_id",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(_WAV_N, dtype=np.int64)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                samples = ((did * 7919 + idx * 104729) % 65536 - 32768).astype("<i2")
                wav = decode_audio(encode_wav(samples))
                ints = np.rint(wav * 32768.0).astype(np.int64).reshape(-1, _WAV_FRAME)
                for fid in range(ints.shape[0]):
                    fr = ints[fid]
                    rows.append(
                        (
                            did,
                            fid,
                            int(fr.sum()) / float(_WAV_FRAME * 32768),
                            float(
                                np.sqrt(
                                    int((fr * fr).sum())
                                    / float(_WAV_FRAME * 32768 * 32768)
                                )
                            ),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_id", "mean_amp", "rms"]
            )

    return d.mapInPandas(
        run, "doc_id bigint, frame_id int, mean_amp double, rms double"
    )


@register(
    "multimodal_dedup_payload",
    """
    SELECT fp, MIN(id) AS keeper, COUNT(*) AS n_copies,
           MIN(n_bytes) AS n_bytes
    FROM (
        SELECT doc_id AS id, md5(hex(encode(text))) AS fp,
               octet_length(encode(text)) AS n_bytes
        FROM documents) t
    GROUP BY fp
    HAVING COUNT(*) >= 1
    """,
    "multimodal",
    "bench",
)
def multimodal_dedup_payload(spark, sf_dir):
    """Exact media dedup on the raw BINARY payload — the first pass every
    multimodal pipeline runs before any decode: identical files (same
    bytes) collapse regardless of filename/metadata, at the cost of one
    shuffle on a 16-byte fingerprint. Content-defined near-dup (perceptual
    hashing) sits behind the decode stubs; byte-exact dedup needs no codec
    and catches the bulk of crawl duplicates.

    The fingerprint is md5(hex(payload)): DuckDB's md5 only accepts
    VARCHAR, and hex is a bit-exact, engine-neutral binary->text encoding
    (Spark's base64 is MIME-chunked with line breaks, DuckDB's isn't). At
    scale you'd use Spark's md5(binary) directly or xxhash64 — the text
    hop here is purely for oracle parity.
    """
    docs = load(spark, sf_dir, "documents")["documents"]
    media = with_binary_payload(docs)
    return (
        media.select(
            F.col("doc_id").alias("id"),
            F.md5(F.hex(F.col("payload"))).alias("fp"),
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("fp")
        .agg(
            F.min("id").alias("keeper"),
            F.count("*").alias("n_copies"),
            F.min("n_bytes").alias("n_bytes"),
        )
        .select("fp", "keeper", "n_copies", "n_bytes")
    )


@register(
    "multimodal_jpeg_roundtrip",
    f"""
    SELECT doc_id,
           {_IMG_W} AS width, {_IMG_H} AS height,
           CASE WHEN doc_id % 2 = 1 THEN 'jpeg_420' ELSE 'jpeg_444' END
               AS codec_mode,
           TRUE AS decode_ok
    FROM documents
    """,
    "multimodal",
)
def multimodal_jpeg_roundtrip(spark, sf_dir):
    """Baseline-JPEG codec drive (operators.jpeg — stdlib+numpy huffman/
    DCT, the last codec that was PIL-gated): per document, synthesize a
    deterministic image, encode at quality 100 and decode with our OWN
    decoder, then assert a measured reconstruction bound.

    JPEG is lossy, so unlike the lossless PPM/BMP/PNG stats query the
    oracle cannot predict exact pixels; instead the Spark side emits
    ``decode_ok = (max |err| <= bound)`` and the oracle expects TRUE. The
    bounds are measured-plus-margin (q100, 400-doc sweep): 4:4:4 gradient
    max err 2 → bound 3; 4:2:0 needs chroma-smooth input (the wrap-around
    gradient's 255→0 edge smears to err ~171 under 2×2 chroma averaging —
    honest lossy behavior), so odd doc_ids use solid colors, max err 1 →
    bound 2. Every third document adds restart markers with DRI interval 1
    — a 16x8 4:4:4 image has exactly 2 MCUs, so interval 1 is the only
    value that actually EMITS an RSTn between them (interval 2 would
    write a DRI segment but never fire), keeping the RSTn +
    DC-predictor-reset path covered. A decoder or encoder
    regression (huffman tables, zigzag, IDCT, upsampling, restart
    handling) flips decode_ok to FALSE and breaks the value hash.
    """
    from .jpeg import decode_jpeg, encode_jpeg

    # gate-spread before the Python codec (partitioning.spread): the
    # single-row-group source would pin the whole mapInPandas batch loop
    # to one core
    d = spread(
        spark,
        load(spark, sf_dir, "documents")["documents"].select("doc_id"),
        sf_dir,
        "documents",
        "doc_id",
    )
    npx = _IMG_W * _IMG_H * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.arange(npx, dtype=np.int64)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                did = int(did)
                subsample = did % 2 == 1
                if subsample:  # chroma-smooth input for 4:2:0
                    color = [(did * 3) % 256, (did * 7) % 256, (did * 11) % 256]
                    arr = np.full((_IMG_H, _IMG_W, 3), color, dtype=np.uint8)
                    bound = 2
                else:
                    arr = ((base + did) % 256).astype(np.uint8).reshape(
                        _IMG_H, _IMG_W, 3
                    )
                    bound = 3
                payload = encode_jpeg(
                    arr,
                    quality=100,
                    subsample=subsample,
                    restart_interval=1 if did % 3 == 0 else 0,
                )
                img = decode_image(payload)
                err = int(
                    np.abs(img.astype(np.int64) - arr.astype(np.int64)).max()
                )
                rows.append(
                    (
                        did,
                        img.shape[1],
                        img.shape[0],
                        "jpeg_420" if subsample else "jpeg_444",
                        err <= bound,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "codec_mode", "decode_ok"],
            )

    return d.mapInPandas(
        run,
        "doc_id bigint, width int, height int, codec_mode string, "
        "decode_ok boolean",
    )


@register(
    "multimodal_gif_roundtrip",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 1 THEN 'gif_interlaced' ELSE 'gif' END
               AS gif_mode,
           CAST(32 * (((doc_id + 0) % 256) + ((doc_id + 17) % 256)
                    + ((doc_id + 34) % 256) + ((doc_id + 51) % 256)) AS BIGINT) AS sum_r,
           CAST(32 * (((doc_id * 3 + 0) % 256) + ((doc_id * 3 + 29) % 256)
                    + ((doc_id * 3 + 58) % 256) + ((doc_id * 3 + 87) % 256)) AS BIGINT) AS sum_g,
           CAST(32 * (((doc_id * 7 + 0) % 256) + ((doc_id * 7 + 43) % 256)
                    + ((doc_id * 7 + 86) % 256) + ((doc_id * 7 + 129) % 256)) AS BIGINT) AS sum_b
    FROM documents
    """,
    "multimodal",
)
def multimodal_gif_roundtrip(spark, sf_dir):
    """GIF codec drive with an EXACT closed-form oracle: per document,
    synthesize a deterministic 4-color palette image whose color-index
    grid (r+c+doc_id) % 4 covers each palette entry exactly 32 times on
    the 8x16 canvas, encode with the pure-python LZW writer (odd doc_ids
    Adam-style 4-pass INTERLACED), decode with our own decoder, and emit
    per-channel pixel sums FROM THE DECODED ARRAY. GIF is lossless, so
    the oracle predicts the sums in closed form — any LZW/palette/
    interlace regression changes a sum and breaks the value hash
    (unlike the measured-bound JPEG query, this one is pixel-exact)."""
    # gate-spread before the Python codec (partitioning.spread): the
    # single-row-group source would pin the whole mapInPandas batch loop
    # to one core
    d = spread(
        spark,
        load(spark, sf_dir, "documents")["documents"].select("doc_id"),
        sf_dir,
        "documents",
        "doc_id",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rr, cc = np.mgrid[0:_IMG_H, 0:_IMG_W]
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                did = int(did)
                palette = np.array(
                    [
                        [
                            (did + j * 17) % 256,
                            (did * 3 + j * 29) % 256,
                            (did * 7 + j * 43) % 256,
                        ]
                        for j in range(4)
                    ],
                    dtype=np.uint8,
                )
                idx = (rr + cc + did) % 4
                arr = palette[idx]
                interlace = did % 2 == 1
                dec = decode_image(encode_gif(arr, interlace=interlace))
                sums = dec.astype(np.int64).sum(axis=(0, 1))
                rows.append(
                    (
                        did,
                        "gif_interlaced" if interlace else "gif",
                        int(sums[0]),
                        int(sums[1]),
                        int(sums[2]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "gif_mode", "sum_r", "sum_g", "sum_b"]
            )

    return d.mapInPandas(
        run,
        "doc_id bigint, gif_mode string, sum_r bigint, sum_g bigint, sum_b bigint",
    )


@register(
    "multimodal_tiff_roundtrip",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 1 THEN 'tiff_packbits'
                WHEN doc_id % 3 = 2 THEN 'tiff_lzw_pred'
                ELSE 'tiff' END AS tiff_mode,
           CAST(32 * (((doc_id + 0) % 256) + ((doc_id + 17) % 256)
                    + ((doc_id + 34) % 256) + ((doc_id + 51) % 256)) AS BIGINT) AS sum_r,
           CAST(32 * (((doc_id * 3 + 0) % 256) + ((doc_id * 3 + 29) % 256)
                    + ((doc_id * 3 + 58) % 256) + ((doc_id * 3 + 87) % 256)) AS BIGINT) AS sum_g,
           CAST(32 * (((doc_id * 7 + 0) % 256) + ((doc_id * 7 + 43) % 256)
                    + ((doc_id * 7 + 86) % 256) + ((doc_id * 7 + 129) % 256)) AS BIGINT) AS sum_b
    FROM documents
    """,
    "multimodal",
)
def multimodal_tiff_roundtrip(spark, sf_dir):
    """TIFF codec drive, pixel-exact (same closed-form oracle family as
    the GIF query — the 4-color pattern hits each palette entry exactly
    32 times): doc_id % 3 rotates plain / PackBits / LZW+horizontal-
    predictor strips, every second document writes big-endian (MM)
    headers, all decode through our own strip walker with the sums
    emitted from the DECODED array."""
    # gate-spread before the Python codec (partitioning.spread): the
    # single-row-group source would pin the whole mapInPandas batch loop
    # to one core
    d = spread(
        spark,
        load(spark, sf_dir, "documents")["documents"].select("doc_id"),
        sf_dir,
        "documents",
        "doc_id",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rr, cc = np.mgrid[0:_IMG_H, 0:_IMG_W]
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                did = int(did)
                palette = np.array(
                    [
                        [
                            (did + j * 17) % 256,
                            (did * 3 + j * 29) % 256,
                            (did * 7 + j * 43) % 256,
                        ]
                        for j in range(4)
                    ],
                    dtype=np.uint8,
                )
                arr = palette[(rr + cc + did) % 4]
                mode = ("tiff", "tiff_packbits", "tiff_lzw_pred")[did % 3]
                payload = encode_tiff(
                    arr,
                    packbits=mode == "tiff_packbits",
                    lzw=mode == "tiff_lzw_pred",
                    predictor=mode == "tiff_lzw_pred",
                    byte_order="big" if did % 2 == 0 else "little",
                )
                dec = decode_image(payload)
                sums = dec.astype(np.int64).sum(axis=(0, 1))
                rows.append(
                    (did, mode, int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "tiff_mode", "sum_r", "sum_g", "sum_b"]
            )

    return d.mapInPandas(
        run,
        "doc_id bigint, tiff_mode string, sum_r bigint, sum_g bigint, sum_b bigint",
    )


# ---------------------------------------------------------------------------
# Round 11 — energy-gated voice-activity detection (VAD) segments
# ---------------------------------------------------------------------------


@register(
    "multimodal_audio_vad",
    f"""
    WITH s AS (
        SELECT doc_id, i // {_WAV_FRAME} AS frame_id,
               (doc_id * 7919 + i * 104729) % 65536 - 32768 AS v
        FROM (SELECT doc_id, unnest(generate_series(0, {_WAV_N - 1})) AS i
              FROM documents)),
    f AS (
        SELECT doc_id, frame_id,
               SUM(v * v) * 3 > {_WAV_FRAME}::BIGINT * 32768 * 32768 AS active
        FROM s GROUP BY doc_id, frame_id),
    act AS (SELECT doc_id, frame_id FROM f WHERE active),
    isl AS (
        SELECT doc_id,
               frame_id - ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY frame_id) AS grp
        FROM act),
    seg AS (SELECT doc_id, grp, COUNT(*) AS run FROM isl GROUP BY doc_id, grp),
    per_doc AS (
        SELECT doc_id, CAST(SUM(run) AS INT) AS n_active_frames,
               CAST(COUNT(*) AS INT) AS n_segments,
               CAST(MAX(run) AS INT) AS max_run
        FROM seg GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(p.n_active_frames, 0) AS n_active_frames,
           COALESCE(p.n_segments, 0) AS n_segments,
           COALESCE(p.max_run, 0) AS max_run
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """,
    "multimodal",
)
def multimodal_audio_vad(spark, sf_dir):
    """Energy-based voice-activity detection over REAL decoded audio: per
    clip, each {_WAV_FRAME}-sample frame is active when its energy
    exceeds the expected full-scale-uniform energy (3*SUM(v^2) >
    F*32768^2 — an integer compare), and consecutive active frames merge
    into speech segments (gaps-and-islands). Per doc: active frame
    count, segment count, longest run — the speech-ratio / min-segment
    gate an audio-corpus curation pipeline applies before transcription.

    The Spark side is the REAL pipeline: deterministic PCM synthesis ->
    RIFF WAV container encode -> stdlib decode (decode_audio) -> frame
    energies -> row-local run-length fold, all inside one batched
    mapInPandas over the binary payloads (a clip's frames never leave
    the row, so there is NO shuffle at all — segment structure is local
    by definition). The oracle recomputes the same integers closed-form
    with SQL gaps-and-islands.

    Exactness: sample values and energies are exact int64 (samples <
    2^15, squares * {_WAV_FRAME} < 2^37); the decode round-trip is
    bit-faithful (rint of the wave module's scaled floats, the
    audio_frame_rms contract), so the active flags and run lengths are
    integer-identical cross-engine."""
    # gate-spread before the Python codec (partitioning.spread): the
    # single-row-group source would pin the whole mapInPandas batch loop
    # to one core
    d = spread(
        spark,
        load(spark, sf_dir, "documents")["documents"].select("doc_id"),
        sf_dir,
        "documents",
        "doc_id",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(_WAV_N, dtype=np.int64)
        thresh = _WAV_FRAME * 32768 * 32768
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                samples = ((did * 7919 + idx * 104729) % 65536 - 32768).astype(
                    "<i2"
                )
                wav = decode_audio(encode_wav(samples))
                ints = (
                    np.rint(wav * 32768.0)
                    .astype(np.int64)
                    .reshape(-1, _WAV_FRAME)
                )
                active = (ints * ints).sum(axis=1) * 3 > thresh
                n_active = int(active.sum())
                runs = []
                cur = 0
                for a in active:
                    if a:
                        cur += 1
                    elif cur:
                        runs.append(cur)
                        cur = 0
                if cur:
                    runs.append(cur)
                rows.append(
                    (
                        int(did),
                        n_active,
                        len(runs),
                        max(runs) if runs else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_active_frames", "n_segments", "max_run"],
            )

    return d.mapInPandas(
        run,
        "doc_id long, n_active_frames int, n_segments int, max_run int",
    )


# ---------------------------------------------------------------------------
# Round 14 — perceptual (near-dup) image dedup: dHash + banded LSH
# ---------------------------------------------------------------------------

_PH_SEL_MOD = 8  # every 8th document carries a synthesized image pair
_PH_CELL = 8  # dHash cell = one 8x8 JPEG MCU (flat per block -> DC-only)
_PH_COLS, _PH_ROWS = 9, 8  # 9x8 cell grid -> 8 comparisons x 8 rows = 64 bits
_PH_STEP = 12  # brightness step per bit; JPEG q90 flat-cell err <= 1
_PH_BANDS, _PH_BAND_BITS = 4, 16
_PH_MAX_HAMMING = 2  # banded candidates are COMPLETE for d <= bands-1 = 3


def _splitmix64(x: "np.ndarray") -> "np.ndarray":
    """SplitMix64 mix (public domain, Steele et al. 2014) — the per-doc
    64-bit pattern seed. Exact uint64 arithmetic, identical across hosts."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


# Per-modality codeword salts: image and audio twins of one document must
# NOT share a failure mode, so each modality mixes a different stream.
# The cross-doc min-banded-distance proof in
# tests/test_round14_properties.py runs PER SALT.
_PH_SALT_IMAGE = 0
_PH_SALT_AUDIO = 0x5A1DAD10


def _codeword64(doc_id: int, salt: int) -> int:
    """The 64 target bits a synthesized medium encodes for one document."""
    return int(
        _splitmix64(np.array([doc_id ^ salt], dtype=np.uint64))[0]
    )


def _banded_neardup_pairs(media):
    """The shared LSH tail of every perceptual near-dup sweep: band the
    64-bit hash into _PH_BANDS x _PH_BAND_BITS keys, equi-join candidates
    (banding is COMPLETE for Hamming d <= _PH_BANDS-1 by pigeonhole),
    verify bit_count(xor) <= _PH_MAX_HAMMING JVM-side. ``media`` must be
    (media_id bigint, phash bigint) and is persisted+MATERIALIZED here so
    the self-join's two sides read one cache, not two codec pipelines."""
    from ..caching import scope_caches

    media = media.persist()
    media.count()
    bands = media.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"CAST((phash >> {16 * k}) & 65535 AS INT)")
                    for k in range(_PH_BANDS)
                ]
            )
        ).alias("band", "val"),
    )
    a = bands.select(
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("ph_a"),
        "band",
        "val",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("ph_b"),
        "band",
        "val",
    )
    cand = (
        a.join(b, ["band", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
    )
    out = cand.select(
        "id_a",
        "id_b",
        F.expr("CAST(bit_count(ph_a ^ ph_b) AS BIGINT)").alias("hamming"),
    ).where(F.col("hamming") <= _PH_MAX_HAMMING)
    return scope_caches(out, media)


def phash_image(doc_id: int) -> "np.ndarray":
    """Deterministic dHash test image for one document: a 72x64 grayscale
    grid of flat 8x8 cells whose row-wise brightness walk (+/-_PH_STEP)
    encodes bit k of splitmix64(doc_id) as the sign of the step between
    cells k%8 and k%8+1 of row k//8. Flat MCU-aligned cells mean a JPEG
    re-encode at any sane quality only moves the quantized DC (measured
    max |err| = 1 at q85/q90), a 64x smaller perturbation than the
    12-level step — so the dHash survives re-encoding bit-for-bit."""
    bits = _codeword64(doc_id, _PH_SALT_IMAGE)
    cells = np.empty((_PH_ROWS, _PH_COLS), dtype=np.int64)
    for r in range(_PH_ROWS):
        v = 128
        cells[r, 0] = v
        for c in range(_PH_COLS - 1):
            t = (bits >> (r * 8 + c)) & 1
            v = v - _PH_STEP if t else v + _PH_STEP
            cells[r, c + 1] = v
    gray = np.repeat(
        np.repeat(cells.astype(np.uint8), _PH_CELL, axis=0), _PH_CELL, axis=1
    )
    return np.stack([gray] * 3, axis=-1)


def dhash64(img: "np.ndarray") -> int:
    """Row-wise difference hash over the cell grid, EXACT integer
    arithmetic end to end: cell value = int64 sum of the 8x8 green-channel
    block (no float mean), bit k set iff cell[k//8][k%8] > cell[k//8][k%8+1].
    Returns the 64-bit hash as a SIGNED int64 (Spark BIGINT twin)."""
    g = img[:, :, 1].astype(np.int64)
    h, w = g.shape
    cs = g.reshape(h // _PH_CELL, _PH_CELL, w // _PH_CELL, _PH_CELL).sum(
        axis=(1, 3)
    )
    out = 0
    for r in range(_PH_ROWS):
        for c in range(_PH_COLS - 1):
            if cs[r, c] > cs[r, c + 1]:
                out |= 1 << (r * 8 + c)
    return int(np.uint64(out).astype(np.int64))


@register(
    "multimodal_phash_neardup",
    f"""
    SELECT CAST(doc_id * 2 AS BIGINT) AS id_a,
           CAST(doc_id * 2 + 1 AS BIGINT) AS id_b,
           CAST(0 AS BIGINT) AS hamming
    FROM documents
    WHERE doc_id % {_PH_SEL_MOD} = 0
    """,
    "multimodal",
)
def multimodal_phash_neardup(spark, sf_dir):
    """Perceptual image near-dup (r13 verdict item #2): the image analog
    of the text near-dup suite. Every selected document synthesizes one
    image and stores it TWICE — losslessly (BMP; the PNG path is already
    exercised by the decode-stats/roundtrip batteries and its Paeth
    unfilter is the costliest decoder) and lossily re-encoded (our own
    baseline JPEG at quality 90). The two payloads are
    byte-different (md5 dedup misses them — pinned by the pytest
    witness), but both decode to perceptually-identical pixels, so their
    64-bit dHashes are EQUAL and the pair comes out of the LSH sweep at
    Hamming distance 0.

    Scale shape (the dedup_simhash convention): hashes band into
    {_PH_BANDS} x {_PH_BAND_BITS}-bit keys; candidates are the band-equal
    equi-join pairs (never all-pairs — plan-gated: banded hash keys, no
    CartesianProduct); verification is bit_count(xor) <= {_PH_MAX_HAMMING}
    JVM-side. Banding is COMPLETE for d <= {_PH_BANDS - 1} (pigeonhole),
    so threshold {_PH_MAX_HAMMING} has exact recall. The oracle is exact
    because the corpus is engineered: twin hashes match bit-for-bit
    (flat MCU-aligned cells, step 12 vs measured q90 error 1), and
    cross-doc false positives cannot exist — the offline sweep over every
    selected doc_id < 2,000,000 measured min banded pairwise distance 8
    (pytest re-verifies the committed SF ranges).

    100 TB posture: image synthesis + decode + hash are row-local in one
    mapInPandas (payloads never cross a shuffle); the only exchanges are
    the band-key candidate join and the final pair distinct. Decode goes
    through the REAL native codecs both ways — a PNG filter or JPEG
    DC-quantization regression flips hashes and breaks the value hash.
    """
    docs = (
        load(spark, sf_dir, "documents")["documents"]
        .select("doc_id")
        .where(F.col("doc_id") % _PH_SEL_MOD == 0)
        # codec work is ~8 ms/doc but the doc_id frame comes off a single
        # small parquet split — fan the rows across every core before the
        # mapInPandas (the augmented_documents gate-repartition pattern)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    from .jpeg import encode_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                did = int(did)
                arr = phash_image(did)
                for off, payload in (
                    (0, encode_bmp(arr)),
                    (1, encode_jpeg(arr, quality=90, subsample=False)),
                ):
                    img = decode_image(payload)
                    rows.append((did * 2 + off, dhash64(img)))
            yield pd.DataFrame(rows, columns=["media_id", "phash"])

    media = docs.mapInPandas(gen, "media_id bigint, phash bigint")
    return _banded_neardup_pairs(media)


# ---------------------------------------------------------------------------
# Round 14 — perceptual audio near-dup: energy fingerprint + banded LSH
# ---------------------------------------------------------------------------

_AF_FRAME = 64  # samples per analysis frame
_AF_GROUPS, _AF_PER = 8, 9  # 8 groups x 9 frames -> 8x8 = 64 comparisons
# amplitude level table: 1.3x gaps dwarf the worst G.711 quantization
# error (<= ~4% relative at the smallest level), and the top level stays
# inside int16
_AF_LEVELS = [int(round(400 * 1.3**j)) for j in range(17)]


def afp_samples(doc_id: int) -> "np.ndarray":
    """Deterministic fingerprint test signal for one document: 72 frames
    of a +/-A square wave whose amplitude walks the _AF_LEVELS ladder one
    step per bit of the audio codeword (up for 0, down for 1) — the audio
    twin of phash_image's brightness walk. Constant |sample| per frame
    means G.711 quantizes every sample of a frame to the SAME level, so
    the re-encoded frame energy moves by < 4% while adjacent-frame gaps
    are 30%."""
    bits = _codeword64(doc_id, _PH_SALT_AUDIO)
    amps = np.empty(_AF_GROUPS * _AF_PER, dtype=np.int64)
    for g in range(_AF_GROUPS):
        j = 8
        amps[g * _AF_PER] = _AF_LEVELS[j]
        for c in range(_AF_PER - 1):
            t = (bits >> (g * 8 + c)) & 1
            j = j - 1 if t else j + 1
            amps[g * _AF_PER + c + 1] = _AF_LEVELS[j]
    sign = np.where(np.arange(_AF_FRAME) % 2 == 0, 1, -1).astype(np.int64)
    return (amps[:, None] * sign[None, :]).reshape(-1).astype(np.int16)


def afp64(wave: "np.ndarray") -> int:
    """Exact-integer energy-profile fingerprint: per-frame energy is the
    int64 sum of |round(sample * 32768)| (decode_audio emits int16/32768
    floats, so the rounding recovers the exact PCM levels); bit k set iff
    E[k//8*9 + k%8] > E[.. + k%8 + 1]. Signed int64 result (Spark BIGINT
    twin)."""
    q = np.abs(np.rint(np.asarray(wave) * 32768.0).astype(np.int64))
    e = q[: _AF_GROUPS * _AF_PER * _AF_FRAME].reshape(-1, _AF_FRAME).sum(axis=1)
    out = 0
    for g in range(_AF_GROUPS):
        for c in range(_AF_PER - 1):
            if e[g * _AF_PER + c] > e[g * _AF_PER + c + 1]:
                out |= 1 << (g * 8 + c)
    return int(np.uint64(out).astype(np.int64))


@register(
    "multimodal_audio_fingerprint_neardup",
    f"""
    SELECT CAST(doc_id * 2 AS BIGINT) AS id_a,
           CAST(doc_id * 2 + 1 AS BIGINT) AS id_b,
           CAST(0 AS BIGINT) AS hamming
    FROM documents
    WHERE doc_id % {_PH_SEL_MOD} = 0
    """,
    "multimodal",
)
def multimodal_audio_fingerprint_neardup(spark, sf_dir):
    """Perceptual AUDIO near-dup — the audio sibling of
    `multimodal_phash_neardup`, closing the same gap for the WAV corpus:
    every selected document synthesizes one signal and stores it twice,
    losslessly (16-bit PCM) and lossily re-encoded through the G.711
    µ-law telephony codec (8-bit logarithmic — byte-different payload,
    md5 dedup misses it; pinned by the pytest witness alongside A-law
    and IMA ADPCM as harsher re-encodes). Both decode through the native
    RIFF walker and fingerprint to the SAME 64 bits: frame-energy deltas
    of 30% dwarf µ-law's <= ~4% quantization error by construction.

    The codeword mixes a DIFFERENT salt than the image operator
    (`_PH_SALT_AUDIO`), so the two modalities cannot share a silent
    failure mode; the cross-doc min-banded-distance proof runs per salt
    in tests/test_round14_properties.py. LSH tail (banding, candidate
    equi-join, bit_count verify, cache discipline, plan gates) is the
    shared `_banded_neardup_pairs` — identical 100 TB posture: payloads
    never cross a shuffle, candidates never all-pairs.
    """
    docs = (
        load(spark, sf_dir, "documents")["documents"]
        .select("doc_id")
        .where(F.col("doc_id") % _PH_SEL_MOD == 0)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                did = int(did)
                pcm = afp_samples(did)
                for off, payload in (
                    (0, encode_wav(pcm)),
                    (1, encode_g711(pcm, law="ulaw")),
                ):
                    rows.append((did * 2 + off, afp64(decode_audio(payload))))
            yield pd.DataFrame(rows, columns=["media_id", "phash"])

    media = docs.mapInPandas(gen, "media_id bigint, phash bigint")
    return _banded_neardup_pairs(media)
