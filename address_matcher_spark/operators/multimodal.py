"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decode/feature-extract as Arrow-batched UDFs.

Decode support (zero external deps — stdlib struct/zlib + numpy only):
  real   BMP (24bpp uncompressed), PNG (8-bit gray/RGB/RGBA,
         non-interlaced: zlib inflate + sub/up/average/paeth unfilter),
         JPEG (baseline sequential SOF0 AND progressive SOF2 — multi-scan
         spectral selection + successive approximation with DC/AC
         refinement and EOB runs, luma plane), GIF (87a/89a LZW +
         palette, incl. interlace; first frame), WAV (PCM 8/16-bit),
         FLAC (frame parse, constant/verbatim/fixed/LPC subframes, rice
         residuals, stereo decorrelation, CRC-8/16 verified),
         AVI first frames when the stream is MJPEG (plain baseline
         JPEGs) or uncompressed BI_RGB (raw DIB pixel arrays, 8/24/32bpp
         via the strf BITMAPINFOHEADER); container metadata always real
  stub   compressed video codecs (h264/cinepak/...) and JPEG arithmetic
         coding — their codecs don't ship in this container, and the
         T.81 QM-coder's normative 113-state Qe table cannot be
         conformance-verified offline (a self-consistent reimplementation
         would pass its own encoder/decoder tests even if wrong, which
         is worse than a declared stub).  These fall back to
         ``_decode_stub`` (deterministic fake derived from the payload
         bytes, clearly marked) — the Spark-side plumbing (schema,
         mapInPandas batching, feature shapes) is identical either way;
         swapping the stub for PIL/ffmpeg is a one-function change.

Features: images → 8×8 block-mean grayscale (64-dim, the classic aHash
grid); audio → [rms, zero-crossing-rate, mean, peak] + 4 coarse envelope
bins (8-dim).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "id long, n_bytes int, magic string, media_type string"
)
FEATURE_SCHEMA = (
    "id long, media_type string, width int, height int, decoded boolean, "
    "feature array<float>"
)

_MAGIC = {
    "89504e47": "image/png",
    "ffd8ffe0": "image/jpeg",
    "ffd8ffe1": "image/jpeg",
    "47494638": "image/gif",
    "424d": "image/bmp",
    "664c6143": "audio/flac",
}


def media_metadata(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Typed metadata from the binary column — native expressions only
    (magic-byte sniff via hex prefix; RIFF containers disambiguated by the
    format tag at offset 9)."""
    magic = F.lower(F.hex(F.substring(F.col(bin_col), 1, 4)))
    riff_kind = F.lower(F.hex(F.substring(F.col(bin_col), 9, 4)))
    mt = F.lit("application/octet-stream")
    for sig, typ in _MAGIC.items():
        if len(sig) == 8:
            mt = F.when(magic == sig, F.lit(typ)).otherwise(mt)
        else:
            mt = F.when(F.substring(magic, 1, len(sig)) == sig, F.lit(typ)).otherwise(mt)
    mt = F.when(
        (magic == "52494646") & (riff_kind == "57415645"), F.lit("audio/wav")
    ).when(
        (magic == "52494646") & (riff_kind == "41564920"), F.lit("video/avi")
    ).otherwise(mt)
    return df.select(
        F.col(id_col).alias("id"),
        F.length(F.col(bin_col)).alias("n_bytes"),
        magic.alias("magic"),
        mt.alias("media_type"),
    )


# ---------------------------------------------------------------------------
# real decoders (uncompressed/stdlib-inflatable formats)
# ---------------------------------------------------------------------------


def _decode_bmp(b: bytes) -> np.ndarray:
    """24bpp BI_RGB BMP → grayscale float array [h, w]."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    px = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
    px = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3).astype(np.float64)
    if flip:
        px = px[::-1]
    # BGR order in BMP
    return 0.114 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.299 * px[:, :, 2]


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4) — the spec's recon pass."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = raw[pos + 1: pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # up
            rec = (line + prev) & 0xFF
        else:
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                bup = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:      # sub
                    pred = a
                elif ftype == 3:    # average
                    pred = (a + bup) // 2
                elif ftype == 4:    # paeth
                    p = a + bup - c
                    pa, pb, pc = abs(p - a), abs(p - bup), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (bup if pb <= pc else c)
                else:
                    raise NotImplementedError(f"PNG filter {ftype}")
                rec[x] = (line[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
    return out


def _decode_png(b: bytes) -> np.ndarray:
    """8-bit non-interlaced gray/RGB/RGBA PNG → grayscale float [h, w]."""
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, meta = 8, b"", None
    while pos < len(b):
        ln, typ = struct.unpack_from(">I4s", b, pos)
        body = b[pos + 8: pos + 8 + ln]
        if typ == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    w, h, depth, ctype, _, _, interlace = meta
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 6):
        raise NotImplementedError(f"PNG depth={depth} ctype={ctype} interlace={interlace}")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    px = _png_unfilter(raw, h, w * ch, ch).reshape(h, w, ch).astype(np.float64)
    if ch == 1:
        return px[:, :, 0]
    return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]


# --- GIF (pure python LZW + palette) ---------------------------------------


def _gif_lzw(data: bytes, min_code: int, npix: int) -> list[int]:
    """GIF LZW decompression (variable code width, LSB-first packing)."""
    clear = 1 << min_code
    end = clear + 1
    out: list[int] = []
    table: list[list[int] | None] = []
    cs = min_code + 1
    next_code = end + 1

    def reset():
        nonlocal table, cs, next_code
        table = [[i] for i in range(clear)] + [None, None]
        cs = min_code + 1
        next_code = end + 1

    reset()
    acc = 0
    nbits = 0
    pos = 0
    prev: list[int] | None = None
    while len(out) < npix:
        while nbits < cs and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < cs:
            break
        code = acc & ((1 << cs) - 1)
        acc >>= cs
        nbits -= cs
        if code == clear:
            reset()
            prev = None
            continue
        if code == end:
            break
        if code < next_code and table[code] is not None:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + [prev[0]]
        else:
            raise ValueError("bad GIF LZW code")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table.append(prev + [entry[0]])
            next_code += 1
            if next_code == (1 << cs) and cs < 12:
                cs += 1
        prev = entry
    return out[:npix]


def _decode_gif(b: bytes) -> np.ndarray:
    """GIF87a/89a first frame → grayscale float array [h, w]: logical
    screen parse, global/local color table, LZW decompress, optional
    de-interlace, palette → luma.  Animated files yield frame 1."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", b, pos + 1)
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image without color table")
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                data += b[pos + 1: pos + 1 + ln]
                pos += 1 + ln
            idx = np.array(_gif_lzw(bytes(data), min_code, w * h),
                           dtype=np.int64)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data truncated")
            img = idx.reshape(h, w)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                rows = (list(range(0, h, 8)) + list(range(4, h, 8))
                        + list(range(2, h, 4)) + list(range(1, h, 2)))
                deinter = np.empty_like(img)
                deinter[rows] = img
                img = deinter
            rgb = ct[np.clip(img, 0, len(ct) - 1)].astype(np.float64)
            return (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
                    + 0.114 * rgb[:, :, 2])
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image")


# --- baseline JPEG (pure numpy: huffman entropy decode + 8x8 IDCT) --------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis; IDCT(block) = A.T @ block @ A
_DCT_A = np.array([
    [np.cos((2 * x + 1) * u * np.pi / 16) * (np.sqrt(0.125) if u == 0
     else 0.5) for x in range(8)] for u in range(8)
])


class _BitReader:
    """MSB-first bit reader over the destuffed entropy-coded segment."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("JPEG bitstream exhausted")
        v = 0
        for bit in self.bits[self.pos: self.pos + n]:
            v = (v << 1) | int(bit)
        self.pos += n
        return v


def _huff_table(bits_counts: list[int], values: bytes) -> dict:
    """Canonical JPEG huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits_counts[ln - 1]):
            table[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, s: int) -> int:
    """JPEG F.2.2.1 sign extension of an s-bit magnitude."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline sequential JPEG (SOF0) → grayscale float array [h, w].

    Pure numpy/stdlib: marker parse → canonical huffman entropy decode
    (every component's coefficients are decoded to keep the bitstream in
    sync) → dequantize → inverse zigzag → orthonormal 8×8 IDCT → level
    shift.  Only the Y (luma) plane is reconstructed — the feature path is
    grayscale.  Any sampling factors are accepted for the chroma planes
    since their blocks are discarded.  Progressive (SOF2), arithmetic
    coding, DRI/restart markers and 12-bit precision raise
    NotImplementedError and fall back to the declared stub."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None            # (h, w, [(cid, hs, vs, tq), ...])
    scan_comps = None       # [(cid, td, ta), ...]
    scan_data = None
    scan_segments: list[bytes] = []   # entropy data split at RSTn markers
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", b, pos + 2)[0]
        body = b[pos + 4: pos + 2 + ln]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 15
                if pq != 0:
                    raise NotImplementedError("12-bit JPEG quant table")
                qt[tq] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=off + 1
                ).astype(np.float64)
                off += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline / ext. sequential)
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("JPEG precision != 8")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:  # SOF2 progressive — dedicated multi-scan path
            return _decode_jpeg_progressive(b)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG (lossless/arith)")
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 15
                counts = list(body[off + 1: off + 17])
                nvals = sum(counts)
                vals = body[off + 17: off + 17 + nvals]
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_table(counts, vals)
                off += 17 + nvals
        elif marker == 0xDD:  # DRI — restart interval in MCUs
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tdta = struct.unpack_from("BB", body, 1 + 2 * c)
                scan_comps.append((cid, tdta >> 4, tdta & 15))
            # entropy-coded data: strip 0xFF00 stuffing; RSTn markers
            # split the data into independently byte-aligned segments
            # (DC predictors reset at each); stop at any other marker
            raw = bytearray()
            p = pos + 2 + ln
            while p < len(b) - 1:
                byte = b[p]
                if byte == 0xFF:
                    nxt = b[p + 1]
                    if nxt == 0x00:
                        raw.append(0xFF)
                        p += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        scan_segments.append(bytes(raw))
                        raw = bytearray()
                        p += 2
                        continue
                    break  # real marker (EOI or otherwise)
                raw.append(byte)
                p += 1
            scan_segments.append(bytes(raw))
            scan_data = True
            break
        pos += 2 + ln
    if frame is None or scan_data is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    y_cid = comps[0][0]  # first component is luma (or the only one)
    y_hs, y_vs = comps[0][1], comps[0][2]
    y_plane = np.zeros((mcus_y * y_vs * 8, mcus_x * y_hs * 8))
    reader = _BitReader(scan_segments[0])
    seg_idx = 0
    mcu_n = 0
    pred = {cid: 0 for cid, _, _, _ in comps}
    scan_map = {cid: (td, ta) for cid, td, ta in scan_comps}
    comp_info = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                # RSTn boundary: next byte-aligned segment, DC preds reset
                seg_idx += 1
                if seg_idx >= len(scan_segments):
                    raise ValueError("JPEG missing restart segment")
                reader = _BitReader(scan_segments[seg_idx])
                pred = {cid: 0 for cid, _, _, _ in comps}
            mcu_n += 1
            for cid, _, _ in scan_comps:
                hs, vs, tq = comp_info[cid]
                td, ta = scan_map[cid]
                for vy in range(vs):
                    for vx in range(hs):
                        zz = np.zeros(64)
                        s = _huff_decode(reader, huff_dc[td])
                        diff = _extend(reader.read(s), s) if s else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff_ac[ta])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 15
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            zz[k] = _extend(reader.read(size), size)
                            k += 1
                        if cid != y_cid:
                            continue  # chroma decoded for sync, discarded
                        block = np.zeros(64)
                        block[_ZIGZAG] = zz * qt[tq]
                        px = _DCT_A.T @ block.reshape(8, 8) @ _DCT_A
                        by = (my * y_vs + vy) * 8
                        bx = (mx * y_hs + vx) * 8
                        y_plane[by: by + 8, bx: bx + 8] = px + 128.0
    return np.clip(y_plane[:h, :w], 0.0, 255.0)


def _decode_jpeg_progressive(b: bytes) -> np.ndarray:
    """Progressive JPEG (SOF2) → grayscale float array [h, w].

    Multi-scan coefficient accumulation per JPEG Annex G: DC first
    (point-transformed diffs) and DC refinement (one bit/block), AC
    first with EOB runs, AC refinement with correction bits (the
    libjpeg-style zero-history run walk).  Only the Y component's
    coefficients are retained; AC scans are non-interleaved by spec, so
    chroma AC scans are SKIPPED wholesale (each scan is a self-contained
    entropy segment) — chroma DC is entropy-decoded only where a DC scan
    interleaves it with Y, to keep the bitstream in sync.  Arithmetic
    coding raises NotImplementedError (declared fallback to the stub).
    DRI/RSTn restarts split each scan into byte-aligned segments — DC
    predictors and EOB runs reset at every boundary; the restart
    interval counts MCUs, and in a non-interleaved scan one MCU is one
    block (B.2.1.2)."""
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    ycoef = None  # int64 [grid_by, grid_bx, 64] zigzag-order coefficients

    def scan_segments(start: int) -> tuple[list[bytes], int]:
        """Entropy data split at RSTn markers (stuffing stripped), like
        the baseline path; stops at the next real marker."""
        segs: list[bytes] = []
        raw = bytearray()
        p = start
        while p < len(b) - 1:
            byte = b[p]
            if byte == 0xFF:
                nxt = b[p + 1]
                if nxt == 0x00:
                    raw.append(0xFF)
                    p += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    segs.append(bytes(raw))
                    raw = bytearray()
                    p += 2
                    continue
                break
            raw.append(byte)
            p += 1
        segs.append(bytes(raw))
        return segs, p

    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", b, pos + 2)[0]
        body = b[pos + 4: pos + 2 + ln]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 15
                if pq != 0:
                    raise NotImplementedError("12-bit JPEG quant table")
                qt[tq] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=off + 1
                ).astype(np.float64)
                off += 65
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 15
                counts = list(body[off + 1: off + 17])
                nvals = sum(counts)
                vals = body[off + 17: off + 17 + nvals]
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_table(counts, vals)
                off += 17 + nvals
        elif marker == 0xC2:  # SOF2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("JPEG precision != 8")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq))
            max_h = max(c[1] for c in comps)
            max_v = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * max_h))
            mcus_y = -(-h // (8 * max_v))
            frame = (h, w, comps, max_h, max_v, mcus_x, mcus_y)
            y_hs, y_vs = comps[0][1], comps[0][2]
            ycoef = np.zeros((mcus_y * y_vs, mcus_x * y_hs, 64), dtype=np.int64)
        elif marker == 0xDD:  # DRI — restart interval in MCUs
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — one progressive scan
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            h, w, comps, max_h, max_v, mcus_x, mcus_y = frame
            y_cid = comps[0][0]
            comp_info = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
            ns = body[0]
            scomps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 15)
                for i in range(ns)
            ]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            segs, pos = scan_segments(pos + 2 + ln)
            if y_cid not in [c[0] for c in scomps]:
                continue  # chroma-only scan: self-contained, skip wholly
            seg_idx = 0

            def next_segment() -> "_BitReader":
                nonlocal seg_idx
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                return _BitReader(segs[seg_idx])

            def nblocks(cid: int) -> tuple[int, int]:
                hs, vs, _tq = comp_info[cid]
                cw = -(-w * hs // max_h)
                ch = -(-h * vs // max_v)
                return -(-ch // 8), -(-cw // 8)

            reader = _BitReader(segs[0])
            if ss == 0:  # DC scan (interleaved when ns > 1)
                pred = {cid: 0 for cid, _td, _ta in scomps}
                # order grouped per MCU: the restart interval counts MCUs
                if ns > 1:
                    mcu_order = []
                    for my in range(mcus_y):
                        for mx in range(mcus_x):
                            units = []
                            for cid, td, _ta in scomps:
                                hs, vs, _tq = comp_info[cid]
                                for vy in range(vs):
                                    for vx in range(hs):
                                        units.append(
                                            (cid, td, my * vs + vy, mx * hs + vx)
                                        )
                            mcu_order.append(units)
                else:
                    cid, td, _ta = scomps[0]
                    nby, nbx = nblocks(cid)
                    mcu_order = [
                        [(cid, td, r, c)]
                        for r in range(nby) for c in range(nbx)
                    ]
                for mcu_n, units in enumerate(mcu_order):
                    if restart_interval and mcu_n and (
                        mcu_n % restart_interval == 0
                    ):
                        # RSTn boundary: byte-aligned segment, preds reset
                        reader = next_segment()
                        pred = {cid: 0 for cid, _td, _ta in scomps}
                    for cid, td, by, bx in units:
                        if ah == 0:
                            s = _huff_decode(reader, huff_dc[td])
                            diff = _extend(reader.read(s), s) if s else 0
                            pred[cid] += diff
                            if cid == y_cid:
                                ycoef[by, bx, 0] = pred[cid] << al
                        else:
                            bit = reader.read(1)
                            if cid == y_cid and bit:
                                ycoef[by, bx, 0] |= bit << al
            else:  # AC scan: non-interleaved single component by spec
                if ns != 1:
                    raise ValueError("interleaved progressive AC scan")
                cid, _td, ta = scomps[0]
                nby, nbx = nblocks(cid)
                table = huff_ac[ta]
                eobrun = 0
                blk_n = 0
                for r0 in range(nby):
                    for c0 in range(nbx):
                        # non-interleaved scan: one MCU = one block, so
                        # the restart interval counts blocks here; EOB
                        # runs never cross a restart boundary
                        if restart_interval and blk_n and (
                            blk_n % restart_interval == 0
                        ):
                            reader = next_segment()
                            eobrun = 0
                        blk_n += 1
                        blk = ycoef[r0, c0]
                        k = ss
                        if ah == 0:  # first scan for this band
                            if eobrun:
                                eobrun -= 1
                                continue
                            while k <= se:
                                rs = _huff_decode(reader, table)
                                r, s = rs >> 4, rs & 15
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    eobrun = (1 << r) - 1 + (
                                        reader.read(r) if r else 0
                                    )
                                    break
                                k += r
                                if k > se:
                                    raise ValueError("JPEG AC index overrun")
                                blk[k] = _extend(reader.read(s), s) << al
                                k += 1
                        else:  # refinement
                            # eobrun counts the FULL run here (incl. the
                            # block whose rs-loop read the EOBn): the
                            # current block's tail correction-bit pass
                            # must run even for a run of length 1
                            if eobrun == 0:
                                while k <= se:
                                    rs = _huff_decode(reader, table)
                                    r, s = rs >> 4, rs & 15
                                    newval = 0
                                    if s == 0:
                                        if r != 15:
                                            eobrun = (1 << r) + (
                                                reader.read(r) if r else 0
                                            )
                                            break
                                        # ZRL: 16 zero-history positions
                                    else:
                                        if s != 1:
                                            raise ValueError(
                                                "bad AC refinement magnitude"
                                            )
                                        newval = (
                                            (1 << al) if reader.read(1)
                                            else -(1 << al)
                                        )
                                    while k <= se:
                                        if blk[k] != 0:
                                            if reader.read(1):
                                                blk[k] += (
                                                    (1 << al) if blk[k] > 0
                                                    else -(1 << al)
                                                )
                                        else:
                                            if r == 0:
                                                if newval:
                                                    blk[k] = newval
                                                k += 1
                                                break
                                            r -= 1
                                        k += 1
                            if eobrun > 0:
                                # EOB band: correction bits only
                                while k <= se:
                                    if blk[k] != 0 and reader.read(1):
                                        blk[k] += (
                                            (1 << al) if blk[k] > 0
                                            else -(1 << al)
                                        )
                                    k += 1
                                eobrun -= 1
            continue  # pos already advanced past the entropy segment
        pos += 2 + ln
    if frame is None or ycoef is None:
        raise ValueError("JPEG missing SOF2")
    h, w, comps, max_h, max_v, _mx, _my = frame
    y_hs, y_vs, y_tq = comps[0][1], comps[0][2], comps[0][3]
    nby = -(-(-(-h * y_vs // max_v)) // 8)
    nbx = -(-(-(-w * y_hs // max_h)) // 8)
    plane = np.zeros((ycoef.shape[0] * 8, ycoef.shape[1] * 8))
    q = qt[y_tq]
    for r in range(nby):
        for c in range(nbx):
            block = np.zeros(64)
            block[_ZIGZAG] = ycoef[r, c] * q
            px = _DCT_A.T @ block.reshape(8, 8) @ _DCT_A
            plane[r * 8: r * 8 + 8, c * 8: c * 8 + 8] = px + 128.0
    return np.clip(plane[:h, :w], 0.0, 255.0)


class _MSBReader:
    """MSB-first bit reader over bytes (FLAC bitstream layout)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        v = 0
        pos = self.pos
        data = self.data
        end = pos + n
        if end > len(data) * 8:
            raise ValueError("FLAC bitstream exhausted")
        while n:
            byte_i, bit_i = divmod(pos, 8)
            take = min(8 - bit_i, n)
            chunk = (data[byte_i] >> (8 - bit_i - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            pos += take
            n -= take
        self.pos = pos
        return v

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        c = 0
        while self.read(1) == 0:
            c += 1
        return c

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


_FLAC_BLOCKSIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _flac_utf8_number(r: _MSBReader) -> int:
    """FLAC's UTF-8-style frame/sample number coding."""
    first = r.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    v = first & (mask - 1)
    for _ in range(n_extra):
        cont = r.read(8)
        if cont >> 6 != 0b10:
            raise ValueError("bad FLAC UTF-8 continuation")
        v = (v << 6) | (cont & 0x3F)
    return v


def _flac_residual(r: _MSBReader, blocksize: int, order: int) -> list[int]:
    """Rice-coded residual partitions (coding methods 0/1)."""
    method = r.read(2)
    if method > 1:
        raise NotImplementedError("reserved FLAC residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = r.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("FLAC partition size not integral")
    out: list[int] = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        param = r.read(plen)
        if param == escape:
            raw = r.read(5)
            for _ in range(n):
                out.append(r.signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.unary()
                v = (q << param) | r.read(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag → signed
    return out


def _flac_subframe(r: _MSBReader, blocksize: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = r.signed(bps)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [r.signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        warm = [r.signed(bps) for _ in range(order)]
        res = _flac_residual(r, blocksize, order)
        samples = list(warm)
        for i, e in enumerate(res):
            n = order + i
            if order == 0:
                v = e
            elif order == 1:
                v = e + samples[n - 1]
            elif order == 2:
                v = e + 2 * samples[n - 1] - samples[n - 2]
            elif order == 3:
                v = (e + 3 * samples[n - 1] - 3 * samples[n - 2]
                     + samples[n - 3])
            else:
                v = (e + 4 * samples[n - 1] - 6 * samples[n - 2]
                     + 4 * samples[n - 3] - samples[n - 4])
            samples.append(v)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        warm = [r.signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = r.signed(5)
        if shift < 0:
            raise NotImplementedError("negative FLAC LPC shift")
        coefs = [r.signed(precision) for _ in range(order)]
        res = _flac_residual(r, blocksize, order)
        samples = list(warm)
        for e in res:
            acc = 0
            n = len(samples)
            for j, c in enumerate(coefs):
                acc += c * samples[n - 1 - j]
            samples.append(e + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_flac(b: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC → (mono float samples in [-1, 1], rate, channels).

    Pure stdlib/numpy subset decoder (format spec RFC 9639): STREAMINFO
    + frame parse, CONSTANT/VERBATIM/FIXED/LPC subframes, rice-coded
    residual partitions (4- and 5-bit params, escape codes),
    left/right/mid-side stereo decorrelation, wasted bits, CRC-8 frame
    headers and CRC-16 frames VERIFIED."""
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(b):
        hdr = b[pos]
        last = hdr >> 7
        btype = hdr & 0x7F
        ln = int.from_bytes(b[pos + 1: pos + 4], "big")
        if btype == 0:
            streaminfo = b[pos + 4: pos + 4 + ln]
        pos += 4 + ln
        if last:
            break
    if streaminfo is None or len(streaminfo) < 18:
        raise ValueError("FLAC missing STREAMINFO")
    si = _MSBReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)  # min framesize
    si.read(24)  # max framesize
    rate = si.read(20)
    channels = si.read(3) + 1
    bps_si = si.read(5) + 1
    total = si.read(36)

    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(b) - 2:
        # frame sync: 14 bits 0b11111111111110
        if b[pos] != 0xFF or (b[pos + 1] >> 2) != 0x3E:
            raise ValueError("bad FLAC frame sync")
        hdr_start = pos
        # the 16 bits already checked cover sync(14) + reserved + blocking
        r = _MSBReader(b, pos * 8 + 16)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)  # reserved
        _flac_utf8_number(r)
        if bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        elif bs_code in _FLAC_BLOCKSIZES:
            blocksize = _FLAC_BLOCKSIZES[bs_code]
        else:
            raise ValueError("reserved FLAC blocksize code")
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        # bps code 0 = "get from STREAMINFO"; 3 is RESERVED per RFC 9639
        # §9.1.4 — a silent fallback to the STREAMINFO bps let corrupt
        # headers decode garbage that still passed the pre-CRC parse
        if bps_code == 0:
            bps = bps_si
        elif bps_code in _FLAC_BPS:
            bps = _FLAC_BPS[bps_code]
        else:
            raise ValueError("reserved FLAC bits-per-sample code")
        hdr_end = (r.pos + 7) // 8
        if _crc8(b[hdr_start:hdr_end]) != r.read(8):
            raise ValueError("FLAC frame header CRC mismatch")
        if ch_code < 8:
            n_sub = ch_code + 1
            kinds = ["ind"] * n_sub
        elif ch_code == 8:
            n_sub, kinds = 2, ["left", "side"]
        elif ch_code == 9:
            n_sub, kinds = 2, ["side", "right"]
        elif ch_code == 10:
            n_sub, kinds = 2, ["mid", "side"]
        else:
            raise ValueError("reserved FLAC channel assignment")
        if (ch_code < 8 and n_sub != channels) or (ch_code >= 8 and channels != 2):
            raise ValueError("FLAC channel count mismatch")
        subs = []
        for kind in kinds:
            sub_bps = bps + 1 if kind == "side" else bps
            subs.append(_flac_subframe(r, blocksize, sub_bps))
        r.align()
        frame_end = r.pos // 8
        if _crc16(b[hdr_start:frame_end]) != r.read(16):
            raise ValueError("FLAC frame CRC mismatch")
        pos = r.pos // 8
        if ch_code < 8:
            for c in range(channels):
                chans[c].extend(subs[c])
        elif ch_code == 8:  # left/side: right = left - side
            chans[0].extend(subs[0])
            chans[1].extend(l - s for l, s in zip(subs[0], subs[1]))
        elif ch_code == 9:  # right/side: left = right + side
            chans[0].extend(rv + s for rv, s in zip(subs[1], subs[0]))
            chans[1].extend(subs[1])
        else:  # mid/side
            for m, s in zip(subs[0], subs[1]):
                l = (m << 1) | (s & 1)
                chans[0].append((l + s) >> 1)
                chans[1].append((l - s) >> 1)
    arr = np.array(chans, dtype=np.float64)
    if total:
        arr = arr[:, :total]
    mono = arr.mean(axis=0) / float(1 << (bps_si - 1))
    return mono, rate, channels


def _decode_wav(b: bytes) -> tuple[np.ndarray, int, int]:
    """PCM 8/16-bit WAV → (mono float samples in [-1, 1], rate, channels)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, ln = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8: pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError(f"WAV fmt={audio_fmt} bits={bits}")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    if channels > 1:
        s = s[: len(s) // channels * channels].reshape(-1, channels).mean(axis=1)
    return s, rate, channels


def _image_feature(gray: np.ndarray) -> np.ndarray:
    """8×8 block-mean grid (aHash-style), row-major, scaled to [0, 1]."""
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    out = np.zeros(64, dtype=np.float64)
    for i in range(8):
        for j in range(8):
            block = gray[ys[i]: max(ys[i + 1], ys[i] + 1),
                         xs[j]: max(xs[j + 1], xs[j] + 1)]
            out[i * 8 + j] = block.mean() if block.size else 0.0
    return out / 255.0


def _audio_feature(s: np.ndarray) -> np.ndarray:
    """[rms, zcr, mean, peak] + 4 coarse envelope bins (8-dim)."""
    if len(s) == 0:
        return np.zeros(8)
    rms = float(np.sqrt((s ** 2).mean()))
    zcr = float((np.diff(np.signbit(s)) != 0).mean()) if len(s) > 1 else 0.0
    env = [float(np.abs(c).mean()) if len(c) else 0.0
           for c in np.array_split(s, 4)]
    return np.array([rms, zcr, float(s.mean()), float(np.abs(s).max()), *env])


def _parse_avi_header(b: bytes) -> tuple[int, int, int]:
    """AVI container metadata (no frame decode): walk RIFF chunks to the
    hdrl LIST's avih main header → (width, height, total_frames).
    Codec payloads stay stubbed; the container parse is real so video
    rows carry true dimensions."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI")

    def walk(pos: int, end: int):
        while pos + 8 <= end:
            cid = b[pos: pos + 4]
            ln = struct.unpack_from("<I", b, pos + 4)[0]
            body_start = pos + 8
            if cid == b"LIST":
                ltype = b[body_start: body_start + 4]
                if ltype in (b"hdrl", b"avih"):
                    # the LIST size ln INCLUDES the 4-byte list type, so
                    # children span [body_start+4, body_start+ln) — an
                    # `ln - 4` end truncated every LIST's last 4 bytes and
                    # could miss a trailing child chunk
                    found = walk(body_start + 4, body_start + ln)
                    if found:
                        return found
            elif cid == b"avih":
                frames = struct.unpack_from("<I", b, body_start + 16)[0]
                w = struct.unpack_from("<I", b, body_start + 32)[0]
                h = struct.unpack_from("<I", b, body_start + 36)[0]
                return w, h, frames
            pos = body_start + ln + (ln & 1)
        return None

    found = walk(12, len(b))
    if not found:
        raise ValueError("AVI missing avih header")
    return found


def _avi_video_strf(b: bytes) -> tuple[int, int, int, int, bytes] | None:
    """Stream format of the first VIDEO stream: walk hdrl → each strl
    LIST, match the strh whose fccType is 'vids', and parse that
    stream's strf chunk as a BITMAPINFOHEADER (public layout: biSize,
    biWidth, biHeight i32, biPlanes/biBitCount u16, biCompression u32,
    ..., biClrUsed at +32; RGBQUAD palette follows the 40-byte header).
    Returns (width, height, bit_count, compression, palette_bytes) or
    None when no video stream format is present."""

    def walk(pos: int, end: int, in_strl: bool):
        is_video = not in_strl  # outside an strl, strf has no gate
        while pos + 8 <= end:
            cid = b[pos: pos + 4]
            ln = struct.unpack_from("<I", b, pos + 4)[0]
            body_start = pos + 8
            if cid == b"LIST":
                ltype = b[body_start: body_start + 4]
                if ltype in (b"hdrl", b"strl"):
                    found = walk(body_start + 4, body_start + ln,
                                 ltype == b"strl")
                    if found:
                        return found
            elif cid == b"strh" and in_strl:
                is_video = b[body_start: body_start + 4] == b"vids"
            elif cid == b"strf" and in_strl and is_video and ln >= 40:
                w, h = struct.unpack_from("<ii", b, body_start + 4)
                bpp = struct.unpack_from("<H", b, body_start + 14)[0]
                comp = struct.unpack_from("<I", b, body_start + 16)[0]
                n_clr = struct.unpack_from("<I", b, body_start + 32)[0]
                hdr_sz = struct.unpack_from("<I", b, body_start)[0]
                pal = b""
                if bpp == 8:
                    n = n_clr or 256
                    pal = b[body_start + hdr_sz:
                            body_start + hdr_sz + 4 * n]
                return w, h, bpp, comp, pal
            pos = body_start + ln + (ln & 1)
        return None

    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    return walk(12, len(b), False)


def _decode_dib_frame(frame: bytes, w: int, h: int, bpp: int,
                      palette: bytes) -> np.ndarray:
    """Raw BI_RGB DIB pixel array (an AVI '##db'/'##dc' frame body for
    an uncompressed video stream) → grayscale [h, w].  Same layout as a
    BMP's pixel array minus the file header: rows 4-byte aligned,
    bottom-up when the strf height is positive; 24bpp BGR, 32bpp BGRX,
    or 8bpp through the strf's RGBQUAD palette."""
    flip = h > 0
    h = abs(h)
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"DIB bpp={bpp}")
    stride = (w * bpp // 8 + 3) & ~3
    if len(frame) < stride * h:
        raise ValueError("DIB frame shorter than stride*height")
    px = np.frombuffer(frame, dtype=np.uint8, count=stride * h)
    px = px.reshape(h, stride)
    if bpp == 8:
        if len(palette) < 4 * 256:
            palette = palette.ljust(4 * 256, b"\0")
        pal = np.frombuffer(palette[: 4 * 256], dtype=np.uint8)
        pal = pal.reshape(256, 4).astype(np.float64)  # B,G,R,reserved
        idx = px[:, :w]
        gray = (0.114 * pal[idx, 0] + 0.587 * pal[idx, 1]
                + 0.299 * pal[idx, 2])
    else:
        nch = bpp // 8
        rgb = px[:, : w * nch].reshape(h, w, nch).astype(np.float64)
        gray = 0.114 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.299 * rgb[:, :, 2]
    return gray[::-1] if flip else gray


def _avi_first_frame(b: bytes) -> bytes | None:
    """First video-frame payload from the movi LIST ('##dc'/'##db'
    chunks, possibly nested in LIST('rec ') groups).  MJPEG frames are
    plain baseline JPEGs the existing decoder handles — returns the raw
    chunk body for the caller to dispatch; None when no frame chunk is
    found (audio-only or truncated file)."""

    def find_frame(pos: int, end: int):
        while pos + 8 <= end:
            cid = b[pos: pos + 4]
            ln = struct.unpack_from("<I", b, pos + 4)[0]
            body_start = pos + 8
            if cid == b"LIST":
                ltype = b[body_start: body_start + 4]
                if ltype in (b"movi", b"rec "):
                    found = find_frame(body_start + 4, body_start + ln)
                    if found is not None:
                        return found
            elif (
                cid[2:4] in (b"dc", b"db")
                and cid[:2].isdigit()
                and ln > 0
            ):
                return b[body_start: body_start + ln]
            pos = body_start + ln + (ln & 1)
        return None

    return find_frame(12, len(b))


def _decode_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB for formats whose codecs don't ship in this container
    (video/arithmetic-JPEG/corrupt payloads): a deterministic fake (width, height, 8-dim
    feature) derived from the payload bytes so the pipeline shape stays
    fully exercisable.  Replace with PIL/ffmpeg in production."""
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    width = int(h[:4].sum()) % 1024 + 1
    height = int(h[4:8].sum()) % 1024 + 1
    feature = h.reshape(8, 8).mean(axis=1) / 255.0
    return width, height, feature


def decode_media(payload: bytes) -> tuple[str, int, int, bool, np.ndarray]:
    """Dispatch by magic: (media_type, width, height, decoded, feature).
    For audio, width = sample count and height = channel count."""
    try:
        if payload[:2] == b"BM":
            gray = _decode_bmp(payload)
            return ("image/bmp", gray.shape[1], gray.shape[0], True,
                    _image_feature(gray))
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            gray = _decode_png(payload)
            return ("image/png", gray.shape[1], gray.shape[0], True,
                    _image_feature(gray))
        if payload[:2] == b"\xff\xd8":
            gray = _decode_jpeg(payload)
            return ("image/jpeg", gray.shape[1], gray.shape[0], True,
                    _image_feature(gray))
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            gray = _decode_gif(payload)
            return ("image/gif", gray.shape[1], gray.shape[0], True,
                    _image_feature(gray))
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            s, rate, channels = _decode_wav(payload)
            return ("audio/wav", len(s), channels, True, _audio_feature(s))
        if payload[:4] == b"fLaC":
            s, rate, channels = _decode_flac(payload)
            return ("audio/flac", len(s), channels, True, _audio_feature(s))
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            # container metadata is REAL (true dimensions); MJPEG first
            # frames are plain JPEGs and uncompressed streams are raw
            # BI_RGB DIB pixel arrays → both decode for real.  Other
            # codecs (and arithmetic-coded frames) stay the declared
            # stub with decoded=False — their codecs don't ship in this
            # container.
            w, hh, _frames = _parse_avi_header(payload)
            frame = _avi_first_frame(payload)
            if frame is not None:
                try:
                    if frame[:2] == b"\xff\xd8":
                        gray = _decode_jpeg(frame)
                        return ("video/avi", w, hh, True,
                                _image_feature(gray))
                    strf = _avi_video_strf(payload)
                    if strf is not None and strf[3] == 0:  # BI_RGB
                        fw, fh, bpp, _comp, pal = strf
                        gray = _decode_dib_frame(frame, fw, fh, bpp, pal)
                        return ("video/avi", w, hh, True,
                                _image_feature(gray))
                except (ValueError, NotImplementedError, struct.error,
                        IndexError, KeyError):
                    pass  # corrupt/unsupported frame: metadata still real
            _sw, _sh, feat = _decode_stub(payload)
            return ("video/avi", w, hh, False, feat)
    except (ValueError, NotImplementedError, struct.error, zlib.error,
            IndexError, KeyError, EOFError):
        # A crawled corpus always contains payloads with valid magic bytes
        # but corrupt bodies (truncated IDAT, bad struct offsets, zlib
        # garbage).  One bad blob must not fail the Spark stage: anything
        # the decoders reject falls back to the deterministic stub with
        # decoded=false, which downstream filters can drop.  The catch is
        # limited to the corrupt-payload error types the decoders raise —
        # a genuine decoder regression (TypeError, AttributeError, ...)
        # surfaces instead of silently stubbing every payload.
        pass
    w, hh, f = _decode_stub(payload)
    return ("application/octet-stream", w, hh, False, f)


def extract_features(df: DataFrame, bin_col: str, id_col: str,
                     batch_limit: int = 256) -> DataFrame:
    """Decode + featurise via mapInPandas (iterator form: per-batch work,
    per-executor amortised setup — the N2 chunked-inference shape,
    tools/matcher_funcs.py:1384-1412)."""
    fields = [id_col, bin_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "media_type": [], "width": [], "height": [],
                    "decoded": [], "feature": []}
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                mt, w, h, ok, feat = decode_media(bytes(payload))
                rows["id"].append(rid)
                rows["media_type"].append(mt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["decoded"].append(ok)
                rows["feature"].append([float(x) for x in feat])
            yield pd.DataFrame(rows)

    return df.select(*fields).mapInPandas(run, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# resize + frame sampling (the remaining multimodal plumbing: decode →
# RESIZE → features, and per-container FRAME-SAMPLE → one row per frame)
# ---------------------------------------------------------------------------


def _overlap_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) row-stochastic matrix of exact interval overlaps:
    target cell i covers source interval [i·src/dst, (i+1)·src/dst);
    W[i, y] = |cell i ∩ pixel y| · dst/src.  Area (box) resampling —
    the correct downscale filter — as one matmul per axis."""
    scale = src / dst
    w = np.zeros((dst, src), dtype=np.float64)
    for i in range(dst):
        lo, hi = i * scale, (i + 1) * scale
        y0, y1 = int(np.floor(lo)), int(np.ceil(hi))
        for y in range(y0, min(y1, src)):
            w[i, y] = min(hi, y + 1) - max(lo, y)
    return w / scale


def area_resize(gray: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Exact area-weighted (box-filter) resize of a 2-D grayscale array
    to (th, tw): thumb = W_h · gray · W_wᵀ.  Pure numpy, deterministic,
    parity-tested against a scalar double loop."""
    g = gray.astype(np.float64)
    return _overlap_weights(g.shape[0], th) @ g @ _overlap_weights(
        g.shape[1], tw).T


def _decode_gray(payload: bytes) -> np.ndarray | None:
    """Grayscale pixel array for any still-image payload the real
    decoders handle; None for non-images/corrupt bodies (same corrupt-
    payload error discipline as decode_media)."""
    try:
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            return _decode_jpeg(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return _decode_gif(payload)
    except (ValueError, NotImplementedError, struct.error, zlib.error,
            IndexError, KeyError, EOFError):
        return None
    return None


THUMBNAIL_SCHEMA = (
    "id bigint, media_type string, width int, height int, "
    "decoded boolean, thumbnail array<float>"
)


_STILL_MEDIA_TYPES = (
    (lambda p: p[:2] == b"BM", "image/bmp"),
    (lambda p: p[:8] == b"\x89PNG\r\n\x1a\n", "image/png"),
    (lambda p: p[:2] == b"\xff\xd8", "image/jpeg"),
    (lambda p: p[:6] in (b"GIF87a", b"GIF89a"), "image/gif"),
)


def _still_media_type(payload: bytes) -> str | None:
    """media_type by magic for the still-image formats _decode_gray
    handles (the same magic dispatch — and the same labels — as
    decode_media)."""
    for probe, mt in _STILL_MEDIA_TYPES:
        if probe(payload):
            return mt
    return None


def extract_thumbnails(df: DataFrame, bin_col: str, id_col: str,
                       tw: int = 8, th: int = 8) -> DataFrame:
    """Decode → area-resize to a (th, tw) thumbnail, flattened
    row-major, values in [0, 1].  Non-image / undecodable payloads
    return decoded=false with an empty thumbnail (downstream filters
    drop or route them).  Same mapInPandas batch shape as
    extract_features — at scale the only shuffle is whatever the caller
    does with the result."""
    fields = [id_col, bin_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "media_type": [], "width": [], "height": [],
                    "decoded": [], "thumbnail": []}
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                payload = bytes(payload)
                # Still images decode exactly ONCE (round 8, ADVICE r7):
                # the previous shape ran decode_media (full pixel decode
                # + feature, both discarded) and then _decode_gray again
                # — doubling the dominant per-payload CPU.  Metadata for
                # a decodable still is the gray array's own shape;
                # everything else (audio/video/corrupt) still goes
                # through decode_media, whose outputs are unchanged.
                mt = _still_media_type(payload)
                if mt is not None:
                    gray = _decode_gray(payload)
                    if gray is not None:
                        w, h = gray.shape[1], gray.shape[0]
                    else:  # corrupt body: decode_media's stub fallback
                        mt, w, h, _ok, _feat = decode_media(payload)
                else:
                    gray = None
                    mt, w, h, _ok, _feat = decode_media(payload)
                rows["id"].append(rid)
                rows["media_type"].append(mt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["decoded"].append(gray is not None)
                rows["thumbnail"].append(
                    [] if gray is None else [
                        float(x) / 255.0
                        for x in area_resize(gray, tw, th).ravel()
                    ]
                )
            yield pd.DataFrame(rows)

    return df.select(*fields).mapInPandas(run, THUMBNAIL_SCHEMA)


def _avi_frames(b: bytes) -> list[bytes]:
    """ALL video-frame chunk bodies ('##dc'/'##db', rec-list aware) in
    container order — the enumeration behind frame sampling;
    _avi_first_frame is frames[0]."""
    out: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = b[pos: pos + 4]
            ln = struct.unpack_from("<I", b, pos + 4)[0]
            body_start = pos + 8
            if cid == b"LIST":
                ltype = b[body_start: body_start + 4]
                if ltype in (b"movi", b"rec "):
                    walk(body_start + 4, body_start + ln)
            elif (
                cid[2:4] in (b"dc", b"db")
                and cid[:2].isdigit()
                and ln > 0
            ):
                out.append(b[body_start: body_start + ln])
            pos = body_start + ln + (ln & 1)

    walk(12, len(b))
    return out


FRAME_SCHEMA = (
    "id bigint, frame_idx int, media_type string, width int, height int, "
    "decoded boolean, feature array<float>"
)


def sample_frames(df: DataFrame, bin_col: str, id_col: str,
                  every: int = 2, max_frames: int = 4) -> DataFrame:
    """Frame sampling over video containers: every `every`-th video
    chunk, up to `max_frames`, ONE OUTPUT ROW PER SAMPLED FRAME.
    MJPEG and raw-DIB frames decode for real (same paths as
    decode_media); other codecs yield the deterministic stub feature
    with decoded=false — the declared container-has-no-codec stub.
    Non-AVI payloads yield no rows.  The per-payload fan-out happens
    INSIDE mapInPandas, so the input shuffles once at most and the
    output row count is bounded by max_frames × payloads."""
    fields = [id_col, bin_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "frame_idx": [], "media_type": [],
                    "width": [], "height": [], "decoded": [], "feature": []}
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                payload = bytes(payload)
                if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
                    continue
                # corrupt-payload discipline (ADVICE r7): valid RIFF/AVI
                # magic with a corrupt body (missing avih, lying LIST
                # sizes) must skip the payload, not fail the stage — the
                # same guard decode_media wraps these exact calls in
                try:
                    w, h, _n = _parse_avi_header(payload)
                    strf = _avi_video_strf(payload)
                    frames = _avi_frames(payload)
                except (ValueError, NotImplementedError, struct.error,
                        IndexError, KeyError, EOFError):
                    continue  # one bad blob yields no rows
                for fi, frame in list(
                    enumerate(frames)
                )[::every][:max_frames]:
                    ok, feat = False, None
                    try:
                        if frame[:2] == b"\xff\xd8":
                            gray = _decode_jpeg(frame)
                            ok, feat = True, _image_feature(gray)
                        elif strf is not None and strf[3] == 0:  # BI_RGB
                            fw, fh, bpp, _comp, pal = strf
                            gray = _decode_dib_frame(frame, fw, fh, bpp, pal)
                            ok, feat = True, _image_feature(gray)
                    except (ValueError, NotImplementedError, struct.error,
                            IndexError, KeyError):
                        ok, feat = False, None
                    if feat is None:
                        _sw, _sh, feat = _decode_stub(frame)
                    rows["id"].append(rid)
                    rows["frame_idx"].append(fi)
                    rows["media_type"].append("video/avi")
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["decoded"].append(ok)
                    rows["feature"].append([float(x) for x in feat])
            # a batch of only non-AVI payloads yields nothing: an EMPTY
            # pandas frame gets float64 columns Arrow cannot convert to
            # array<float>, and mapInPandas is fine with skipped batches
            if rows["id"]:
                yield pd.DataFrame(rows)

    return df.select(*fields).mapInPandas(run, FRAME_SCHEMA)
