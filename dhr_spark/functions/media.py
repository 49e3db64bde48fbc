"""Real media decoders — pure numpy, zero external dependencies.

Replaces the round-2 decode STUB for every container this environment can
decode without imaging/audio libraries: binary netpbm images (P5 grayscale
/ P6 RGB), uncompressed BMP (24-bit BI_RGB and 8-bit grayscale-palette),
and RIFF/WAV PCM16 audio. Compressed formats (PNG/JPEG/MP3/...) still
require Pillow/soundfile and keep the import-gated fallback in
operators/multimodal.py — the reference's corpus loaders never decode
media at all (/root/reference/tevatron/datasets/dataset.py handles text
fields only), so this layer is repo scope: the multimodal columns a
training-data pipeline carries alongside text.

Determinism contract: everything here is integer math on bytes (the RGB →
luminance reduction is the ITU-R BT.601 integer form (299R+587G+114B)/1000
with floor division), so decoded statistics are exactly reproducible by
the DuckDB oracles from the synthesis formulas — the driver checks
decode(encode(x)) against an independent recomputation of x.

All parsers validate structure and raise ValueError with the offending
detail rather than mis-decoding: a truncated pixel array, a non-PCM wav,
or a compressed BMP must fail loudly at the task (mapInPandas batches
surface the error per-partition with the doc context attached upstream).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- netpbm


def encode_pgm(pixels: np.ndarray) -> bytes:
    """Binary PGM (P5, maxval 255) from a (H, W) uint8 array."""
    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"PGM needs a 2-d array, got shape {a.shape}")
    h, w = a.shape
    return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Binary PPM (P6, maxval 255) from a (H, W, 3) uint8 array."""
    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"PPM needs a (H, W, 3) array, got shape {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, pixel_offset) — whitespace- and
    comment-tolerant netpbm header scan (the format allows '#' comments
    between any tokens)."""
    magic = payload[:2]
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        tokens.append(payload[start:pos])
    pos += 1  # single whitespace byte after maxval, then raster
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError as exc:
        raise ValueError(f"bad netpbm header tokens {tokens!r}") from exc
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad netpbm dimensions {w}x{h}")
    return magic, w, h, maxval, pos


def decode_pgm(payload: bytes) -> np.ndarray:
    """(H, W) uint8 from binary PGM (P5)."""
    magic, w, h, _, off = _pnm_header(payload)
    if magic != b"P5":
        raise ValueError(f"not a binary PGM (magic {magic!r})")
    raster = payload[off : off + w * h]
    if len(raster) != w * h:
        raise ValueError(
            f"PGM raster truncated: need {w * h} bytes, have {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w)


def decode_ppm(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 from binary PPM (P6)."""
    magic, w, h, _, off = _pnm_header(payload)
    if magic != b"P6":
        raise ValueError(f"not a binary PPM (magic {magic!r})")
    need = w * h * 3
    raster = payload[off : off + need]
    if len(raster) != need:
        raise ValueError(
            f"PPM raster truncated: need {need} bytes, have {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


# ------------------------------------------------------------------ BMP

_BI_RGB = 0


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up) from a
    (H, W, 3) uint8 RGB array. Rows pad to 4-byte multiples per spec."""
    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"BMP needs a (H, W, 3) array, got shape {a.shape}")
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    # BGR channel order, bottom row first (positive-height BMP)
    raster[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)
    data = raster.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, _BI_RGB,
                       len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from an uncompressed BMP.

    Supports 24-bit BI_RGB (the encode_bmp shape) and 8-bit paletted,
    both bottom-up (positive height) and top-down (negative height).
    Anything compressed or deeper raises."""
    if payload[:2] != b"BM":
        raise ValueError(f"not a BMP (magic {payload[:2]!r})")
    if len(payload) < 54:
        raise ValueError("BMP header truncated")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_raw = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if compression != _BI_RGB:
        raise ValueError(f"only uncompressed BI_RGB supported, got {compression}")
    if bpp not in (8, 24):
        raise ValueError(f"only 8/24-bit BMP supported, got {bpp}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    row_bytes = (w * (bpp // 8) + 3) & ~3
    need = row_bytes * h
    raster = payload[pix_off : pix_off + need]
    if len(raster) != need:
        raise ValueError(
            f"BMP raster truncated: need {need} bytes, have {len(raster)}"
        )
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        return rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()
    # 8-bit: map through the BGRX palette between the headers and the raster
    pal_bytes = payload[14 + hdr_size : pix_off]
    pal = np.frombuffer(pal_bytes, dtype=np.uint8).reshape(-1, 4)
    if pal.shape[0] < int(rows.max()) + 1:
        raise ValueError("BMP palette smaller than max pixel index")
    return pal[rows[:, :w]][:, :, [2, 1, 0]].copy()


# ------------------------------------------------------------------ WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """RIFF/WAV PCM16 mono from an int16 array."""
    a = np.ascontiguousarray(samples, dtype=np.int16)
    if a.ndim != 1:
        raise ValueError(f"WAV encoder takes mono 1-d int16, got {a.shape}")
    data = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """(samples int16 (n,) or (n, channels), sample_rate) from RIFF/WAV
    PCM16. Walks the chunk list (fmt may be followed by LIST/fact chunks
    before data); non-PCM or non-16-bit raises."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file (magic {payload[:4]!r})")
    pos, n = 12, len(payload)
    fmt = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too small ({size} bytes)")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            audio_fmt, channels, rate, _, _, bits = fmt
            if audio_fmt != 1:
                raise ValueError(f"only PCM supported, got format {audio_fmt}")
            if bits != 16:
                raise ValueError(f"only 16-bit PCM supported, got {bits}")
            if len(body) != size:
                raise ValueError(
                    f"WAV data truncated: need {size} bytes, have {len(body)}"
                )
            samples = np.frombuffer(body[: size - size % (2 * channels)],
                                    dtype="<i2")
            if channels > 1:
                samples = samples.reshape(-1, channels)
            return samples, rate
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk in WAV")


# ------------------------------------------------------------- dispatch


def luminance(rgb: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 integer luminance: (299R + 587G + 114B) // 1000 —
    floor division keeps it exactly reproducible in any engine."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def decode_image(payload: bytes) -> np.ndarray:
    """(H, W) uint8 luminance from any supported image container: P5 is
    returned as-is; P6 and BMP reduce through the BT.601 integer
    luminance. Unknown magics raise ValueError (callers fall back to
    Pillow / the stub via operators/multimodal.decode_blob)."""
    head = payload[:2]
    if head == b"P5":
        return decode_pgm(payload)
    if head == b"P6":
        return luminance(decode_ppm(payload))
    if head == b"BM":
        return luminance(decode_bmp(payload))
    raise ValueError(f"unsupported image container (magic {head!r})")
