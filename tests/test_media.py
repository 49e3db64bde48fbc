"""Pure-numpy media codecs (functions/media.py) — roundtrip identity and
malformed-container failure modes. No Spark needed: the Spark-side decode
stages are pinned by the multimodal_decode_* DuckDB oracles
(tests/test_entry_oracle.py)."""

from __future__ import annotations

import numpy as np
import pytest

from dhr_spark.functions.media import (
    decode_bmp,
    decode_image,
    decode_pgm,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_pgm,
    encode_ppm,
    encode_wav,
    luminance,
)

RNG = np.random.RandomState(42)


def test_pgm_roundtrip():
    px = RNG.randint(0, 256, size=(11, 17), dtype=np.uint8)
    assert np.array_equal(decode_pgm(encode_pgm(px)), px)


def test_ppm_roundtrip():
    px = RNG.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_pnm_comment_tolerant():
    px = np.arange(6, dtype=np.uint8).reshape(2, 3)
    raw = encode_pgm(px)
    commented = raw.replace(b"P5\n", b"P5\n# a comment\n", 1)
    assert np.array_equal(decode_pgm(commented), px)


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])  # every padding remainder
def test_bmp_roundtrip_row_padding(w):
    px = RNG.randint(0, 256, size=(3, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_topdown_negative_height():
    px = RNG.randint(0, 256, size=(2, 3, 3), dtype=np.uint8)
    raw = bytearray(encode_bmp(px))
    # flip to a top-down BMP: negate the height, reverse the row order
    import struct

    h = struct.unpack_from("<i", raw, 22)[0]
    struct.pack_into("<i", raw, 22, -h)
    row_bytes = (3 * 3 + 3) & ~3
    off = struct.unpack_from("<I", raw, 10)[0]
    rows = [bytes(raw[off + i * row_bytes : off + (i + 1) * row_bytes])
            for i in range(h)]
    raw[off:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(raw)), px)


def test_wav_roundtrip_mono():
    s = RNG.randint(-32768, 32768, size=501, dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, sample_rate=8000))
    assert rate == 8000
    assert np.array_equal(out, s)


def test_wav_multichannel_shape():
    # hand-build a 2-channel PCM16 wav; decode returns (n, 2)
    import struct

    inter = RNG.randint(-32768, 32768, size=20, dtype=np.int16)
    data = inter.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = decode_wav(payload)
    assert out.shape == (10, 2)
    assert np.array_equal(out.ravel(), inter)


def test_luminance_integer_bt601():
    rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]]],
                   dtype=np.uint8)
    assert luminance(rgb).tolist() == [[76, 149, 29, 255]]


def test_decode_image_dispatch():
    g = RNG.randint(0, 256, size=(4, 6), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_pgm(g)), g)
    rgb = RNG.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(rgb)), luminance(rgb))
    assert np.array_equal(decode_image(encode_bmp(rgb)), luminance(rgb))


@pytest.mark.parametrize(
    "payload,err",
    [
        (b"P5\n3 2\n255\n" + b"\x00" * 5, "truncated"),   # raster short 1
        (b"P5\n3 2\n65535\n" + b"\x00" * 12, "maxval"),
        (b"P7\n3 2\n255\n" + b"\x00" * 6, "unsupported image container"),
        (b"BM" + b"\x00" * 10, "truncated"),
        (b"RIFF\x04\x00\x00\x00JUNK", "unsupported image container"),
    ],
)
def test_malformed_containers_raise(payload, err):
    with pytest.raises(ValueError, match=err):
        decode_image(payload)


def test_wav_guards():
    import struct

    s = np.zeros(4, dtype=np.int16)
    good = bytearray(encode_wav(s))
    struct.pack_into("<H", good, 20, 3)  # audio format -> IEEE float
    with pytest.raises(ValueError, match="only PCM"):
        decode_wav(bytes(good))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_bmp_compressed_raises():
    import struct

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    raw = bytearray(encode_bmp(px))
    struct.pack_into("<I", raw, 30, 1)  # biCompression = BI_RLE8
    with pytest.raises(ValueError, match="uncompressed"):
        decode_bmp(bytes(raw))


def test_decode_blob_uses_native_parsers():
    # operators/multimodal.decode_blob must decode netpbm WITHOUT Pillow
    from dhr_spark.operators.multimodal import FEATURE_DIM, decode_blob

    g = np.full((4, 4), 200, dtype=np.uint8)  # all pixels -> bin 12
    feat = decode_blob(encode_pgm(g))
    assert len(feat) == FEATURE_DIM
    assert feat[12] == 1.0 and feat.sum() == 1.0
    # unknown container without Pillow -> NotImplementedError (stub intact)
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            decode_blob(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
