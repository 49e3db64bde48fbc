"""Delta-gap + varint (LEB128) posting compression — vectorized numpy.

Replaces the reference's dense fp16/int16 array storage
(/root/reference/densify/densify_corpus.py:67-72) with true compressed
posting lists: docids are sorted, delta-gapped, and LEB128-encoded; term
frequencies are LEB128-encoded alongside. Both encode and decode are
numpy-vectorized (no per-element Python loops) so they run fast inside
Arrow UDF batches.

Encoding: standard unsigned LEB128 — 7 payload bits per byte, high bit set
on continuation bytes.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64-bit values need <= 10 LEB128 bytes


def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte i of value x = (x >> 7i) & 0x7f, emitted while x >= 2^(7i)
    shifts = (np.uint64(7) * np.arange(_MAX_VARINT_BYTES, dtype=np.uint64))[None, :]
    chunks = (v[:, None] >> shifts) & np.uint64(0x7F)
    # how many bytes each value needs (at least 1)
    nbytes = np.maximum(
        1, _MAX_VARINT_BYTES - (chunks[:, ::-1] != 0).argmax(axis=1)
    )
    all_zero = (v == 0)
    nbytes = np.where(all_zero, 1, nbytes)
    keep = np.arange(_MAX_VARINT_BYTES)[None, :] < nbytes[:, None]
    last = np.arange(_MAX_VARINT_BYTES)[None, :] == (nbytes[:, None] - 1)
    out = np.where(last, chunks, chunks | np.uint64(0x80)).astype(np.uint8)
    return out[keep].tobytes()


def varint_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Vectorized LEB128 decode -> uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else buf
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    # value boundaries: positions where a value ends
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    # position of each byte within its value
    val_idx = np.cumsum(np.concatenate(([0], is_last[:-1].astype(np.int64))))
    pos_in_val = np.arange(raw.size, dtype=np.int64) - starts[val_idx]
    payload = (raw & 0x7F).astype(np.uint64) << (np.uint64(7) * pos_in_val.astype(np.uint64))
    out = np.zeros(ends.size, dtype=np.uint64)
    np.add.at(out, val_idx, payload)
    if count is not None and out.size != count:
        raise ValueError(f"decoded {out.size} values, expected {count}")
    return out


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value LEB128 byte length (vectorized) — used to compute block
    byte offsets at encode time."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.int64)
    shifts = (np.uint64(7) * np.arange(_MAX_VARINT_BYTES, dtype=np.uint64))[None, :]
    chunks = (v[:, None] >> shifts) & np.uint64(0x7F)
    nbytes = np.maximum(1, _MAX_VARINT_BYTES - (chunks[:, ::-1] != 0).argmax(axis=1))
    return np.where(v == 0, 1, nbytes).astype(np.int64)


def block_delta_encode(
    sorted_docids: np.ndarray, block_size: int
) -> tuple[bytes, np.ndarray]:
    """Delta-gap encode with an ABSOLUTE restart at every block boundary so
    each block of ``block_size`` postings is independently decodable (the
    skip-pointer property block-max WAND needs). Returns (buf, byte offsets
    of each block start)."""
    d = np.asarray(sorted_docids, dtype=np.int64)
    if d.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    np.subtract(d[1:], d[:-1], out=gaps[1:])
    if d.size > 1 and gaps[1:].min() <= 0:
        raise ValueError("docids must be strictly increasing")
    starts = np.arange(0, d.size, block_size)
    gaps[starts] = d[starts]  # absolute restart per block
    u = gaps.astype(np.uint64)
    lens = varint_lengths(u)
    cum = np.concatenate(([0], np.cumsum(lens)))
    return varint_encode(u), cum[starts]


def segmented_cumsum_decode(values: np.ndarray, block_lens: np.ndarray) -> np.ndarray:
    """values = per-block (absolute-first, then gaps); block_lens = posting
    count per block. Returns absolute docids (segmented cumsum, vectorized)."""
    if values.size == 0:
        return values.astype(np.int64)
    v = values.astype(np.int64)
    c = np.cumsum(v)
    starts = np.concatenate(([0], np.cumsum(block_lens)[:-1]))
    seg_base = c[starts] - v[starts]  # cumsum just before each block start
    return c - np.repeat(seg_base, block_lens)


def delta_encode(sorted_docids: np.ndarray) -> bytes:
    """Strictly-increasing int64 docids -> gap varints (first = absolute)."""
    d = np.asarray(sorted_docids, dtype=np.int64)
    if d.size == 0:
        return b""
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    np.subtract(d[1:], d[:-1], out=gaps[1:])
    if d.size > 1 and gaps[1:].min() <= 0:
        raise ValueError("docids must be strictly increasing")
    return varint_encode(gaps.astype(np.uint64))


def delta_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    gaps = varint_decode(buf, count)
    return np.cumsum(gaps.astype(np.int64))


def encode_tfs(tfs: np.ndarray) -> bytes:
    return varint_encode(np.asarray(tfs, dtype=np.uint64))


def decode_tfs(buf: bytes, count: int | None = None) -> np.ndarray:
    return varint_decode(buf, count).astype(np.int64)
