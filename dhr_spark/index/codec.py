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


# ---------------------------------------------------------------------------
# FOR (Frame-of-Reference) bit-packed block codec — Lucene ForUtil analogue.
#
# Lucene's postings format has packed every docid/freq block with fixed-width
# bit packing since 4.x (PackedInts/ForUtil; PFOR patching arrived in 8.5 —
# we implement plain FOR, which is what Lucene reverted to for freq blocks).
# Layout per block:
#     [width u8] [LEB128 absolute-first (docid streams only)] [payload]
# where payload packs ``len`` values at ``width`` bits each, LSB-first in a
# little-endian bit stream, padded to a byte boundary. Docid streams store
# the block-start slot as 0 (the absolute first docid lives in the header,
# mirroring the skip-list entry Lucene keeps outside the packed block), so
# within-block values are pure gaps and the block width is bounded by the
# largest GAP, never by the absolute docid magnitude.
#
# Both encode and decode are numpy-vectorized: encode scatters value bits
# into one bit plane and np.packbits it; decode gathers equal-(width, len)
# block groups into matrices and np.unpackbits them. Self-contained headers
# mean random block access needs only the stored per-block byte offsets —
# the same contract the varint codec exposes — so block-max WAND skipping
# works unchanged.
# ---------------------------------------------------------------------------


def bit_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value bit length (0 for 0) — vectorized, exact for uint64."""
    v = np.asarray(values, dtype=np.uint64)
    out = np.zeros(v.shape, dtype=np.int64)
    cur = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = cur >= (np.uint64(1) << np.uint64(s))
        out[m] += s
        cur[m] >>= np.uint64(s)
    out[v != 0] += 1
    return out


def _varints_at(raw: np.ndarray, starts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode one LEB128 varint at each start offset. Returns (values,
    byte lengths). Vectorized: gathers a 10-byte window per start."""
    pad = np.zeros(_MAX_VARINT_BYTES, dtype=np.uint8)
    rawp = np.concatenate((raw, pad))
    win = rawp[starts[:, None] + np.arange(_MAX_VARINT_BYTES)]
    is_last = (win & 0x80) == 0
    nbytes = is_last.argmax(axis=1) + 1
    keep = np.arange(_MAX_VARINT_BYTES)[None, :] < nbytes[:, None]
    shifts = (np.uint64(7) * np.arange(_MAX_VARINT_BYTES, dtype=np.uint64))[None, :]
    payload = (win & np.uint64(0x7F)).astype(np.uint64) << shifts
    vals = np.where(keep, payload, np.uint64(0)).sum(axis=1, dtype=np.uint64)
    return vals, nbytes.astype(np.int64)


def for_encode_stream(
    values: np.ndarray,
    block_lens: np.ndarray,
    firsts: np.ndarray | None = None,
) -> tuple[bytes, np.ndarray]:
    """FOR-encode a stream of blocks. ``values`` is the concatenation of all
    blocks' values (uint64); ``block_lens`` the per-block value counts. For
    docid streams pass ``firsts`` = absolute first docid per block and zero
    the block-start slots in ``values``. Returns (buf, per-block byte
    offsets into buf)."""
    v = np.asarray(values, dtype=np.uint64)
    lens = np.asarray(block_lens, dtype=np.int64)
    nb = lens.size
    if nb == 0:
        return b"", np.empty(0, dtype=np.int64)
    bstarts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    widths = np.maximum.reduceat(bit_lengths(v), bstarts)
    payload_bytes = (lens * widths + 7) >> 3
    if firsts is not None:
        f = np.asarray(firsts, dtype=np.uint64)
        flens = varint_lengths(f)
        head = 1 + flens
    else:
        head = np.ones(nb, dtype=np.int64)
    blk_bytes = head + payload_bytes
    offs = np.concatenate(([0], np.cumsum(blk_bytes)[:-1]))
    total = int(blk_bytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    out[offs] = widths.astype(np.uint8)
    if firsts is not None:
        fbuf = np.frombuffer(varint_encode(f), dtype=np.uint8)
        fcum = np.concatenate(([0], np.cumsum(flens)))
        pos = np.repeat(offs + 1 - fcum[:-1], flens) + np.arange(fcum[-1])
        out[pos] = fbuf
    if int(widths.max()) > 0:
        w_val = np.repeat(widths, lens)
        inb = np.arange(v.size, dtype=np.int64) - np.repeat(bstarts, lens)
        bit_base = np.repeat((offs + head) << 3, lens) + inb * w_val
        # ragged per-value bit indices: value j contributes w_val[j] bits
        wcum = np.concatenate(([0], np.cumsum(w_val)))
        k = np.arange(wcum[-1], dtype=np.int64) - np.repeat(wcum[:-1], w_val)
        bits = (
            (np.repeat(v, w_val) >> k.astype(np.uint64)) & np.uint64(1)
        ).astype(np.uint8)
        plane = np.zeros(total << 3, dtype=np.uint8)
        plane[np.repeat(bit_base, w_val) + k] = bits
        out |= np.packbits(plane, bitorder="little")
    return out.tobytes(), offs


def for_decode_stream(
    buf: bytes | np.ndarray,
    offs: np.ndarray,
    lens: np.ndarray,
    sel: np.ndarray,
    *,
    restarts: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode the selected block indices of a FOR stream. Returns
    (values int64, selected block lens). ``restarts=True`` reconstructs
    absolute docids: within-block cumsum of gaps + the header's absolute
    first. Mirrors the varint path's _decode_selected contract."""
    raw = (
        np.frombuffer(buf, dtype=np.uint8)
        if isinstance(buf, (bytes, bytearray))
        else buf
    )
    offs = np.asarray(offs, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    sel = np.asarray(sel, dtype=np.int64)
    if sel.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    widths = raw[offs[sel]].astype(np.int64)
    if restarts:
        firsts, flens = _varints_at(raw, offs[sel] + 1)
        head = 1 + flens
    else:
        firsts, head = None, np.ones(sel.size, dtype=np.int64)
    pay_off = offs[sel] + head
    sl = lens[sel]
    out = np.zeros(int(sl.sum()), dtype=np.uint64)
    val_starts = np.concatenate(([0], np.cumsum(sl)[:-1]))
    combos = {}
    for gi in range(sel.size):
        combos.setdefault((int(widths[gi]), int(sl[gi])), []).append(gi)
    for (w, ln), grp in combos.items():
        if w == 0:
            continue  # all-zero payload; out already zeroed
        g = np.asarray(grp, dtype=np.int64)
        nbytes = (ln * w + 7) >> 3
        mat = raw[pay_off[g][:, None] + np.arange(nbytes)]
        bits = np.unpackbits(mat, axis=1, bitorder="little")[:, : ln * w]
        weights = np.uint64(1) << np.arange(w, dtype=np.uint64)
        vals = (
            bits.reshape(len(g), ln, w).astype(np.uint64) * weights
        ).sum(axis=2, dtype=np.uint64)
        out[val_starts[g][:, None] + np.arange(ln)] = vals
    if restarts:
        abs_docs = segmented_cumsum_decode(out, sl) + np.repeat(
            firsts.astype(np.int64), sl
        )
        return abs_docs, sl
    return out.astype(np.int64), sl
