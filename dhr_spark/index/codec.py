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
    byte lengths). Vectorized: gathers a 10-byte window per start, with
    indices CLIPPED to the buffer end instead of padding — padding meant
    copying the whole stream buffer per call, which dominated PFOR decode
    (this is called once for the firsts plus once per patch round). A
    well-formed varint always terminates inside the buffer, so clipped
    garbage bytes sit past is_last and the keep mask drops them."""
    if raw.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z.astype(np.uint64), z
    win = raw[
        np.minimum(
            starts[:, None] + np.arange(_MAX_VARINT_BYTES), raw.size - 1
        )
    ]
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
    out |= _pack_payload(v, lens, widths, offs + head, total)
    return out.tobytes(), offs


def _pack_payload(
    v: np.ndarray,
    lens: np.ndarray,
    widths: np.ndarray,
    pay_off: np.ndarray,
    total: int,
) -> np.ndarray:
    """Scatter-pack each block's values at its width (LSB-first bit plane +
    packbits). ``v`` must already fit in its block's width (mask before
    calling for patched codecs). Returns a uint8 array of ``total`` bytes
    to OR into the output buffer."""
    if v.size == 0 or int(widths.max()) == 0:
        return np.zeros(total, dtype=np.uint8)
    bstarts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    w_val = np.repeat(widths, lens)
    inb = np.arange(v.size, dtype=np.int64) - np.repeat(bstarts, lens)
    bit_base = np.repeat(pay_off << 3, lens) + inb * w_val
    # ragged per-value bit indices: value j contributes w_val[j] bits
    wcum = np.concatenate(([0], np.cumsum(w_val)))
    k = np.arange(wcum[-1], dtype=np.int64) - np.repeat(wcum[:-1], w_val)
    bits = (
        (np.repeat(v, w_val) >> k.astype(np.uint64)) & np.uint64(1)
    ).astype(np.uint8)
    plane = np.zeros(total << 3, dtype=np.uint8)
    plane[np.repeat(bit_base, w_val) + k] = bits
    return np.packbits(plane, bitorder="little")


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
    _unpack_payload(raw, pay_off, widths, sl, out, val_starts)
    if restarts:
        abs_docs = segmented_cumsum_decode(out, sl) + np.repeat(
            firsts.astype(np.int64), sl
        )
        return abs_docs, sl
    return out.astype(np.int64), sl


def _unpack_payload(
    raw: np.ndarray,
    pay_off: np.ndarray,
    widths: np.ndarray,
    sl: np.ndarray,
    out: np.ndarray,
    val_starts: np.ndarray,
) -> None:
    """Unpack fixed-width payloads into ``out`` (uint64) — equal-(width,
    len) block groups, byte-gather scheme: value i's bits live at
    [i·w, i·w + w), so its bytes start at a PER-COLUMN-CONSTANT offset
    (i·w) >> 3 with a per-column-constant shift (i·w) & 7 — gather
    ceil((w+7)/8) byte planes (2-4 for the typical 8-24 bit widths),
    little-endian combine, shift, mask. Replaces the np.unpackbits
    bit-matrix path, whose cost grew with len·w bits expanded to BYTES
    (the round-3 'packed codecs decode slower than varint' regression —
    measured 3.5x faster on geometric-gap streams, putting FOR decode
    ahead of varint). Widths > 56 (would need a 9th byte plane) keep the
    bit-matrix fallback — they never occur for delta gaps."""
    rsz = raw.size
    combos: dict[tuple[int, int], list[int]] = {}
    for gi in range(pay_off.size):
        combos.setdefault((int(widths[gi]), int(sl[gi])), []).append(gi)
    for (w, ln), grp in combos.items():
        if w == 0:
            continue  # all-zero payload; out already zeroed
        g = np.asarray(grp, dtype=np.int64)
        cols = np.arange(ln)
        if w > 56:
            # would need a 9th byte plane — never happens for delta gaps;
            # bit-matrix fallback
            nbytes = (ln * w + 7) >> 3
            mat = raw[pay_off[g][:, None] + np.arange(nbytes)]
            bits = np.unpackbits(mat, axis=1, bitorder="little")[:, : ln * w]
            weights = np.uint64(1) << np.arange(w, dtype=np.uint64)
            vals = (
                bits.reshape(len(g), ln, w).astype(np.uint64) * weights
            ).sum(axis=2, dtype=np.uint64)
            out[val_starts[g][:, None] + cols] = vals
            continue
        bit = cols * w
        byte_idx = bit >> 3
        bit_off = (bit & 7).astype(np.uint64)
        n_planes = (w + 14) >> 3  # covers bit_off (<=7) + w bits
        base = pay_off[g][:, None] + byte_idx  # (m, ln)
        # clip: trailing planes of the buffer's final block may point past
        # the stream end — every REAL bit lies inside the payload, clipped
        # garbage only lands above the mask
        val = raw[np.minimum(base, rsz - 1)].astype(np.uint64)
        for j in range(1, n_planes):
            val |= raw[np.minimum(base + j, rsz - 1)].astype(
                np.uint64
            ) << np.uint64(8 * j)
        val >>= bit_off
        val &= np.uint64((1 << w) - 1)
        out[val_starts[g][:, None] + cols] = val


# ---------------------------------------------------------------------------
# PFOR (Patched Frame-of-Reference) — Lucene PForUtil analogue.
#
# Lucene packs doc-delta blocks with PFOR since 8.5 (PForUtil): the block is
# bit-packed at a width smaller than its max value, and up to 7 outliers
# ("exceptions", typically the rare huge gap that would otherwise inflate
# every value's width) are patched back from a side list. Layout per block:
#
#     [b0: width in low 7 bits (<=64), high bit = has-exceptions flag]
#     [n_exc u8 — ONLY when the flag is set]
#     [LEB128 absolute-first (docid streams only)]
#     [payload: len values at width bits — exception slots hold LOW bits]
#     [n_exc exception positions, u8 in-block indexes]
#     [n_exc exception high parts, LEB128 of (value >> width)]
#
# Exception-free blocks are therefore byte-identical to FOR blocks, so a
# PFOR stream is never larger than the FOR stream over the same values —
# patching is pay-as-you-go.
#
# Width selection is cost-exact per block: for each candidate k in 0..7,
# w_k = the (k+1)-th largest bit length; the realized exception set is
# every value with bit length > w_k (ties stay packed), and the candidate's
# byte cost = payload + positions + actual varint high bytes. The cheapest
# candidate wins — plain FOR (k=0) is a candidate, so PFOR is never larger
# than FOR on any block, matching Lucene's "patching only when it pays"
# behavior. Both sides vectorize over equal-length block groups (encode:
# per-group sort matrix; decode: the shared _unpack_payload + at most 7
# bounded vectorized varint rounds for the patches).
# ---------------------------------------------------------------------------

MAX_PFOR_EXCEPTIONS = 7


def _pfor_choose(
    v: np.ndarray, lens: np.ndarray, bl: np.ndarray
) -> np.ndarray:
    """Per-block packed width minimizing exact byte cost with <=7 patched
    exceptions. Vectorized over equal-length block groups."""
    nb = lens.size
    widths = np.zeros(nb, dtype=np.int64)
    bstarts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    order = np.argsort(lens, kind="stable")
    for ln in np.unique(lens):
        grp = order[np.searchsorted(lens[order], ln):
                    np.searchsorted(lens[order], ln, side="right")]
        m = grp.size
        ln = int(ln)
        idx = bstarts[grp][:, None] + np.arange(ln)
        blm = np.sort(bl[idx], axis=1)[:, ::-1]  # bit lengths, desc
        kmax = min(MAX_PFOR_EXCEPTIONS, ln - 1)
        # candidate widths w_k = (k+1)-th largest bit length
        wk = blm[:, : kmax + 1]  # (m, kmax+1)
        # realized exceptions at w_k: values with bl > w_k — all live in
        # the top-(k) columns, so count + high-byte cost from blm alone
        top = blm[:, : kmax + 1]  # (m, up to 8) largest bit lengths
        costs = np.empty((m, kmax + 1), dtype=np.int64)
        for k in range(kmax + 1):
            w = wk[:, k]
            exc = top > w[:, None]  # (m, kmax+1) — only top-k can exceed
            n_exc = exc.sum(axis=1)
            # varint bytes of (value >> w): ceil((bl - w)/7), >=1 per exc
            hb = np.maximum(top - w[:, None], 0)
            hbytes = np.where(exc, (hb + 6) // 7, 0).sum(axis=1)
            # + the n_exc header byte the has-exceptions flag buys
            costs[:, k] = (
                ((ln * w + 7) >> 3) + n_exc + hbytes + (n_exc > 0)
            )
        widths[grp] = wk[np.arange(m), np.argmin(costs, axis=1)]
    return widths


def pfor_encode_stream(
    values: np.ndarray,
    block_lens: np.ndarray,
    firsts: np.ndarray | None = None,
) -> tuple[bytes, np.ndarray]:
    """PFOR-encode a stream of blocks — same contract as for_encode_stream
    (concatenated uint64 values, per-block counts, optional absolute
    firsts with zeroed block-start slots)."""
    v = np.asarray(values, dtype=np.uint64)
    lens = np.asarray(block_lens, dtype=np.int64)
    nb = lens.size
    if nb == 0:
        return b"", np.empty(0, dtype=np.int64)
    if int(lens.max()) > 256:
        raise ValueError("pfor blocks cap at 256 values (u8 patch indexes)")
    bl = bit_lengths(v)
    widths = _pfor_choose(v, lens, bl)
    w_val = np.repeat(widths, lens)
    exc = bl > w_val
    bstarts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    n_exc = np.add.reduceat(exc.astype(np.int64), bstarts)
    highs = v[exc] >> w_val[exc].astype(np.uint64)
    hlens = varint_lengths(highs)
    hl_per_block = np.zeros(nb, dtype=np.int64)
    exc_block = np.repeat(np.arange(nb), lens)[exc]
    np.add.at(hl_per_block, exc_block, hlens)
    payload_bytes = (lens * widths + 7) >> 3
    has_exc = (n_exc > 0).astype(np.int64)
    if firsts is not None:
        f = np.asarray(firsts, dtype=np.uint64)
        flens = varint_lengths(f)
        head = 1 + has_exc + flens
    else:
        head = 1 + has_exc
    blk_bytes = head + payload_bytes + n_exc + hl_per_block
    offs = np.concatenate(([0], np.cumsum(blk_bytes)[:-1]))
    total = int(blk_bytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    out[offs] = (widths | (has_exc << 7)).astype(np.uint8)
    exc_blocks = np.flatnonzero(has_exc)
    out[offs[exc_blocks] + 1] = n_exc[exc_blocks].astype(np.uint8)
    if firsts is not None:
        fbuf = np.frombuffer(varint_encode(f), dtype=np.uint8)
        fcum = np.concatenate(([0], np.cumsum(flens)))
        pos = np.repeat(
            offs + 1 + has_exc - fcum[:-1], flens
        ) + np.arange(fcum[-1])
        out[pos] = fbuf
    # payload: exception slots hold only their LOW width bits
    mask = np.where(
        w_val >= 64, np.uint64(0xFFFFFFFFFFFFFFFF),
        (np.uint64(1) << w_val.astype(np.uint64)) - np.uint64(1),
    )
    out |= _pack_payload(v & mask, lens, widths, offs + head, total)
    if highs.size:
        # patch positions (u8 in-block indexes), then high-part varints
        inb = (np.arange(v.size, dtype=np.int64) - np.repeat(bstarts, lens))
        ppos_base = offs + head + payload_bytes
        exc_rank = np.cumsum(exc) - 1  # rank among all exceptions
        exc_first = np.zeros(nb, dtype=np.int64)
        np.add.at(exc_first, exc_block, 1)
        exc_start = np.concatenate(([0], np.cumsum(exc_first)[:-1]))
        within = exc_rank[exc] - exc_start[exc_block]
        out[ppos_base[exc_block] + within] = inb[exc].astype(np.uint8)
        hbuf = np.frombuffer(varint_encode(highs), dtype=np.uint8)
        hcum = np.concatenate(([0], np.cumsum(hlens)))
        hstart_block = np.zeros(nb, dtype=np.int64)
        np.add.at(hstart_block, exc_block, hlens)
        hblock_base = ppos_base + n_exc
        # byte start of each exception's varint: block base + bytes of
        # earlier exceptions in the same block
        hcum_block_start = np.concatenate(
            ([0], np.cumsum(hstart_block)[:-1])
        )
        estart = (
            hblock_base[exc_block]
            + (hcum[:-1] - hcum_block_start[exc_block])
        )
        pos = np.repeat(estart, hlens) + (
            np.arange(hcum[-1]) - np.repeat(hcum[:-1], hlens)
        )
        out[pos] = hbuf
    return out.tobytes(), offs


def pfor_decode_stream(
    buf: bytes | np.ndarray,
    offs: np.ndarray,
    lens: np.ndarray,
    sel: np.ndarray,
    *,
    restarts: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode selected PFOR blocks — same contract as for_decode_stream."""
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
    b0 = raw[offs[sel]].astype(np.int64)
    widths = b0 & 0x7F
    has_exc = b0 >> 7
    n_exc = np.where(has_exc > 0, raw[offs[sel] + has_exc], 0).astype(
        np.int64
    )
    if restarts:
        firsts, flens = _varints_at(raw, offs[sel] + 1 + has_exc)
        head = 1 + has_exc + flens
    else:
        firsts, head = None, 1 + has_exc
    pay_off = offs[sel] + head
    sl = lens[sel]
    out = np.zeros(int(sl.sum()), dtype=np.uint64)
    val_starts = np.concatenate(([0], np.cumsum(sl)[:-1]))
    _unpack_payload(raw, pay_off, widths, sl, out, val_starts)
    # patch exceptions — ONE windowed pass: a block's <=7 high-part
    # varints are contiguous, so gather a (kmax·10)-byte window per live
    # block, find varint boundaries from the continuation bits, and
    # scatter-add the 7-bit payloads by (block, varint index). Replaces
    # the per-round _varints_at loop (up to 7 rounds of small-array numpy
    # overhead — the round-3 'PFOR slower than varint' hot spot).
    ppos_base = pay_off + ((sl * widths + 7) >> 3)
    live = np.flatnonzero(n_exc > 0)
    if live.size:
        rsz = raw.size
        ne = n_exc[live]
        kmax = int(ne.max())
        pos_in_block = raw[
            np.minimum(ppos_base[live][:, None] + np.arange(kmax), rsz - 1)
        ].astype(np.int64)
        wbytes = kmax * _MAX_VARINT_BYTES
        win = raw[
            np.minimum(
                (ppos_base + n_exc)[live][:, None] + np.arange(wbytes),
                rsz - 1,
            )
        ]
        is_last = (win & 0x80) == 0
        starts_f = np.empty_like(is_last)
        starts_f[:, 0] = True
        starts_f[:, 1:] = is_last[:, :-1]
        vid = np.cumsum(starts_f, axis=1) - 1  # varint index of each byte
        col = np.arange(wbytes)
        vstart = np.maximum.accumulate(np.where(starts_f, col, 0), axis=1)
        keep = vid < ne[:, None]  # real varint bytes only
        rows_k, cols_k = np.nonzero(keep)
        contrib = (win[keep] & np.uint8(0x7F)).astype(np.uint64) << (
            np.uint64(7) * (cols_k - vstart[keep]).astype(np.uint64)
        )
        highs = np.zeros((live.size, kmax), dtype=np.uint64)
        # disjoint 7-bit lanes: add == bitwise-or, stays exact in uint64
        np.add.at(highs, (rows_k, vid[keep]), contrib)
        jmask = np.arange(kmax)[None, :] < ne[:, None]
        tgt = (val_starts[live][:, None] + pos_in_block)[jmask]
        out[tgt] |= (
            highs << widths[live].astype(np.uint64)[:, None]
        )[jmask]
    if restarts:
        abs_docs = segmented_cumsum_decode(out, sl) + np.repeat(
            firsts.astype(np.int64), sl
        )
        return abs_docs, sl
    return out.astype(np.int64), sl


# ---------------------------------------------------------------------------
# Mixed-tier codec resolution: a manifest either carries ONE codec for all
# chunks (the common case) or per-chunk overrides written by
# compact_index(codec=...) — the Lucene-style tiering where freshly appended
# serving chunks stay varint (cheapest per-call decode) while compacted cold
# chunks take the packed PFOR layout (smallest bytes, best for bulk decode
# paths like Searcher.search_batch and merges).  Decode call-sites accept
# ``str | dict`` and resolve per chunk with codec_of(); the dict keeps the
# manifest default under key -1.
# ---------------------------------------------------------------------------


def codec_of(codec: "str | dict", chunk: int) -> str:
    """Effective codec for ``chunk``: pass-through for a uniform str,
    per-chunk lookup (default under -1) for a mixed-tier map."""
    if isinstance(codec, str):
        return codec
    return codec.get(int(chunk)) or codec[-1]


def index_codec(man: dict) -> "str | dict":
    """Manifest -> uniform codec str, or a {chunk: codec, -1: default} map
    when any committed chunk entry carries its own ``codec`` (mixed-tier
    index). Chunks without an override inherit the manifest default."""
    base = man.get("codec", "varint")
    per = {
        int(cid): v["codec"]
        for cid, v in man.get("chunks", {}).items()
        if isinstance(v, dict) and v.get("codec") and v["codec"] != base
    }
    if not per:
        return base
    per[-1] = base
    return per
