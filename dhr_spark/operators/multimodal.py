"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Treats image/audio/video as `binary` columns moving through the same
DataFrame pipeline as text: metadata extraction, batched decode/feature
stages over mapInPandas (Arrow batches of bytes — the only sane way to move
blobs through Python), frame sampling as a pure column op.

Decode is REAL for the containers functions/media.py parses with pure
numpy — binary netpbm (P5/P6), uncompressed BMP, RIFF/WAV PCM16 — through
``image_decode_stats`` / ``audio_decode_stats`` and through
``decode_blob`` (which tries the numpy decoders first). Compressed
containers (PNG/JPEG/...) still need Pillow: without it ``decode_blob``
raises NotImplementedError for them, and ``fake=True`` selects the
deterministic byte-histogram stand-in. The Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is identical either way.

Scale notes: blobs dominate partition size — repartition by
``spark.sql.files.maxPartitionBytes``-friendly counts BEFORE mapInPandas so a
batch of blobs fits executor memory; never groupBy a blob column (metadata
keys only); push blob-free predicates first so pruned rows never cross the
Arrow boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

META_SCHEMA = (
    "doc_id long, n_bytes long, magic string, modality string"
)
FEATURE_SCHEMA = "doc_id long, n_bytes long, feature array<double>"

_MAGIC = {
    b"\x89PNG": ("png", "image"),
    b"\xff\xd8\xff": ("jpeg", "image"),
    b"RIFF": ("riff", "audio"),
    b"\x00\x00\x00": ("mp4?", "video"),
}


def with_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in payload: utf-8 bytes of the text column as `binary`. Real
    pipelines read the blob from object storage; the column type and
    downstream plumbing are identical."""
    return docs.withColumn("blob", F.encode(F.col(text_col), "utf-8"))


def blob_metadata(docs_with_blob: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_bytes, magic, modality): header sniff over mapInPandas.

    Arrow-batched; only (id, blob) crosses the boundary (column pruning)."""
    src = docs_with_blob.select(F.col(id_col).alias("doc_id"), "blob")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            magic, modality = [], []
            for b in blobs:
                head = bytes(b[:4]) if b is not None else b""
                for sig, (m, mod) in _MAGIC.items():
                    if head.startswith(sig):
                        magic.append(m)
                        modality.append(mod)
                        break
                else:
                    magic.append("raw")
                    modality.append("text")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0),
                    "magic": magic,
                    "modality": modality,
                }
            )

    return src.mapInPandas(extract, META_SCHEMA)


try:  # optional dependency: real image decode when Pillow is installed
    from PIL import Image as _PIL_Image
except ImportError:  # container default: stub path
    _PIL_Image = None


def decode_blob(payload: bytes) -> np.ndarray:
    """REAL decode to the FEATURE_DIM-bin L1-normalized luminance
    histogram. netpbm (P5/P6) and uncompressed BMP decode with the pure
    numpy parsers in functions/media.py; other containers fall back to
    Pillow when importable. Without Pillow a compressed container raises,
    and callers use ``fake=True`` for the byte-histogram stand-in."""
    from dhr_spark.functions.media import decode_image

    try:
        arr = decode_image(bytes(payload))
    except ValueError:
        if _PIL_Image is None:
            raise NotImplementedError(
                "compressed-image decode needs Pillow (netpbm/BMP decode "
                "natively; audio/video libs stay stubbed); use fake=True "
                "for the deterministic byte-histogram stand-in"
            ) from None
        import io

        img = _PIL_Image.open(io.BytesIO(payload)).convert("L")
        arr = np.asarray(img, dtype=np.uint8)
    hist = np.bincount((arr >> 4).ravel(), minlength=FEATURE_DIM).astype(
        np.float64
    )
    s = hist.sum()
    return np.round(hist / s, 6) if s else hist


def _fake_features(blobs: pd.Series) -> list[np.ndarray]:
    """Deterministic stand-in: 16-bin byte histogram, L1-normalized."""
    out = []
    for b in blobs:
        arr = np.frombuffer(bytes(b), dtype=np.uint8) if b else np.zeros(1, np.uint8)
        hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float64)
        s = hist.sum()
        out.append(np.round(hist / s, 6) if s else hist)
    return out


def blob_features(
    docs_with_blob: DataFrame, fake: bool = False, id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_bytes, feature array<double>): batched decode + featurize.

    The mapInPandas stage is the real plumbing; `fake=False` raises at task
    time (documented stub), `fake=True` yields the byte-histogram features."""
    src = docs_with_blob.select(F.col(id_col).alias("doc_id"), "blob")

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = _fake_features(pdf["blob"])
            else:
                feats = [decode_blob(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["blob"].map(len),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return src.mapInPandas(featurize, FEATURE_SCHEMA)


def blob_feature_rows(
    docs_with_blob: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, bin, cnt, n_bytes): the byte-histogram features as exploded
    integer rows — the driver-/oracle-comparable shape (arrays are unhashable
    in the harness's canonicalization; integer rows hash exactly).

    Same mapInPandas plumbing as blob_features; emits all FEATURE_DIM bins per
    doc (zeros included) so the row count is |docs| * 16 deterministically.
    The normalized feature of blob_features is cnt / n_bytes — recoverable,
    so this is a lossless re-representation of multimodal.py semantics."""
    src = docs_with_blob.select(F.col(id_col).alias("doc_id"), "blob")

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bins = np.arange(FEATURE_DIM, dtype=np.int64)
        for pdf in batches:
            ids, out_bins, cnts, nb = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                arr = (
                    np.frombuffer(bytes(b), dtype=np.uint8)
                    if b is not None and len(b)
                    else np.zeros(0, np.uint8)
                )
                hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.int64)
                ids.append(np.full(FEATURE_DIM, doc_id, dtype=np.int64))
                out_bins.append(bins)
                cnts.append(hist)
                nb.append(np.full(FEATURE_DIM, len(arr), dtype=np.int64))
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids),
                    "bin": np.concatenate(out_bins),
                    "cnt": np.concatenate(cnts),
                    "n_bytes": np.concatenate(nb),
                }
            )

    return src.mapInPandas(
        featurize, "doc_id long, bin long, cnt long, n_bytes long"
    )


def blob_resize_stats(
    docs_with_blob: DataFrame, factor: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_bytes, resized_bytes, resized_checksum): the resize /
    downsample stage of the multimodal pipeline with a deterministic
    byte-stride stand-in.

    A real image resize needs PIL (not in this container); the pipeline
    SHAPE is identical either way: Arrow batches of blobs in, smaller blobs
    out, metadata alongside. The stand-in keeps every ``factor``-th byte —
    deterministic and engine-portable, so the oracle can verify the length
    and a byte-sum checksum of the downsampled payload exactly. Swapping in
    `PIL.Image.resize` is a one-function change inside the same kernel."""
    src = docs_with_blob.select(F.col(id_col).alias("doc_id"), "blob")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_b, r_len, r_sum = [], [], []
            for b in pdf["blob"]:
                arr = (
                    np.frombuffer(bytes(b), dtype=np.uint8)
                    if b is not None and len(b)
                    else np.zeros(0, np.uint8)
                )
                small = arr[::factor]
                n_b.append(len(arr))
                r_len.append(len(small))
                r_sum.append(int(small.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": np.asarray(n_b, dtype=np.int64),
                    "resized_bytes": np.asarray(r_len, dtype=np.int64),
                    "resized_checksum": np.asarray(r_sum, dtype=np.int64),
                }
            )

    return src.mapInPandas(
        resize,
        "doc_id long, n_bytes long, resized_bytes long, resized_checksum long",
    )


def frame_sample(
    docs_with_blob: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, frame_idx, byte_offset): deterministic frame-sampling plan — pure
    column math (sequence + explode), no UDF. For video this is the keyframe
    offset table handed to the decode stage; here offsets stride the blob."""
    n = F.length(F.col("blob"))
    n_frames = F.least(F.ceil(n / every_n_bytes).cast("int"), F.lit(max_frames))
    return (
        docs_with_blob.select(F.col(id_col).alias("doc_id"), n.alias("n_bytes"), n_frames.alias("nf"))
        .filter(F.col("nf") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("nf") - 1)).alias("frame_idx"),
            "n_bytes",
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            (F.col("frame_idx") * every_n_bytes).cast("long").alias("byte_offset"),
        )
    )


def image_decode_stats(
    docs_with_blob: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, width, height, bin, cnt): REAL image decode over
    mapInPandas — functions/media.py parses the container (netpbm P5/P6 or
    uncompressed BMP), color reduces through the BT.601 integer luminance,
    and each doc emits all FEATURE_DIM luminance-histogram bins (zeros
    included, so the row count is |docs|·16 deterministically and the
    whole result is exact-integer oracle-hashable).

    Scale shape: identical to blob_feature_rows — Arrow batches of (id,
    blob) in, integer rows out, decode cost proportional to partition
    bytes; repartition upstream by blob size, never by decoded size."""
    src = docs_with_blob.select(F.col(id_col).alias("doc_id"), "blob")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dhr_spark.functions.media import decode_image

        bins = np.arange(FEATURE_DIM, dtype=np.int64)
        for pdf in batches:
            ids, ws, hs, out_bins, cnts = [], [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                lum = decode_image(bytes(b))
                h, w = lum.shape
                hist = np.bincount(
                    (lum >> 4).ravel(), minlength=FEATURE_DIM
                ).astype(np.int64)
                ids.append(np.full(FEATURE_DIM, doc_id, dtype=np.int64))
                ws.append(np.full(FEATURE_DIM, w, dtype=np.int64))
                hs.append(np.full(FEATURE_DIM, h, dtype=np.int64))
                out_bins.append(bins)
                cnts.append(hist)
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids),
                    "width": np.concatenate(ws),
                    "height": np.concatenate(hs),
                    "bin": np.concatenate(out_bins),
                    "cnt": np.concatenate(cnts),
                }
            )

    return src.mapInPandas(
        decode,
        "doc_id long, width long, height long, bin long, cnt long",
    )


def audio_decode_stats(
    docs_with_blob: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_samples, sample_rate, sum_abs, zero_crossings, peak):
    REAL RIFF/WAV PCM16 decode over mapInPandas (functions/media.py).
    Multi-channel audio reduces over channel 0 (documented; the synthetic
    corpus is mono). All columns are exact integers:

      sum_abs        Σ |s_i|                  (int64, loudness proxy)
      zero_crossings #{i : (s_{i-1} < 0) ≠ (s_i < 0)}
      peak           max |s_i|

    — the audio-featurization stage of a training-data pipeline
    (silence / clipping / energy filters) in oracle-hashable form."""
    src = docs_with_blob.select(F.col(id_col).alias("doc_id"), "blob")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dhr_spark.functions.media import decode_wav

        for pdf in batches:
            ids, ns, rates, sums, zcs, peaks = [], [], [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                samples, rate = decode_wav(bytes(b))
                if samples.ndim == 2:
                    samples = samples[:, 0]
                s = samples.astype(np.int64)
                neg = s < 0
                ids.append(doc_id)
                ns.append(s.size)
                rates.append(rate)
                sums.append(int(np.abs(s).sum()))
                zcs.append(int(np.count_nonzero(neg[1:] != neg[:-1])))
                peaks.append(int(np.abs(s).max()) if s.size else 0)
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "n_samples": np.asarray(ns, dtype=np.int64),
                    "sample_rate": np.asarray(rates, dtype=np.int64),
                    "sum_abs": np.asarray(sums, dtype=np.int64),
                    "zero_crossings": np.asarray(zcs, dtype=np.int64),
                    "peak": np.asarray(peaks, dtype=np.int64),
                }
            )

    return src.mapInPandas(
        decode,
        "doc_id long, n_samples long, sample_rate long, sum_abs long, "
        "zero_crossings long, peak long",
    )
