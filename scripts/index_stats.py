"""spark-submit entry: inspect a built index (manifest, sizes, vocabulary).

    python scripts/index_stats.py --index-dir /tmp/idx [--top-terms 20]

Prints one JSON object: manifest stats, on-disk bytes per artifact,
per-chunk lineage summary (postings/bytes/skew), and the highest-df terms —
the operational "what is this index" report for a 10^12-turn deployment.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--top-terms", type=int, default=20)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from dhr_spark.index.builder import list_snapshots, load_manifest
    from dhr_spark.session import get_spark

    man = load_manifest(args.index_dir)
    if man is None:
        raise SystemExit(f"no manifest in {args.index_dir}")

    spark = get_spark(app_name="dhr_index_stats", master=args.master)
    td = spark.read.parquet(
        os.path.join(args.index_dir, man.get("term_dict_dir", "term_dict"))
    )
    top = [
        {"term": r["term"], "df": int(r["df"]),
         "idf": round(float(r["idf"]), 4)}
        for r in td.orderBy("term_id").limit(args.top_terms).collect()
    ]
    chunks = man.get("chunks", {})
    sizes = {
        name: _du(os.path.join(args.index_dir, name))
        for name in ("segments", "doclens", "doc_map", "forward")
        if os.path.isdir(os.path.join(args.index_dir, name))
    }
    sizes["term_dict"] = _du(
        os.path.join(args.index_dir, man.get("term_dict_dir", "term_dict"))
    )
    postings = sum(c["postings"] for c in chunks.values())
    out = {
        "manifest": {k: v for k, v in man.items() if k != "chunks"},
        "n_chunks": len(chunks),
        "total_postings": postings,
        "compressed_postings_bytes": sum(c["bytes"] for c in chunks.values()),
        "bytes_per_posting": round(
            sum(c["bytes"] for c in chunks.values()) / postings, 3
        ) if postings else None,
        "max_chunk_skew_ratio": max(
            (c["skew_ratio"] for c in chunks.values()), default=None
        ),
        "disk_bytes": sizes,
        "top_terms": top,
        "snapshots": list_snapshots(args.index_dir),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
