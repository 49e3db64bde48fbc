"""spark-submit entry: rebuild an index from its own stored fields — the
Elasticsearch ``_reindex`` analogue (index/reindex.py).

    spark-submit --py-files dhr_spark.zip scripts/reindex.py \\
        --src s3://bucket/index --dst s3://bucket/index_v2 \\
        [--analyzer simple] [--chunk-bits 20] [--block-size 128] \\
        [--positional] [--forward-index] [--no-stored]

Unset flags inherit the source manifest; docids are preserved and
tombstones compact away. Changing the analyzer of a 10^12-turn serving
index without the original corpus is the canonical use.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--analyzer", choices=["lucene", "simple"])
    p.add_argument("--chunk-bits",
                   type=lambda v: v if v == "auto" else int(v))
    p.add_argument("--block-size", type=int)
    p.add_argument("--positional", action="store_true", default=None)
    p.add_argument("--forward-index", action="store_true", default=None)
    p.add_argument("--no-stored", action="store_true",
                   help="drop stored fields in the destination")
    p.add_argument("--master", default="local[8]")
    args = p.parse_args()

    from dhr_spark.index.reindex import reindex
    from dhr_spark.session import get_spark

    overrides = {}
    if args.analyzer:
        overrides["analyzer_mode"] = args.analyzer
    if args.chunk_bits is not None:
        overrides["chunk_bits"] = args.chunk_bits
    if args.block_size is not None:
        overrides["block_size"] = args.block_size
    if args.positional:
        overrides["positional"] = True
    if args.forward_index:
        overrides["forward_index"] = True
    if args.no_stored:
        overrides["stored"] = False

    spark = get_spark(master=args.master)
    man = reindex(spark, args.src, args.dst, **overrides)
    print(json.dumps({
        "n_docs": man["n_docs"], "n_terms": man["n_terms"],
        "analyzer_mode": man["analyzer_mode"],
        "chunks": len(man["chunks"]),
        "build_seconds": man["build_seconds"],
    }))


if __name__ == "__main__":
    main()
