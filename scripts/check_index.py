"""Verify an index's physical artifacts against its manifest (the Lucene
CheckIndex analogue — dhr_spark/index/check.py).

    python scripts/check_index.py --index-dir /path/to/idx [--decode]

Prints one JSON report line; exit status 1 when corruption is found.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--decode", action="store_true",
                   help="also round-trip one chunk's posting blobs through "
                        "the varint decoder (codec invariant)")
    p.add_argument("--master", default="local[8]")
    args = p.parse_args()

    from dhr_spark.session import get_spark
    from dhr_spark.index.check import check_index

    spark = get_spark(master=args.master)
    report = check_index(spark, args.index_dir, decode=args.decode)
    print(json.dumps(report))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
