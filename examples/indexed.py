#!/usr/bin/env python
"""Count buildings and their nodes — the engine's rendering of the
reference's IndexedReader example (/root/reference/examples/indexed.rs:1-38).

The two-pass filtered semi-join (filter ways → collect referenced node
ids → re-scan matching nodes) becomes explode(refs).distinct() + a
broadcast LEFT SEMI join; Parquet/Iceberg stats supply the blob-range
pruning the reference implements by hand.

    python examples/indexed.py [file.osm.pbf]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmpbf_spark.api import Engine
from osmpbf_spark.operators.parity import tag_eq
from osmpbf_spark.session import get_spark


def main():
    spark = get_spark("indexed-example")
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 1:
        with open(sys.argv[1], "rb") as f:
            data = f.read()
    else:
        from osmpbf_spark.sources.fixtures import fixture_file_bytes
        data = fixture_file_bytes("zlib_dense")
    eng = Engine.from_pbf_bytes(spark, "input", data)

    print("Counting...")
    ways_f, nodes = eng.ways_and_deps(tag_eq("building", "yes"))
    print(f"ways:  {ways_f.count()}")
    print(f"nodes: {nodes.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
