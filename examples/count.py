#!/usr/bin/env python
"""Count the nodes, ways and relations in a PBF file (or the golden
fixture when no file is given) — the engine's rendering of the
reference's flagship example (/root/reference/examples/count.rs:1-34).

The reference's par_map_reduce monoid is exactly what Catalyst plans for
groupBy().count(): per-partition partial aggregation, then a final merge.

    python examples/count.py [file.osm.pbf]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmpbf_spark.api import Engine
from osmpbf_spark.session import get_spark


def main():
    spark = get_spark("count-example")
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 1:
        with open(sys.argv[1], "rb") as f:
            data = f.read()
    else:
        from osmpbf_spark.sources.fixtures import fixture_file_bytes
        data = fixture_file_bytes("zlib_dense")
    eng = Engine.from_pbf_bytes(spark, "input", data)

    print("Counting...")
    counts = {r["element_type"]: r["cnt"]
              for r in eng.count_by_type().collect()}
    print(f"Nodes: {counts.get('node', 0)}")
    print(f"Ways: {counts.get('way', 0)}")
    print(f"Relations: {counts.get('relation', 0)}")
    spark.stop()


if __name__ == "__main__":
    main()
