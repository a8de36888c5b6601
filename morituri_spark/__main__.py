"""comm2osm-equivalent command surface (comm2osm.cpp:18-81):

    python -m morituri_spark [OPTIONS] INFILE [OUTFILE]

INFILE is a directory of NAVSTREETS-shaped tables (parquet; see
sources/tables.py for the expected layer names). OUTFILE selects the OSM
sink by suffix — .osm / .pbf / .opl, optionally +.gz/.bz2 (io/sink.py).
Plugin dispatch mirrors the reference's main(): every registered plugin is
offered the input and the first acceptor executes (plugins.py).
"""

from __future__ import annotations

import argparse
import json
import sys

from .plugins import default_registry, run_plugins
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m morituri_spark",
        description="Convert NAVSTREETS-shaped commercial data to OSM "
        "(PySpark re-implementation of comm2osm).",
    )
    ap.add_argument("input", help="input directory (NAVSTREETS-shaped tables)")
    ap.add_argument("output", nargs="?", default=None,
                    help="optional OSM output file (.osm/.pbf/.opl[.gz|.bz2])")
    ap.add_argument("--master", default=None,
                    help="Spark master (default local[$SPARK_GRAFT_CPUS])")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    spark = get_spark("comm2osm", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    default_registry()
    result = run_plugins(spark, args.input, args.output)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
