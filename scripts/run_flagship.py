#!/usr/bin/env python
"""spark-submit entry point for the flagship pipeline.

    spark-submit --py-files morituri_spark.zip scripts/run_flagship.py \
        [--images <parquet path>] [--zones <parquet path>] \
        --out /path/to/output [--n-synth 1000000] [--resume]

Without --images/--zones, deterministic synthetic inputs (seed=42) are
generated — the sandbox mode. Output is written with per-bucket lineage
(io/lineage.py) so a killed run resumes exactly: rerun the same command.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=None)
    ap.add_argument("--zones", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-synth", type=int, default=1_000_000)
    ap.add_argument("--res", type=int, default=10)
    ap.add_argument("--tile-res", type=int, default=7)
    ap.add_argument("--n-buckets", type=int, default=64)
    args = ap.parse_args()

    from morituri_spark.session import get_spark
    from morituri_spark.pipelines import flagship
    from morituri_spark.io import lineage
    from morituri_spark.sources import synth

    spark = get_spark("flagship")
    t0 = time.perf_counter()
    if args.images:
        images = spark.read.parquet(args.images)
    else:
        images = synth.images_table(spark, args.n_synth, with_payload=False)
    zones = spark.read.parquet(args.zones) if args.zones else synth.zones_table(spark)

    rolled = flagship.run_flagship(images, zones, res=args.res, tile_res=args.tile_res)
    stats = lineage.resumable_write(
        rolled, args.out, key_col="tile", n_buckets=args.n_buckets
    )
    dt = time.perf_counter() - t0
    print(json.dumps({"out": args.out, "seconds": round(dt, 2), **stats}))


if __name__ == "__main__":
    main()
