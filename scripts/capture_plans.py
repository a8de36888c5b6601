"""Capture .explain('formatted') output for named declared queries.

Usage:
    python scripts/capture_plans.py <repo_root> <out_dir> <suffix> q1 q2 ...

Runs each queries()[name](spark, sf0.001) builder from <repo_root>'s
__spark_entry__.py and writes <out_dir>/<name>_<suffix>.txt. Builders may
run tiny jobs (localCheckpoint) at sf0.001 — that is fine; explain itself
runs no job. Used for the plans/r06/ before/after evidence.
"""

from __future__ import annotations

import importlib.util
import io
import sys
from contextlib import redirect_stdout
from pathlib import Path


def main() -> None:
    repo, out_dir, suffix = sys.argv[1], Path(sys.argv[2]), sys.argv[3]
    names = sys.argv[4:]
    sys.path.insert(0, repo)
    spec = importlib.util.spec_from_file_location(
        "entrymod", f"{repo}/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from morituri_spark.session import get_spark

    spark = get_spark("plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
