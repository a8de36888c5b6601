"""Value-compare selected declared queries vs the DuckDB oracle at a
given SF (verify-skill recipe, parameterized). Usage:

    python scripts/sweep_some.py sf0.01 q1 q2 ...   # or 'all'
"""

from __future__ import annotations

import importlib.util
import sys


def main() -> None:
    sf = sys.argv[1]
    names = sys.argv[2:]
    sys.path.insert(0, "/root/repo")
    spec = importlib.util.spec_from_file_location(
        "entrymod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from morituri_spark.session import get_spark

    spark = get_spark("sweep-some", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = m.queries(), m.oracle_sql()
    if names == ["all"]:
        names = list(qs)
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('/root/testdata/{sf}/{t}.parquet')"
        )
    bad = []
    for name in names:
        try:
            got = qs[name](spark, f"/root/testdata/{sf}")
            if name in oracles:
                gp = got.toPandas()
                wp = con.execute(oracles[name]).df()
                cols = sorted(gp.columns)
                a = gp[cols].sort_values(cols).reset_index(drop=True).astype(str)
                b = wp[cols].sort_values(cols).reset_index(drop=True).astype(str)
                ok = a.equals(b)
                if not ok:
                    bad.append(name)
                print(
                    f"{name}: {len(a)} vs {len(b)}"
                    f" {'EQUAL' if ok else 'MISMATCH'}",
                    flush=True,
                )
            else:
                print(f"{name}: rows-only {got.count()}", flush=True)
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"{name}: ERR {type(e).__name__} {str(e)[:150]}", flush=True)
    print("BAD:", bad)


if __name__ == "__main__":
    main()
