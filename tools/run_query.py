"""Run any registered query from the command line.

The user-facing entry point for ad-hoc runs: list every registered
query (with its coverage tags), or execute one against a testdata
scale directory and print the result -- the "switch from the
reference and run what you ran today" surface, without writing a
driver script.

Usage:
    python tools/run_query.py --list [--filter substr]
    python tools/run_query.py <name> [--sf /root/testdata/sf0.01]
        [--limit 20] [--explain] [--oracle]

--explain prints the formatted physical plan instead of rows;
--oracle additionally runs the DuckDB twin side-by-side and reports
row-count agreement (the driver's gate, on demand).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registered query name")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--filter", default="")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--oracle", action="store_true")
    args = ap.parse_args()

    from etl_on_weather_dataset_spark.plans import registry

    registry._load_all()
    if args.list or not args.name:
        for n, spec in sorted(registry.REGISTRY.items()):
            if args.filter and args.filter not in n:
                continue
            tags = ", ".join(spec.covers)
            flag = " [ext]" if spec.extended else ""
            print(f"{n}{flag}  --  {tags}")
        return 0

    if args.name not in registry.REGISTRY:
        print(f"unknown query {args.name!r}; --list shows all",
              file=sys.stderr)
        return 2

    from etl_on_weather_dataset_spark.session import get_spark

    spark = get_spark(app_name=f"run_{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry.REGISTRY[args.name].spark_fn(spark, args.sf)
    if args.explain:
        print(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        ))
    else:
        df.show(args.limit, truncate=False)
        print(f"({df.count()} rows total)")
    if args.oracle:
        sql = registry._resolve_oracle(registry.REGISTRY[args.name])
        if sql is None:
            print("no SQL oracle for this query (hash-internal op)")
        else:
            from tests.oracle_harness import duck_connection

            con = duck_connection(args.sf)
            n = len(con.sql(sql).fetchall())
            con.close()
            ok = n == df.count()
            print(f"oracle rows: {n}  spark rows: {df.count()}  "
                  f"{'MATCH' if ok else 'MISMATCH'}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
