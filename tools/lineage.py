"""Column-level source lineage for registered queries, from live plans.

For each query, parse the optimized physical plan's parquet scans:
which TABLES it reads and which COLUMNS actually survive column
pruning (the scan's ReadSchema -- ground truth, not prose). The
output is the impact-analysis table a platform team needs before a
schema change: "who reads documents.text?" is one grep of this
tool's output.

Usage:
    python tools/lineage.py [--sf /root/testdata/sf0.001]
        [--query NAME] [--column table.col]

--column inverts the report: list every query whose scans include
that column.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _top_level_fields(schema: str) -> list[str]:
    """Field names of a ReadSchema struct<...> body (nested types
    skipped over by angle-bracket depth)."""
    fields, depth, token = [], 0, ""
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(token.split(":")[0].strip())
            token = ""
            continue
        token += ch
    if token.strip():
        fields.append(token.split(":")[0].strip())
    return fields


def scan_lineage(plan: str) -> dict[str, set[str]]:
    """table -> columns read, parsed from Location + ReadSchema pairs
    of every parquet scan node in a formatted plan."""
    out: dict[str, set[str]] = defaultdict(set)
    # each scan detail block carries Location: ...[file:...table.parquet]
    # and ReadSchema: struct<...>
    blocks = re.split(r"\(\d+\) Scan parquet", plan)[1:]
    for b in blocks:
        loc = re.search(r"Location:.*?([a-z_]+)\.parquet", b)
        rs = re.search(r"ReadSchema: struct<(.*?)>\s*$", b, re.MULTILINE)
        if not loc or loc.group(1) not in TABLES:
            continue
        cols = _top_level_fields(rs.group(1)) if rs else []
        out[loc.group(1)] |= set(cols)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--query", default=None)
    ap.add_argument("--column", default=None,
                    help="table.col -> list readers")
    args = ap.parse_args()

    from etl_on_weather_dataset_spark.operators.caching import release_all
    from etl_on_weather_dataset_spark.plans import registry
    from etl_on_weather_dataset_spark.session import get_spark

    registry._load_all()
    spark = get_spark(app_name="lineage")
    spark.sparkContext.setLogLevel("ERROR")

    names = [args.query] if args.query else sorted(registry.REGISTRY)
    readers: dict[str, list[str]] = defaultdict(list)
    for n in names:
        spec = registry.REGISTRY[n]
        try:
            df = spec.spark_fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001 -- report, keep going
            print(f"{n}: plan failed ({str(e)[:80]})", file=sys.stderr)
            continue
        finally:
            release_all()
        lin = scan_lineage(plan)
        if not args.column:
            cols = "; ".join(
                f"{t}[{', '.join(sorted(cs))}]"
                for t, cs in sorted(lin.items())
            )
            print(f"{n}: {cols or '(no direct table scan)'}")
        for t, cs in lin.items():
            for c in cs:
                readers[f"{t}.{c}"].append(n)

    if args.column:
        hits = readers.get(args.column, [])
        print(f"{args.column}: {len(hits)} reader(s)")
        for n in hits:
            print(f"  {n}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
