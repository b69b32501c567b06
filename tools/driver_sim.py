#!/usr/bin/env python
"""Fresh-process replica of the driver's CORRECTNESS gate.

Runs `__spark_entry__.entry/queries/oracle_sql` exactly like the
driver: every driver-visible query executes in Spark AND (when an
oracle exists) in DuckDB over the same parquet tables; compares row
count, column-name set, and an order-insensitive value hash.

Comparison: tests/oracle_harness.compare -- value-exact on
column-name-sorted, row-sorted frames with date/tz normalization,
PLUS a type-parity gate (HUGEINT/DECIMAL rejected; cross-family type
drift rejected). Value-exactness alone proved weaker than the
driver's hash in rounds 4-5 (HUGEINT columns pass ``2 == 2.0``
locally but hash red at the driver); the type gate closes that axis.
No local harness can be *proven* equivalent to the driver's hash --
treat a green run here as necessary, not sufficient.

Usage:  python tools/driver_sim.py [sf_dir]        (default sf0.01)
Exit 0 iff every oracle-backed query matches.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as e
    from etl_on_weather_dataset_spark.operators.caching import release_all
    from etl_on_weather_dataset_spark.session import get_spark
    from tests.oracle_harness import compare

    spark = get_spark(app_name="driver_sim")
    spark.sparkContext.setLogLevel("ERROR")

    n = e.entry(spark).count()
    assert n > 0, "entry() returned no rows"
    print(f"entry: {n} rows", flush=True)

    queries = e.queries()
    oracles = e.oracle_sql()
    results: dict[str, dict] = {}
    failures = 0
    t_start = time.time()
    for name, fn in queries.items():
        release_all()  # drop prior query's operator-internal caches
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                nrows = sdf.count()
                results[name] = {"spark_rows": nrows, "err": "no_oracle"}
                print(f"rows  {name}: {nrows} rows "
                      f"({time.time()-t0:.1f}s)", flush=True)
                continue
            compare(sdf, oracles[name], sf_dir, name=name)
        except AssertionError as ex:
            results[name] = {"err": f"mismatch: {ex}"}
            failures += 1
            print(f"FAIL  {name}: {str(ex)[:300]}", flush=True)
            continue
        except Exception as ex:  # noqa: BLE001
            results[name] = {"err": f"error: {ex}"}
            failures += 1
            print(f"FAIL  {name}: error {str(ex)[:300]}", flush=True)
            continue
        results[name] = {"match": True}
        print(f"MATCH {name} ({time.time()-t0:.1f}s)", flush=True)

    spark.stop()
    n_oracle = sum(1 for n in queries if n in oracles)
    n_green = sum(1 for r in results.values() if r.get("match"))
    print(json.dumps({
        "queries": len(queries),
        "oracle_backed": n_oracle,
        "green": n_green,
        "failures": failures,
        "total_sec": round(time.time() - t_start, 1),
    }))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
