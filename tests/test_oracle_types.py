"""Registry-wide oracle output-type gate.

The driver hashes query output values WITHOUT normalizing DuckDB
HUGEINT (what ``SUM(BIGINT)`` promotes to) or DECIMAL, while Python's
``==`` treats ``2``, ``2.0`` and ``Decimal(2)`` as equal -- so a
value-exact local compare is structurally blind to exactly the drift
that made `kmeans_cluster_stats`, `record_linkage_summary` and
`dup_span_stats` hash-red in rounds 4 AND 5. This meta-test makes the
whole class unrepresentable: no registered oracle may emit a
HUGEINT/DECIMAL column (nested occurrences included). It fails if the
round-6 ``CAST(... AS BIGINT)`` fixes are ever reverted.

DuckDB binds the relation lazily, so checking ``rel.types`` costs a
plan, not an execution -- the full 152-oracle sweep runs in seconds.
"""

from __future__ import annotations

from etl_on_weather_dataset_spark.plans import registry

from .conftest import SF_SMOKE
from .oracle_harness import duck_connection


def test_no_oracle_emits_hugeint_or_decimal():
    oracles = registry.all_oracle_sql()
    assert len(oracles) >= 150, "registry unexpectedly shrank"
    con = duck_connection(SF_SMOKE)
    offenders: list[tuple[str, str, str]] = []
    try:
        for name, sql in sorted(oracles.items()):
            rel = con.sql(sql)
            for col, typ in zip(rel.columns, rel.types):
                t = str(typ).upper()
                if "HUGEINT" in t or "DECIMAL" in t:
                    offenders.append((name, col, t))
    finally:
        con.close()
    assert not offenders, (
        "oracles emitting driver-hash-unsafe types (wrap the aggregate "
        f"in CAST(... AS BIGINT)): {offenders}"
    )
