"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query in Spark and its oracle SQL in DuckDB over the
same parquet tables, then compares row count, column names, values
(column-name-sorted, row-sorted, exact) AND output types.

The type check exists because value-exactness alone is provably WEAKER
than the driver's hash on one axis: Python compares ``2 == 2.0`` and
``int == Decimal`` as equal, so representation drift (DuckDB HUGEINT
from ``SUM(BIGINT)``, DECIMAL) is invisible to a pure value compare
but hash-red at the driver. That exact gap produced the r4+r5 red rows
(kmeans_cluster_stats, record_linkage_summary, dup_span_stats), so
``compare`` now rejects HUGEINT/DECIMAL oracle columns outright and
requires family-level type parity, allowing only the widenings proven
green in driver artifacts (int<->bigint, timestamp<->date).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


import datetime


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object and s.map(
            lambda v: v is None or isinstance(v, datetime.date)
        ).all() and s.notna().any():
            # Spark DATE -> datetime.date objects; DuckDB DATE ->
            # datetime64. Normalize both to datetime64[us].
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_extension_array_dtype(s):
            df[c] = s.astype(object).where(s.notna(), None)
    sort_cols = list(df.columns)
    df = df.sort_values(
        by=sort_cols, kind="mergesort", na_position="last"
    ).reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


#: Scalar-type families proven hash-compatible at the driver. Members
#: of the same family may differ between Spark and DuckDB (evidence in
#: CORRECTNESS_r05: ``logreg_trained_weights`` is int-vs-BIGINT green,
#: ``weekly_cohort_retention`` is timestamp-vs-DATE green). Anything
#: crossing families -- or HUGEINT/DECIMAL anywhere -- fails here.
_TYPE_FAMILIES = {
    "tinyint": "int", "smallint": "int", "int": "int",
    "integer": "int", "bigint": "int", "byte": "int",
    "short": "int", "long": "int",
    "float": "float", "double": "float", "real": "float",
    "string": "str", "varchar": "str", "text": "str", "char": "str",
    "boolean": "bool", "bool": "bool",
    "date": "temporal",
}


def _type_family(t: str) -> str:
    t = t.strip().lower()
    base = t.split("(")[0].strip()
    if base.startswith(("timestamp", "datetime")):
        return "temporal"
    if any(m in t for m in ("<", "[", "struct", "map(", "list")):
        return "nested"
    return _TYPE_FAMILIES.get(base, f"other:{base}")


def assert_type_parity(
    spark_dtypes: list[tuple[str, str]],
    rel: "duckdb.DuckDBPyRelation",
    name: str = "query",
) -> None:
    """Fail on any output type the driver's hash is known to reject.

    HUGEINT/DECIMAL (even nested) are banned outright -- the driver
    hashes them differently from the int they numerically equal, the
    root cause of the r4+r5 red rows. All other columns must agree at
    type-family granularity (see _TYPE_FAMILIES).
    """
    otypes = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    stypes = dict(spark_dtypes)
    offenders = [
        (c, t) for c, t in otypes.items()
        if "hugeint" in t.lower() or "decimal" in t.lower()
    ]
    offenders += [
        (c, t) for c, t in stypes.items()
        if "decimal" in t.lower()
    ]
    assert not offenders, (
        f"{name}: HUGEINT/DECIMAL output column(s) {offenders} -- the "
        "driver's value hash does not normalize these (CAST the "
        "aggregate to BIGINT / DOUBLE in the oracle SQL)"
    )
    drift = [
        (c, stypes[c], otypes[c])
        for c in sorted(set(stypes) & set(otypes))
        if _type_family(stypes[c]) != _type_family(otypes[c])
    ]
    assert not drift, (
        f"{name}: cross-family output type drift (spark, oracle): "
        f"{drift} -- only int<->bigint and timestamp<->date widenings "
        "are proven driver-hash-safe"
    )


def compare(spark_df, oracle: str, sf_dir: str, name: str = "query") -> None:
    spdf = spark_df.toPandas()
    con = duck_connection(sf_dir)
    rel = con.sql(oracle)
    assert_type_parity(spark_df.dtypes, rel, name=name)
    odf = rel.df()
    con.close()

    assert sorted(spdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} "
        f"oracle={sorted(odf.columns)}"
    )
    assert len(spdf) == len(odf), (
        f"{name}: row count spark={len(spdf)} oracle={len(odf)}"
    )
    s = _normalize(spdf)
    o = _normalize(odf)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(sv, ov))
            if not _values_equal(x, y)
        ]
        assert not bad, (
            f"{name}: column {c!r} differs at {len(bad)} row(s); "
            f"first: {bad[:5]}"
        )
