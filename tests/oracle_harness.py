"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query in Spark and its oracle SQL in DuckDB over the
same parquet tables, then compares row count, column names, and values
(column-name-sorted, row-sorted, exact) -- stricter than the driver's
hash so any divergence shows up with a diff here first.
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


def compare(spark_df, oracle: str, sf_dir: str, name: str = "query") -> None:
    spdf = spark_df.toPandas()
    con = duck_connection(sf_dir)
    odf = con.sql(oracle).df()
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
