"""Synthesize the weather fixture from FIXTURES.md par.B: the
reference's Kaggle input shape (hourly observations) with injected
dirt -- duplicates, nulls in critical columns, unparseable timestamps,
boundary wind speeds, mode ties -- plus a dirty variant with
out-of-range rows that must fail validation.

Deterministic (seeded), pure python + csv. Lives in the package (not
tests/) because the driver-facing `weather_pipeline_monthly` query and
its DuckDB oracle both consume the generated CSV.
"""

from __future__ import annotations

import csv
import random
from pathlib import Path

from .schemas import WEATHER_RAW_SCHEMA

COLUMNS = [f.name for f in WEATHER_RAW_SCHEMA.fields]

# Beaufort boundary values (ETL.py:81-102) -- each must land in the
# lower bucket (<= semantics).
BOUNDARY_WINDS = [1.5, 3.3, 5.4, 7.9, 10.7, 13.8, 17.1, 20.7, 24.4,
                  28.4, 32.6, 40.0]


def _rows(dirty: bool) -> list[dict]:
    rng = random.Random(42)
    rows: list[dict] = []

    def emit(ts: str, **over) -> dict:
        r = {
            "Formatted Date": ts,
            "Summary": "Partly Cloudy",
            "Precip Type": rng.choice(["rain", "snow"]),
            "Temperature (C)": round(rng.uniform(-20, 35), 2),
            "Apparent Temperature (C)": round(rng.uniform(-25, 35), 2),
            "Humidity": round(rng.uniform(0.2, 1.0), 2),
            "Wind Speed (km/h)": round(rng.uniform(0, 35), 2),
            "Wind Bearing (degrees)": float(rng.randrange(0, 360)),
            "Visibility (km)": round(rng.uniform(0, 16), 2),
            "Loud Cover": 0.0,
            "Pressure (millibars)": round(rng.uniform(980, 1040), 2),
            "Daily Summary": "Mostly cloudy throughout the day.",
        }
        r.update(over)
        rows.append(r)
        return r

    # 3 months x 28 days x 4 obs/day, tz-offset timestamps like the
    # real dataset ("2006-04-01 00:00:00.000 +0200")
    for month in (4, 5, 6):
        for day in range(1, 29):
            for hour in (0, 6, 12, 18):
                emit(f"2006-{month:02d}-{day:02d} {hour:02d}:00:00.000 +0200")

    # Beaufort boundary winds (one per value, distinct days)
    for i, w in enumerate(BOUNDARY_WINDS):
        emit(f"2006-04-{i+1:02d} 03:00:00.000 +0200",
             **{"Wind Speed (km/h)": w})

    # exact duplicates (D1): duplicate every 20th row verbatim
    rows.extend([dict(r) for r in rows[::20]])

    # nulls in critical columns (I1); Temperature gets an even non-null
    # count so the interpolated median is exercised
    for i in (3, 23, 43, 63):
        rows[i]["Temperature (C)"] = None
    for i in (7, 27):
        rows[i]["Humidity"] = None
    for i in (11,):
        rows[i]["Wind Speed (km/h)"] = None
    for i in (15, 35):
        rows[i]["Visibility (km)"] = None
    for i in (19,):
        rows[i]["Pressure (millibars)"] = None

    # unparseable timestamps (P1) -> must become null and not crash
    emit("not-a-real-timestamp")
    emit("2006-13-45 99:99:99")

    # Precip Type dirt: null runs + an all-null month is impossible
    # here (3 active months), but inject a null stretch (A2 ignores)
    for i in (2, 4, 6, 8):
        rows[i]["Precip Type"] = None

    if dirty:
        # out-of-range rows per ETL.py:151-153 -- validation must fail
        emit("2006-05-02 01:00:00.000 +0200",
             **{"Temperature (C)": 7000.0})     # breaks the daily mean
        emit("2006-05-03 01:00:00.000 +0200",
             **{"Humidity": 25.0})               # breaks the daily mean
        emit("2006-05-04 01:00:00.000 +0200",
             **{"Wind Speed (km/h)": -4000.0})   # breaks the daily mean
    return rows


def write_fixture(path: str | Path, dirty: bool = False) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=COLUMNS)
        w.writeheader()
        for r in _rows(dirty):
            w.writerow({k: ("" if v is None else v) for k, v in r.items()})
    return path


def fixture_dir() -> Path:
    """Stable writable location for the driver-facing fixture: the
    Spark query and its DuckDB oracle SQL must both read one absolute
    path, and the oracle string is built per-process, so the path only
    has to be stable within a process. Resolution order:

    1. ``$SPARK_GRAFT_FIXTURE_DIR`` (explicit override),
    2. repo-local ``.fixtures`` next to the package when writable
       (no per-invocation garbage, survives process boundaries),
    3. a per-user tempdir fallback so a read-only install still works.
    """
    import os
    import tempfile

    if env := os.environ.get("SPARK_GRAFT_FIXTURE_DIR"):
        return Path(env)
    repo_local = Path(__file__).resolve().parents[1] / ".fixtures"
    if os.access(repo_local.parent, os.W_OK):
        return repo_local
    return Path(tempfile.gettempdir()) / f"spark_graft_fixtures_{os.getuid()}"


def ensure_clean_fixture() -> Path:
    """Write the clean weather CSV to its stable path (idempotent --
    content is deterministic; unconditional rewrite keeps a stale file
    from surviving generator changes). ~1.5k rows, <5 ms."""
    return write_fixture(fixture_dir() / "weatherHistory.csv", dirty=False)
