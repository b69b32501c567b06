"""Landing-zone ingestion utilities (SURVEY.md par.2a S1/S2).

The reference's extract task downloads a Kaggle dataset zip and
extracts it (ETL.py:29-43). Dataset download is deployment-specific
and out of engine scope; what the engine owns is the landing step:
validate + extract an archive into the directory Spark reads.

Mirrors ETL.py:35-40 semantics: a non-zip input raises instead of
being silently skipped.
"""

from __future__ import annotations

import zipfile
from pathlib import Path


def land_zip(archive_path: str | Path, dest_dir: str | Path) -> list[Path]:
    """Validate and extract ``archive_path`` into ``dest_dir``;
    returns the extracted file paths. Raises ValueError on a non-zip
    (ETL.py:39-40 intent)."""
    archive_path = Path(archive_path)
    dest_dir = Path(dest_dir)
    if not zipfile.is_zipfile(archive_path):
        raise ValueError(f"{archive_path} is not a valid zip archive")
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest_resolved = dest_dir.resolve()
    with zipfile.ZipFile(archive_path) as zf:
        # Refuse path traversal: every member must land inside dest_dir.
        # is_relative_to (not str.startswith) so a sibling dir sharing
        # the dest prefix ('/x/land' vs '/x/land_evil') can't slip by;
        # symlink members are refused outright (a link pointing outside
        # would redirect later members' writes).
        for info in zf.infolist():
            if (info.external_attr >> 16) & 0o170000 == 0o120000:
                raise ValueError(
                    f"archive member is a symlink: {info.filename}"
                )
            target = (dest_dir / info.filename).resolve()
            if not target.is_relative_to(dest_resolved):
                raise ValueError(
                    f"archive member escapes dest dir: {info.filename}"
                )
        zf.extractall(dest_dir)
        return [dest_dir / m for m in zf.namelist()]
