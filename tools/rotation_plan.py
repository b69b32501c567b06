"""Compute the next round's driver-window rotation from artifacts.

The driver records CORRECTNESS rows for at most registry.DRIVER_CAP
queries per round; the round-robin policy (registry.py ROTATE_IN/OUT)
must eventually give every registered query a green row. This tool
derives the suggested next-round window mechanically so the swap is a
paste, not an audit:

- PINNED: the always-visible flagships (non-extended, in neither
  rotation set) -- never rotate;
- MUST-IN: queries with a RED row in the latest CORRECTNESS artifact
  (re-attest after fixing), then never-attested queries in
  registration order;
- PARK: everything currently in ROTATE_IN that is not kept.

Usage:  python tools/rotation_plan.py
Prints the suggested ROTATE_IN block and the leftover backlog (the
round-after-next's documented rotation). Purely advisory -- the
registry edit (and its documented rationale) stays manual.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_on_weather_dataset_spark.plans import registry  # noqa: E402


def main() -> None:
    repo = pathlib.Path(__file__).resolve().parent.parent
    artifacts = sorted(repo.glob("CORRECTNESS_r*.json"))
    if not artifacts:
        print("no CORRECTNESS artifacts; nothing to plan")
        return
    attested: set[str] = set()
    for p in artifacts:
        doc = json.loads(p.read_text())
        attested |= {
            n for n, row in doc.items()
            if row.get("rows_match") and row.get("hash_match", True)
        }
    latest = json.loads(artifacts[-1].read_text())
    red = [
        n for n, row in latest.items()
        if not (row.get("rows_match") and row.get("hash_match", True))
    ]

    registry._load_all()
    all_q = list(registry.REGISTRY)  # registration order = priority
    pinned = [
        n for n, s in registry.REGISTRY.items()
        if not s.extended
        and n not in registry.ROTATE_IN
        and n not in registry.ROTATE_OUT
    ]
    never = [n for n in all_q if n not in attested and n not in red]
    slots = registry.DRIVER_CAP - len(pinned)
    rotate_in = red + never[: slots - len(red)]
    leftover = never[slots - len(red):]
    park = sorted(
        (registry.ROTATE_IN - set(rotate_in)) | registry.ROTATE_OUT
    )

    print(f"# pinned ({len(pinned)}), slots for rotation: {slots}")
    print(f"# latest artifact: {artifacts[-1].name}; red rows: {red}")
    print(f"\nROTATE_IN ({len(rotate_in)}):")
    for n in rotate_in:
        tag = "re-attest RED" if n in red else "first attestation"
        print(f'    "{n}",  # {tag}')
    print(f"\nleftover backlog for the round after ({len(leftover)}):")
    for n in leftover:
        print(f"    {n}")
    print(f"\nROTATE_OUT count (park everything else): {len(park)}")
    window = len(pinned) + len(rotate_in)
    print(f"\nwindow total: {window} of {registry.DRIVER_CAP}")
    if window > registry.DRIVER_CAP:
        print("!! OVER CAP -- trim ROTATE_IN")


if __name__ == "__main__":
    main()
