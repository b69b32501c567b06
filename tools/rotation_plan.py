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
- STALENESS REFRESH (round-8 verdict item 5): spare window slots are
  filled with the OLDEST-green queries (smallest most-recent-green
  round, registration order as tie-break). Rationale: the HUGEINT
  episode (r4/r5) proved the local harness can be blind to
  representation-level drift the driver's hash sees; a query last
  driver-attested six rounds of code churn ago carries silent risk
  that one idle window slot re-buys for free.
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
    last_green: dict[str, int] = {}  # query -> newest green round
    for p in artifacts:
        doc = json.loads(p.read_text())
        rnd = int(p.stem.split("_r")[-1])
        for n, row in doc.items():
            if row.get("rows_match") and row.get("hash_match", True):
                attested.add(n)
                last_green[n] = max(last_green.get(n, 0), rnd)
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
    # staleness refresh: spare slots -> oldest-green queries first
    # (pinned queries re-attest every round anyway; skip them)
    reg_order = {n: i for i, n in enumerate(all_q)}
    stale = sorted(
        (n for n in all_q
         if n in last_green and n not in pinned
         and n not in rotate_in),
        key=lambda n: (last_green[n], reg_order[n]),
    )
    refresh = stale[: slots - len(rotate_in)]
    rotate_in += refresh
    park = sorted(
        (registry.ROTATE_IN - set(rotate_in)) | registry.ROTATE_OUT
    )

    print(f"# pinned ({len(pinned)}), slots for rotation: {slots}")
    print(f"# latest artifact: {artifacts[-1].name}; red rows: {red}")
    print(f"\nROTATE_IN ({len(rotate_in)}):")
    for n in rotate_in:
        tag = (
            "re-attest RED" if n in red
            else f"staleness refresh (last green r{last_green[n]})"
            if n in refresh
            else "first attestation"
        )
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
