"""Compute the NEXT round's driver window from evidence — no hand math.

Two consecutive verdicts (r8 "49 seats / 1 spare", r9 "14 + 36") caught
arithmetic typos in hand-written window plans. This tool derives the
composition mechanically from the same sources the audits use:

  1. the current ``ROTATION_RESIDUE`` verbatim (first driver rows —
     every operator added this round takes its first green here);
  2. re-validation picks filling the remaining seats from the
     oldest-evidence oracle-backed queries, ranked by
     (newest green round ASC, total green count ASC, name ASC) —
     fewest-evidence-first, the r10 freeze rule.

Evidence = every CORRECTNESS_r*.json in the repo root, PLUS (optionally)
the assumption that the CURRENT window goes green this round
(--assume-current-green), which is how the plan for round N+1 is written
during round N.

Prints a ready-to-paste ``DRIVER_WINDOW`` tuple and the deferred-cohort
summary. Purely informational — registry.py remains the source of truth.

Usage: python tools/gen_next_window.py [--assume-current-green]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vena_etl_tool_spark.registry import (  # noqa: E402
    DRIVER_WINDOW,
    ROTATION_RESIDUE,
    all_specs,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SEATS = 50


def evidence() -> dict[str, list[int]]:
    """query -> sorted list of rounds with a hash-green driver row."""
    greens: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as f:
            for name, v in json.load(f).items():
                if v.get("hash_match"):
                    greens.setdefault(name, []).append(rnd)
    return {k: sorted(v) for k, v in greens.items()}


def main() -> int:
    assume_current = "--assume-current-green" in sys.argv
    specs = all_specs()
    oracle_backed = {n for n, s in specs.items() if s.oracle is not None}
    greens = evidence()
    max_round = max((r for v in greens.values() for r in v), default=0)
    if assume_current:
        for n in DRIVER_WINDOW:
            greens.setdefault(n, []).append(max_round + 1)

    residue = list(ROTATION_RESIDUE)
    unknown = [n for n in residue if n not in oracle_backed]
    if unknown:
        raise SystemExit(f"residue entries not oracle-backed: {unknown}")

    pool = sorted(
        (n for n in oracle_backed if n not in residue),
        key=lambda n: (
            greens.get(n, [0])[-1] if n in greens else -1,  # newest green
            len(greens.get(n, [])),  # total greens
            n,
        ),
    )
    fillers = pool[: WINDOW_SEATS - len(residue)]
    deferred_boundary = (
        greens.get(fillers[-1], [0])[-1] if fillers and fillers[-1] in greens else -1
    )
    window = residue + fillers

    print(f"# {len(residue)} residue + {len(fillers)} re-validation = "
          f"{len(window)} seats")
    print("DRIVER_WINDOW: tuple[str, ...] = (")
    print(f"    # --- (1) the full ROTATION_RESIDUE ({len(residue)}), "
          "first driver rows ---")
    for n in residue:
        print(f'    "{n}",')
    print(f"    # --- (2) {len(fillers)} oldest-evidence re-validation picks"
          " (newest-green ASC, green-count ASC, name ASC) ---")
    for n in fillers:
        ev = greens.get(n, [])
        print(f'    "{n}",  # greens: {ev or "never"}')
    print(")")
    nxt = [
        n for n in pool[len(fillers):]
        if (greens.get(n, [0])[-1] if n in greens else -1) == deferred_boundary
    ]
    print(f"\n# deferred at the same evidence boundary (lead the round after):")
    for n in nxt:
        print(f"#   {n}  greens: {greens.get(n, [])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
