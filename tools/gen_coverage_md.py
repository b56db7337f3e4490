"""Generate docs/COVERAGE.md — per-query driver-evidence history.

Merges every CORRECTNESS_r*.json in the repo root with the current
registry: for each registered query, which rounds produced a driver
hash-green row, whether it sits in the CURRENT driver window, and its
check class (oracle vs rows-only). This is the audit trail behind the
rotation policy: every oracle-backed query must show either an earlier
green round or current-window membership (tests/test_registry_order.py
asserts the same invariant; this file makes it human-readable).

Run: python tools/gen_coverage_md.py
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


def main() -> int:
    specs = all_specs()
    rounds: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        tag = os.path.basename(path).replace("CORRECTNESS_", "").replace(".json", "")
        with open(path) as f:
            rounds[tag] = json.load(f)
    window = set(DRIVER_WINDOW)
    lines = [
        "# COVERAGE — driver-evidence history per query",
        "",
        f"{len(specs)} registered queries × driver rounds "
        f"({', '.join(rounds)}). ✓ = hash-green driver row that round; "
        "· = not in that round's 50-query window; ✗ = checked and failed. "
        "`window` = in the CURRENT `registry.DRIVER_WINDOW` (next driver "
        "run re-checks it). rows-only queries can never earn a driver "
        "hash row — their evidence is the invariant suites in tests/.",
        "",
        "| query | check | " + " | ".join(rounds) + " | window |",
        "|---|---|" + "---|" * (len(rounds) + 1),
    ]
    n_green = 0
    for name, spec in specs.items():
        cells = []
        any_green = False
        for tag, data in rounds.items():
            row = data.get(name)
            if row is None:
                cells.append("·")
            elif row.get("hash_match"):
                cells.append("✓")
                any_green = True
            else:
                cells.append("✗")
        kind = "oracle" if spec.oracle is not None else "rows-only"
        n_green += any_green
        lines.append(
            f"| `{name}` | {kind} | "
            + " | ".join(cells)
            + f" | {'yes' if name in window else ''} |"
        )
    oracle_backed = sum(1 for s in specs.values() if s.oracle is not None)
    uncovered = [
        n
        for n, s in specs.items()
        if s.oracle is not None
        and n not in window
        and not any(rounds[t].get(n, {}).get("hash_match") for t in rounds)
    ]
    undeclared = [n for n in uncovered if n not in ROTATION_RESIDUE]
    lines += [
        "",
        f"Summary: {oracle_backed} oracle-backed; {n_green} hold ≥1 driver-"
        f"green row across recorded rounds; declared rotation carry-over "
        f"(leads the next round's window): "
        f"{list(ROTATION_RESIDUE) or 'none'}; oracle-backed queries with "
        f"neither a green row, window membership, nor a residue "
        f"declaration: **{len(undeclared)}**"
        + (f" ({undeclared})" if undeclared else ""),
        "",
    ]
    out = os.path.join(_REPO, "docs", "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        f"wrote {out}: {len(specs)} queries, "
        f"declared_residue={len(uncovered) - len(undeclared)}, "
        f"undeclared_uncovered={len(undeclared)}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
