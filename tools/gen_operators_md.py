"""Generate OPERATORS.md — the full query inventory with oracle status.

Run: python tools/gen_operators_md.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vena_etl_tool_spark.registry import all_specs


def main() -> None:
    specs = all_specs()
    by_module = defaultdict(list)
    for spec in specs.values():
        by_module[spec.fn.__module__.split(".")[-1]].append(spec)

    lines = [
        "# OPERATORS — registered query inventory",
        "",
        f"{len(specs)} queries; every row is exposed through "
        "`__spark_entry__.queries()`. *oracle* = hash-checked against DuckDB "
        "at sf0.01 by the driver; *rows-only* ops carry invariant unit tests "
        "instead (tests/).",
        "",
        "The driver hash-checks the first 50 entries of `queries()` per "
        "round. `registry.DRIVER_WINDOW` pins that window explicitly — "
        "oracle-backed queries only (a rows-only entry would burn a slot as "
        "a guaranteed `no_oracle` red; test_window_has_no_oracle_less_queries)"
        " — and rotates across rounds so every oracle-backed query lands a "
        "driver-checked row; queries registered after a round's window froze "
        "are declared in `registry.ROTATION_RESIDUE` and rotate in next round "
        "(test_rotation_completes_oracle_backed_coverage). The local gate "
        "(`python -m vena_etl_tool_spark.testing`) diffs all "
        f"{len(specs)} every run.",
        "",
        "| query | module | check | tags | summary |",
        "|---|---|---|---|---|",
    ]
    for module in sorted(by_module):
        for spec in sorted(by_module[module], key=lambda s: s.name):
            check = "oracle" if spec.oracle else "rows-only"
            summary = (spec.doc.splitlines() or [""])[0].rstrip(".")
            lines.append(
                f"| `{spec.name}` | {module} | {check} | "
                f"{', '.join(spec.tags)} | {summary} |"
            )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md")
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    n_oracle = sum(1 for s in specs.values() if s.oracle)
    print(f"wrote {out}: {len(specs)} queries ({n_oracle} oracle-checked, "
          f"{len(specs) - n_oracle} rows-only)")


if __name__ == "__main__":
    main()
