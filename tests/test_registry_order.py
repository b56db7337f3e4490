"""The driver checks the first 50 entries of ``queries()`` in iteration
order — these tests pin the window's invariants so a refactor can't
silently push a query family out of the correctness gate."""

from vena_etl_tool_spark import registry


def test_window_names_are_registered_and_unique():
    specs = registry.all_specs()
    assert len(set(registry.DRIVER_WINDOW)) == len(registry.DRIVER_WINDOW)
    missing = [n for n in registry.DRIVER_WINDOW if n not in specs]
    assert not missing


def test_window_is_exactly_the_first_entries():
    names = list(registry.queries())
    assert tuple(names[: len(registry.DRIVER_WINDOW)]) == registry.DRIVER_WINDOW


def test_window_has_no_oracle_less_queries():
    # The driver records `no_oracle` as an ERROR row — a rows-only query in
    # the checked window is a guaranteed red slot (VERDICT r2 item #4).
    specs = registry.all_specs()
    rows_only = [n for n in registry.DRIVER_WINDOW if specs[n].oracle is None]
    assert not rows_only, f"oracle-less queries burn driver slots: {rows_only}"


def test_rotation_completes_oracle_backed_coverage():
    # (union of all prior rounds' driver-green rows) ∪ the current window
    # must cover every oracle-backed query — full-registry driver
    # coverage (VERDICT r3 item #1: residue 0). Globbed, so each new
    # CORRECTNESS_r*.json is picked up without editing this test.
    import glob
    import json
    import os

    green: set[str] = set()
    for path in glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")
    ):
        with open(path) as f:
            green |= {n for n, v in json.load(f).items() if v.get("hash_match")}
    specs = registry.all_specs()
    oracle_backed = {n for n, s in specs.items() if s.oracle is not None}
    residue = sorted(oracle_backed - green - set(registry.DRIVER_WINDOW))
    # Residue must be exactly the declared rotation carry-over (queries
    # registered after this round's window froze), and small (< 20).
    assert residue == sorted(registry.ROTATION_RESIDUE), (
        f"undeclared driver-coverage residue: "
        f"{sorted(set(residue) ^ set(registry.ROTATION_RESIDUE))}"
    )
    # r10: the window froze at round start with the full r9 residue (15)
    # seated plus 35 single-green picks from the 45-query r5-evidence
    # cohort — zero spare seats — so the residue list reopens EMPTY and
    # accumulates only operators added during r10. Bound: after a green
    # r10 run the r11 window = residue + the 10 deferred double-green r5
    # picks + oldest r6-evidence picks (49 queries), so cap r10 residue
    # at 15.
    assert len(registry.ROTATION_RESIDUE) <= 15


def test_window_holds_at_least_50():
    assert len(registry.DRIVER_WINDOW) == 50
    assert len(registry.all_specs()) >= 50


def test_operators_md_inventory_matches_registry():
    """VERDICT r10 #5: the generated OPERATORS.md header count must equal
    the live registry so the inventory can never silently drift again
    (r10 shipped a 286-header doc against a 287-query registry)."""
    import os
    import re

    from vena_etl_tool_spark.registry import all_specs

    path = os.path.join(os.path.dirname(__file__), "..", "OPERATORS.md")
    with open(path) as f:
        text = f.read()
    m = re.search(r"^(\d+) queries;", text, re.M)
    assert m, "OPERATORS.md header count line missing"
    specs = all_specs()
    assert int(m.group(1)) == len(specs)
    # every registered query appears as a table row (and vice versa: the
    # row count matches, so nothing extra is listed either)
    rows = re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.M)
    assert sorted(rows) == sorted(specs)
