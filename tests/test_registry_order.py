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


def test_window_spans_every_operator_module():
    specs = registry.all_specs()
    all_modules = {s.fn.__module__ for s in specs.values()}
    window_modules = {
        specs[n].fn.__module__ for n in registry.DRIVER_WINDOW[:50]
    }
    uncovered = sorted(m.rsplit(".", 1)[-1] for m in all_modules - window_modules)
    assert not uncovered, f"families outside the driver's 50-query window: {uncovered}"


def test_window_holds_at_least_50():
    assert len(registry.DRIVER_WINDOW) == 50
    assert len(registry.all_specs()) >= 50
