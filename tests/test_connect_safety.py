"""Spark Connect safety invariant (SCALE.md §connect): operator and
streaming code must not touch driver-JVM-only APIs. The one sanctioned
use is `_shared.spread_small`'s guarded `defaultParallelism` probe
(wrapped in try/except with a Connect fallback) and session BOOTSTRAP
code a Connect client never runs (`session.py`). A regression here would
make the engine silently classic-only again."""

from __future__ import annotations

import pathlib
import re

_PKG = pathlib.Path(__file__).resolve().parent.parent / "vena_etl_tool_spark"

# APIs that do not exist on a Connect session (or require the driver JVM)
_FORBIDDEN = re.compile(
    r"\.sparkContext|\.rdd\b|setJobGroup|statusTracker|cancelJobsWithTag"
    r"|addJobTag|removeJobTag|_jvm|_jsc|_jdf"
)

# path-fragment -> why it is allowed
_SANCTIONED = {
    "operators/_shared.py": "guarded defaultParallelism probe with Connect fallback",
    "session.py": "classic-session bootstrap; a Connect client never runs it",
    "pipeline/jobs.py": "setJobDescription nicety behind try/except",
    "__main__.py": "--explain AQE-final plan via _jdf, guarded with a "
    "df.explain fallback for Connect",
}


def test_no_unguarded_driver_jvm_apis():
    offenders: list[str] = []
    for path in sorted(_PKG.rglob("*.py")):
        rel = path.relative_to(_PKG).as_posix()
        if any(frag in rel for frag in _SANCTIONED):
            continue
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if _FORBIDDEN.search(line):
                offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, (
        "driver-JVM-only API outside the sanctioned files "
        f"(see SCALE.md §connect):\n" + "\n".join(offenders)
    )


def test_sanctioned_files_use_guards():
    """The allowlisted files must keep their guards: every sparkContext /
    _jdf touch outside session.py sits inside the BODY of a try block —
    verified by AST enclosure, not a substring scan (a call placed after
    a closed try: used to slip past the old heuristic)."""
    import ast

    for frag in ("operators/_shared.py", "pipeline/jobs.py", "__main__.py"):
        tree = ast.parse((_PKG / frag).read_text())
        # guarded = line spans of every `try:` suite (the protected body,
        # not the handlers — an API call in `except:` is unguarded too).
        guarded: list[tuple[int, int]] = []
        for node in ast.walk(tree):
            if isinstance(node, ast.Try):
                body_end = max(n.end_lineno or n.lineno for n in node.body)
                guarded.append((node.body[0].lineno, body_end))
        offenders = []
        for node in ast.walk(tree):
            if isinstance(node, ast.Attribute) and node.attr in (
                "sparkContext",
                "_jdf",
            ):
                line = node.lineno
                if not any(lo <= line <= hi for lo, hi in guarded):
                    offenders.append(f"{frag}:{line}: .{node.attr}")
        assert not offenders, (
            "driver-JVM API outside a try-block body in a sanctioned file:\n"
            + "\n".join(offenders)
        )
