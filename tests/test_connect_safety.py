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
    _jdf touch outside session.py sits inside a try block."""
    for frag in ("operators/_shared.py", "pipeline/jobs.py", "__main__.py"):
        text = (_PKG / frag).read_text()
        for m in re.finditer(r"\.sparkContext|\._jdf", text):
            before = text[: m.start()].rsplit("def ", 1)[-1]
            assert "try:" in before, f"{frag}: unguarded driver-JVM API use"
