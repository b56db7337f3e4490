"""Query registry — the single source of truth behind ``__spark_entry__.py``.

Every operator from SURVEY.md §2 Part B registers here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are SQL-expressible) the equivalent ANSI SQL that DuckDB runs on the same
parquet tables. The driver diffs the two (row count + schema +
order-insensitive value hash) at sf=0.01; tests/test_oracle.py runs the same
diff locally.

Discipline (FIXTURES.md "oracle-comparison discipline"):
- every computed column is aliased identically on both sides;
- money-ish double aggregates are cast to DECIMAL on both sides;
- no nondeterministic functions in oracle-checked queries;
- LIMIT/top-k queries use a total order (unique tiebreak column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module (registration happens at import)."""
    from . import operators  # noqa: F401  (imports all submodules)
    from . import streaming  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
