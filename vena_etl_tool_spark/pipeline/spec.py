"""Pipeline specs — the engine's template catalog.

Reference parity: a Vena *template* is a server-side object that tells the
ETL service how to interpret an uploaded CSV; the client only lists and
introspects it (/root/reference/src/api/templates.js:47-82 list, :89-125
details; rendered at import.js:163-183, 200-207). Here the template becomes
a local, typed `PipelineSpec`: StructType + column mapping + target, with
fail-fast validation mirroring config validation
(/root/reference/src/config.js:28-34 — exit-before-work on bad config).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


class SpecError(ValueError):
    """Invalid or missing pipeline spec (reference: hard exit at
    /root/reference/src/config.js:31-33)."""


@dataclass(frozen=True)
class PipelineSpec:
    spec_id: str
    name: str
    description: str
    schema: T.StructType
    column_mapping: dict[str, str] = field(default_factory=dict)  # source → target
    target: str = ""  # output table/path the load lands in

    def validate(self) -> None:
        if not self.spec_id or not self.name:
            raise SpecError("spec_id and name are required")
        if not isinstance(self.schema, T.StructType) or not self.schema.fields:
            raise SpecError(f"spec {self.spec_id}: schema must be a non-empty StructType")
        src_cols = {f.name for f in self.schema.fields}
        unknown = set(self.column_mapping) - src_cols
        if unknown:
            raise SpecError(f"spec {self.spec_id}: mapping references unknown columns {sorted(unknown)}")

    def describe(self) -> dict:
        """Introspection payload (reference: GET /templates/{id} pretty-print,
        import.js:202-203) — schema as JSON plus mapping/target."""
        return {
            "id": self.spec_id,
            "name": self.name,
            "description": self.description,
            "schema": self.schema.jsonValue(),
            "column_mapping": dict(self.column_mapping),
            "target": self.target,
        }


class SpecRegistry:
    """In-process template catalog (list = A8, details = A9)."""

    def __init__(self) -> None:
        self._specs: dict[str, PipelineSpec] = {}

    def register(self, spec: PipelineSpec) -> PipelineSpec:
        spec.validate()
        self._specs[spec.spec_id] = spec
        return spec

    def list(self) -> list[PipelineSpec]:
        return sorted(self._specs.values(), key=lambda s: s.spec_id)

    def get(self, spec_id: str) -> PipelineSpec:
        try:
            return self._specs[spec_id]
        except KeyError:
            raise SpecError(f"unknown spec: {spec_id!r}; known: {sorted(self._specs)}") from None


def default_registry() -> SpecRegistry:
    """Registry preloaded with a lineitem-shaped CSV spec (the fixture
    ingest path) — the analog of the reference's default template id
    (env VENA_TEMPLATE_ID, /root/reference/src/config.js:12)."""
    reg = SpecRegistry()
    reg.register(
        PipelineSpec(
            spec_id="lineitem-csv",
            name="Lineitem CSV load",
            description="Typed ingest of lineitem-shaped CSV with quarantine",
            schema=T.StructType(
                [
                    T.StructField("l_orderkey", T.LongType()),
                    T.StructField("l_partkey", T.LongType()),
                    T.StructField("l_suppkey", T.LongType()),
                    T.StructField("l_linenumber", T.IntegerType()),
                    T.StructField("l_quantity", T.DoubleType()),
                    T.StructField("l_extendedprice", T.DoubleType()),
                    T.StructField("l_discount", T.DoubleType()),
                    T.StructField("l_tax", T.DoubleType()),
                    T.StructField("l_returnflag", T.StringType()),
                    T.StructField("l_linestatus", T.StringType()),
                    T.StructField("l_shipdate", T.TimestampNTZType()),
                ]
            ),
            target="lineitem_loaded",
        )
    )
    return reg
