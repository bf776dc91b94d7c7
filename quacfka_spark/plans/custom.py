"""Custom fields and custom record transforms — reference D11/D12.

- ``CustomField`` mirrors /root/reference/custom.go:33-61: a user-declared
  extra column (name, type, cardinality, default/expression) appended to
  the generated schema. In Spark that's ``withColumn`` — the "computed in
  the user's unmarshal func" case becomes a column expression or UDF.
- ``CustomTransform`` mirrors ``CustomArrow{CustomFunc, DestinationTable}``
  (/root/reference/quacfka.go:21-24): an arbitrary batch-shaped
  ``DataFrame -> DataFrame`` function whose output lands in its own
  destination table. Multiple are allowed; each writes independently
  (duck.go:472-498).
"""

from __future__ import annotations

import enum
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Cardinality(enum.Enum):
    # reference custom.go:8-16
    OPTIONAL = "optional"
    REQUIRED = "required"
    REPEATED = "repeated"


# reference custom.go:33-39 type enum -> Spark DDL types
_TYPE_MAP = {
    "BOOL": "boolean",
    "BYTES": "binary",
    "STRING": "string",
    "INT64": "bigint",
    "FLOAT64": "double",
}


@dataclass(frozen=True)
class CustomField:
    name: str
    dtype: str  # BOOL | BYTES | STRING | INT64 | FLOAT64 (custom.go:33-39)
    cardinality: Cardinality = Cardinality.OPTIONAL
    # value expression; None -> typed NULL column (populated downstream)
    expr: Column | None = None

    def spark_type(self) -> str:
        base = _TYPE_MAP[self.dtype.upper()]
        return f"array<{base}>" if self.cardinality is Cardinality.REPEATED else base

    def column(self) -> Column:
        col = self.expr if self.expr is not None else F.lit(None)
        return col.cast(self.spark_type())


def with_custom_fields(df: DataFrame, fields: list[CustomField]) -> DataFrame:
    """Append declared extra columns — reference ``WithCustomFields``
    (custom.go:64-75, applied quacfka.go:162-182)."""
    for f_ in fields:
        df = df.withColumn(f_.name, f_.column())
    return df


@dataclass
class CustomTransform:
    """Named batch transform routed to its own destination table —
    reference ``CustomArrow`` (quacfka.go:21-24, duck.go:472-498)."""

    destination_table: str
    fn: Callable[[DataFrame], DataFrame]

    def apply(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


@dataclass
class TransformRegistry:
    transforms: list[CustomTransform] = field(default_factory=list)

    def add(self, destination_table: str, fn: Callable[[DataFrame], DataFrame]) -> None:
        self.transforms.append(CustomTransform(destination_table, fn))

    def apply_all(self, df: DataFrame) -> dict[str, DataFrame]:
        return {t.destination_table: t.apply(df) for t in self.transforms}
