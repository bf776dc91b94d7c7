"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
row-count + column names + order-insensitive value comparison with
columns sorted by name.
"""

from __future__ import annotations

import math
from typing import Any

import pandas as pd


def _canon_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and collapse ULP noise left after the queries' own ROUND
        return round(v, 9) + 0.0
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def compare(spark_df, duck_rel) -> list[str]:
    """Returns a list of mismatch descriptions (empty == parity)."""
    sp = spark_df.toPandas()
    dk = duck_rel.df()
    problems: list[str] = []
    if sorted(sp.columns) != sorted(dk.columns):
        problems.append(f"columns differ: spark={sorted(sp.columns)} duck={sorted(dk.columns)}")
        return problems
    if len(sp) != len(dk):
        problems.append(f"row count differs: spark={len(sp)} duck={len(dk)}")
    a, b = canon_rows(sp), canon_rows(dk)
    # repr-strict, like the driver's value hash: int 5 vs float 5.0
    # compare == but hash differently, so plain list equality hides
    # engine dtype skew (e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64)
    if repr(a) != repr(b):
        only_spark = [r for r in a if r not in set(map(tuple, b))][:5]
        only_duck = [r for r in b if r not in set(map(tuple, a))][:5]
        detail = (
            f"spark-only={only_spark} duck-only={only_duck}"
            if only_spark or only_duck
            else "values == but reprs differ (dtype skew, e.g. int vs float)"
        )
        problems.append(
            f"values differ (cols sorted {sorted(sp.columns)}): {detail}"
        )
    return problems
