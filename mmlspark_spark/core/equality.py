"""DataFrame equality with tolerance — the engine's test backbone.

Mirrors the reference's ``DataFrameEquality`` semantics (epsilon-tolerant
doubles, NaN == NaN, recursive over arrays/structs, optional
sort-before-compare — reference
``core/src/main/scala/org/apache/spark/ml/param/DataFrameParam.scala:17-80``)
as a pytest-friendly helper.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame


def _values_close(a: Any, b: Any, epsilon: float) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= epsilon * max(1.0, abs(fa), abs(fb))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(
            _values_close(x, y, epsilon) for x, y in zip(a, b)
        )
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_values_close(a[k], b[k], epsilon) for k in a)
    if hasattr(a, "asDict") and hasattr(b, "asDict"):
        return _values_close(a.asDict(recursive=True), b.asDict(recursive=True), epsilon)
    if hasattr(a, "toArray") and hasattr(b, "toArray"):  # ml vectors
        return _values_close(list(a.toArray()), list(b.toArray()), epsilon)
    return a == b


def _sort_key(row) -> str:
    return repr(sorted(row.asDict(recursive=True).items(), key=lambda kv: kv[0]))


def assert_df_equality(
    actual: DataFrame,
    expected: DataFrame,
    epsilon: float = 1e-4,
    sort: bool = True,
    check_schema: bool = True,
) -> None:
    if check_schema:
        a_names = [f.name for f in actual.schema.fields]
        e_names = [f.name for f in expected.schema.fields]
        assert a_names == e_names, f"column mismatch: {a_names} != {e_names}"
    a_rows, e_rows = actual.collect(), expected.collect()
    assert len(a_rows) == len(e_rows), f"row count {len(a_rows)} != {len(e_rows)}"
    if sort:
        a_rows = sorted(a_rows, key=_sort_key)
        e_rows = sorted(e_rows, key=_sort_key)
    for i, (ra, rb) in enumerate(zip(a_rows, e_rows)):
        assert _values_close(list(ra), list(rb), epsilon), (
            f"row {i} differs:\n  actual:   {ra}\n  expected: {rb}"
        )
