"""Vector / array column functions.

Parity targets: reference ``core/.../stages/udfs.scala:20-34``
(``get_value_at``, ``to_vector``), ``core/.../core/utils/SlicerFunctions.scala:12-62``,
``vw/.../VectorZipper.scala:16-42``. Re-expressed as Catalyst
expressions (``vector_to_array`` / ``array_to_vector`` / ``slice`` /
``zip_with``) — JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def get_value_at(vec: Column | str, index: int) -> Column:
    """Element i of an ML vector column (reference udfs.get_value_at)."""
    from pyspark.ml.functions import vector_to_array

    return vector_to_array(_c(vec))[index]


def to_vector(arr: Column | str) -> Column:
    """array<numeric> → ML dense vector (reference udfs.to_vector)."""
    from pyspark.ml.functions import array_to_vector

    return array_to_vector(_c(arr))


def slice_vector(vec: Column | str, indices: Sequence[int]) -> Column:
    """Select the listed slots of a vector → dense vector (reference
    SlicerFunctions)."""
    from pyspark.ml.functions import array_to_vector, vector_to_array

    arr = vector_to_array(_c(vec))
    return array_to_vector(F.array(*[arr[int(i)] for i in indices]))


def vector_zip(*cols: Column | str) -> Column:
    """Zip scalar columns into an array (reference VectorZipper)."""
    return F.array(*[_c(c) for c in cols])


def slice_map(m: Column | str, keys: Sequence) -> Column:
    """Select the listed keys of a map column → dense vector of their
    (numeric) values, in key-list order (reference SlicerFunctions
    map overload, core/utils/SlicerFunctions.scala:12-62)."""
    from pyspark.ml.functions import array_to_vector

    col = _c(m)
    return array_to_vector(
        F.array(*[col[k].cast("double") for k in keys]))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<double> columns — pure zip_with/aggregate,
    vectorizable by codegen."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<numeric> columns (cast to double).

    ONE aggregate pass accumulating (dot, ||a||2, ||b||2) together —
    the dot/norm composition traversed (and re-cast) both arrays three
    times per row, which tripled the hot cost on O(pairs) join filters
    like semantic_dedup. Each accumulator adds in the same element
    order as the separate aggregates did, so values are bit-identical
    (norms still combine as sqrt(na)·sqrt(nb))."""
    ad = F.transform(_c(a), lambda x: x.cast("double"))
    bd = F.transform(_c(b), lambda x: x.cast("double"))
    zero = F.struct(F.lit(0.0).alias("d"), F.lit(0.0).alias("na"),
                    F.lit(0.0).alias("nb"))
    acc = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: F.struct(
            x.alias("x"), y.alias("y"))),
        zero,
        lambda s, v: F.struct(
            (s["d"] + v["x"] * v["y"]).alias("d"),
            (s["na"] + v["x"] * v["x"]).alias("na"),
            (s["nb"] + v["y"] * v["y"]).alias("nb")),
    )
    return acc["d"] / (F.sqrt(acc["na"]) * F.sqrt(acc["nb"]))


def vector_dim(df, vecCol: str) -> int:
    """Dimension of an ``array<numeric>`` column, from the first
    non-null row — with a real error instead of the opaque
    ``None[0]``/``len(None)`` TypeError that ``.first()[0]`` raises on
    an empty frame or a NULL leading row."""
    row = df.select(vecCol).filter(F.col(vecCol).isNotNull()).first()
    if row is None:
        raise ValueError(
            f"cannot infer vector dimension: column '{vecCol}' has no "
            f"non-null rows")
    return len(row[0])
