"""Temporal joins Spark lacks: as-of join and range join.

The reference implements neither (SURVEY §2.3: "Range/as-of/interval
joins: absent") — these are the brief's "custom operators" slot,
expressed as compositions of existing DataFrame ops so Catalyst keeps
choosing the physical strategy:

- **as-of join**: union the two sides tagged, one window pass per
  partition key ordered by time carrying the last right-side row
  forward (``last(..., ignorenulls)``) — a single shuffle on the key,
  no per-row range probe; the classic scalable Spark formulation.
- **range join**: equi-join on coarse time buckets (each left row
  exploded over the buckets its window can touch) + exact filter — the
  shuffle is on (key, bucket), pair work is output-sensitive instead of
  the O(n·m) broadcast-nested-loop Spark would otherwise plan for a
  pure inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(left: DataFrame, right: DataFrame, on,
               leftTimeCol: str, rightTimeCol: str,
               tolerance: float | None = None,
               rightCols=None, suffix: str = "_right") -> DataFrame:
    """For each left row, attach the most recent right row with
    right.time <= left.time (backward as-of), per join key.

    ``tolerance``: max allowed staleness in seconds (older matches →
    null). ``rightCols``: right columns to carry (default: all non-key,
    non-time).
    """
    on = [on] if isinstance(on, str) else list(on)
    rcols = rightCols or [c for c in right.columns
                          if c not in on and c != rightTimeCol]
    lt = F.col(leftTimeCol).cast("timestamp_ltz").cast("double")
    rt = F.col(rightTimeCol).cast("timestamp_ltz").cast("double")

    tagged_l = left.select(
        *on, lt.alias("__t"), F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in rcols + [rightTimeCol]]
                                  ).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    # right rows whose time casts to NULL (null / unparseable) must
    # not participate: NULL sorts FIRST ascending, so such a row would
    # become the "most recent" match for every left row preceding all
    # genuine right times
    right = right.filter(
        F.col(rightTimeCol).cast("timestamp_ltz").isNotNull())
    tagged_r = right.select(
        *on, rt.alias("__t"), F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]
                                 ).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in rcols + [rightTimeCol]]).alias("__r"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    # right rows sort before left rows at equal time → "<=" semantics
    w = (Window.partitionBy(*on)
         .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1)
    match = F.col("__last_r")
    if tolerance is not None:
        rt_matched = (match[rightTimeCol].cast("timestamp_ltz").cast("double"))
        match = F.when(F.col("__t") - rt_matched <= float(tolerance), match)
    return out.select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[match[c].alias(c + suffix) for c in rcols + [rightTimeCol]],
    )


def range_join(left: DataFrame, right: DataFrame, on,
               leftTimeCol: str, rightTimeCol: str,
               lower: float, upper: float,
               bucket: float | None = None, suffix: str = "_right") -> DataFrame:
    """All (left, right) pairs with key equality and
    ``lower <= right.time - left.time <= upper`` (seconds).

    ``bucket`` (seconds) controls the coarse equi-join granularity;
    defaults to the window span.
    """
    on = [on] if isinstance(on, str) else list(on)
    span = upper - lower
    bucket = float(bucket or max(span, 1.0))
    lt = F.col(leftTimeCol).cast("timestamp_ltz").cast("double")
    rt = F.col(rightTimeCol).cast("timestamp_ltz").cast("double")

    lo_bucket = F.floor((lt + lower) / bucket).cast("long")
    hi_bucket = F.floor((lt + upper) / bucket).cast("long")
    lhs = left.withColumn("__lt", lt).withColumn(
        "__bucket", F.explode(F.sequence(lo_bucket, hi_bucket)))
    rhs = right.select(
        *[F.col(c).alias(c + suffix) for c in right.columns],
        rt.alias("__rt"),
        F.floor(rt / bucket).cast("long").alias("__bucket_r"),
    )
    cond = [lhs["__bucket"] == rhs["__bucket_r"]] + [
        lhs[k] == rhs[k + suffix] for k in on]
    delta = F.col("__rt") - F.col("__lt")
    return (lhs.join(rhs, cond)
            .filter((delta >= lower) & (delta <= upper))
            .drop("__lt", "__rt", "__bucket", "__bucket_r"))
