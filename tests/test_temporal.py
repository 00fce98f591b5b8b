"""As-of + range join semantics (hand-checked tiny timelines)."""

import pytest
from pyspark.sql import functions as F

from mmlspark_spark.operators.temporal import as_of_join, range_join


@pytest.fixture(scope="module")
def timeline(spark):
    left = spark.createDataFrame(
        [("u1", "2020-01-01 10:00:00", "c1"),
         ("u1", "2020-01-01 12:00:00", "c2"),
         ("u2", "2020-01-01 09:00:00", "c3")],
        ["user", "t", "click"]).withColumn("t", F.col("t").cast("timestamp"))
    right = spark.createDataFrame(
        [("u1", "2020-01-01 09:30:00", "s1"),
         ("u1", "2020-01-01 11:00:00", "s2"),
         ("u3", "2020-01-01 08:00:00", "s3")],
        ["user", "rt", "tag"]).withColumn("rt", F.col("rt").cast("timestamp"))
    return left, right


def test_as_of_backward_latest_match(timeline):
    left, right = timeline
    out = as_of_join(left, right, on="user", leftTimeCol="t",
                     rightTimeCol="rt")
    got = {r.click: r.tag_right for r in out.collect()}
    assert got == {"c1": "s1",   # 10:00 → latest signup 09:30
                   "c2": "s2",   # 12:00 → 11:00
                   "c3": None}   # u2 has no signup


def test_as_of_exact_time_matches(spark):
    left = spark.createDataFrame([("u", "2020-01-01 10:00:00", "l")],
                                 ["user", "t", "v"]).withColumn(
        "t", F.col("t").cast("timestamp"))
    right = spark.createDataFrame([("u", "2020-01-01 10:00:00", "r")],
                                  ["user", "rt", "tag"]).withColumn(
        "rt", F.col("rt").cast("timestamp"))
    out = as_of_join(left, right, on="user", leftTimeCol="t",
                     rightTimeCol="rt").collect()[0]
    assert out.tag_right == "r"  # <= semantics: equal time matches


def test_as_of_tolerance(timeline):
    left, right = timeline
    out = as_of_join(left, right, on="user", leftTimeCol="t",
                     rightTimeCol="rt", tolerance=45 * 60)
    got = {r.click: r.tag_right for r in out.collect()}
    assert got["c1"] == "s1"   # 30 min stale, within 45 min
    assert got["c2"] is None   # 60 min stale → nulled


def test_range_join_bounds(timeline):
    left, right = timeline
    out = range_join(left, right, on="user", leftTimeCol="t",
                     rightTimeCol="rt", lower=-3600.0, upper=3600.0)
    pairs = {(r.click, r.tag_right) for r in out.collect()}
    # c1@10:00: s1@09:30 (-30m) and s2@11:00 (+60m) both within ±1h
    assert ("c1", "s1") in pairs and ("c1", "s2") in pairs
    # c2@12:00: s2@11:00 within; s1@09:30 outside
    assert ("c2", "s2") in pairs and ("c2", "s1") not in pairs
    assert all(c != "c3" for c, _ in pairs)  # u2 never matches


def test_range_join_bucket_invariance(timeline):
    left, right = timeline
    a = {(r.click, r.tag_right) for r in range_join(
        left, right, "user", "t", "rt", -3600.0, 3600.0,
        bucket=600.0).collect()}
    b = {(r.click, r.tag_right) for r in range_join(
        left, right, "user", "t", "rt", -3600.0, 3600.0,
        bucket=7200.0).collect()}
    assert a == b  # bucket granularity never changes semantics
