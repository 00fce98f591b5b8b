"""Replicates the driver's correctness gate locally: run every catalog
query on Spark and its DuckDB oracle side-by-side, compare row counts +
values order-insensitively."""

import math

import duckdb
import pytest

from mmlspark_spark.plans.catalog import CATALOG

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


ORACLE_SPECS = [s for s in CATALOG.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in CATALOG.values() if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_query_matches_oracle(spark, sf_dir, spec):
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = sdf.collect()

    con = duck_con(sf_dir)
    ora = con.sql(spec.oracle)
    ocols = ora.columns
    orows = ora.fetchall()

    assert sorted(scols) == sorted(ocols), (
        f"{spec.name}: column mismatch {sorted(scols)} vs {sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{spec.name}: row count {len(srows)} vs oracle {len(orows)}"
    )
    a = _norm_rows(scols, [tuple(r) for r in srows])
    b = _norm_rows(ocols, orows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, (
        f"{spec.name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_query_runs(spark, sf_dir, spec):
    sdf = spec.fn(spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))


def test_window_priority_order_is_respected():
    """_ordered_specs must place priority-listed queries at the FRONT
    in list order — a membership-only sort key silently falls back to
    registration order and parks late-registered queries outside the
    driver's ~50-query window (the round-6 bug this pins)."""
    from mmlspark_spark.plans.catalog import _WINDOW_PRIORITY, _ordered_specs

    names = [s.name for s in _ordered_specs()]
    listed = [n for n in _WINDOW_PRIORITY if n in set(names)]
    assert names[:len(listed)] == listed
    # and every oracled query still precedes every rows-only query
    from mmlspark_spark.plans.catalog import CATALOG
    first_rows_only = min(
        i for i, n in enumerate(names) if CATALOG[n].oracle is None)
    assert all(CATALOG[n].oracle is not None
               for n in names[:first_rows_only])
