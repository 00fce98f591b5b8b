"""Golden-metric benchmark gates.

Parity: reference ``core/test/benchmarks/Benchmarks.scala:16-128``.
Golden CSVs live in ``tests/benchmarks/benchmarks_<suite>.csv`` with the
reference's exact header (``name,value,precision,higherIsBetter``).
Comparison matches ``compareBenchmark``: a new value may beat the golden
one freely, but may not be WORSE by more than ``precision``
(one-sided, direction per ``higherIsBetter``).

Regenerate goldens after an intentional model change with::

    GOLDEN_REGEN=1 python -m pytest tests/test_golden_metrics.py
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "benchmarks")


@dataclass
class Benchmark:
    name: str
    value: float
    precision: float
    higherIsBetter: bool = True


def verify_benchmarks(suite: str, new: list[Benchmark]) -> None:
    path = os.path.join(GOLDEN_DIR, f"benchmarks_{suite}.csv")
    if os.environ.get("GOLDEN_REGEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w", newline="") as f:
            f.write("name,value,precision,higherIsBetter\n")
            for b in new:
                f.write(f"{b.name},{b.value},{b.precision},"
                        f"{str(b.higherIsBetter).lower()}\n")
        return
    assert os.path.exists(path), \
        f"no golden file {path}; run with GOLDEN_REGEN=1 to create it"
    with open(path) as f:
        old = {r["name"]: r for r in csv.DictReader(f)}
    names = {b.name for b in new}
    assert names == set(old), \
        f"benchmark set changed: new-only={names - set(old)}, " \
        f"golden-only={set(old) - names}"
    for b in new:
        o = old[b.name]
        assert str(b.higherIsBetter).lower() == o["higherIsBetter"], \
            f"{b.name}: higherIsBetter mismatch"
        diff = b.value - float(o["value"])
        worse = -diff if b.higherIsBetter else diff
        assert worse < b.precision, (
            f"{b.name}: new value {b.value} is worse than golden "
            f"{o['value']} by more than {b.precision}")
