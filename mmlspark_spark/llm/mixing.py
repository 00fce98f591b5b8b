"""Deterministic domain mixing for training-data curation.

Training mixtures are specified as *weights over domains* ("50% web,
20% books, ...") plus a token/document budget; the curation job must
turn that spec into a concrete per-domain sample of the corpus. The
Pile, CCNet, and every post-Gopher data recipe has this stage. This
module is its Spark-native form, with the two execution regimes a
100 TB corpus needs:

- ``exact=True``: per-domain quotas hit exactly. One window shuffle
  partitioned by domain, rows ranked by a deterministic integer hash
  of their id (a uniform-but-reproducible sample, not a head() —
  heads correlate with ingest order). Right when the budget or the
  domain count is modest.
- ``exact=False`` (the scale path): quotas converted to per-domain
  keep-*rates* and applied as a pure map-side filter — zero
  shuffles, linear scan, quota hit within sampling error. Right for
  "keep 3.1% of CommonCrawl" at 100 TB, where a global window sort
  per domain is pointless work.

Both modes draw the same deterministic uniform from the row id — a
Lehmer/MINSTD step, ``((id % m) * 48271 + seed) % m`` with
m = 2³¹−1 — so results are reproducible across runs, partitionings,
and engines (exact integer arithmetic; the catalog verifies the
exact mode hash-for-hash against DuckDB). Driver state is one row
per domain (the observed counts that set quotas/rates), never
O(rows).

Weights are normalized over the full ``weights`` dict. Domains in
the data but absent from ``weights`` get weight 0 and are dropped —
loudly, via the ``observedDroppedDomains`` attribute after
``transform`` plans (sibling of the dedup caps' observed-drop
metrics: silent corpus loss is how mixtures go wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from mmlspark_spark.core.base import Transformer

_M = 2147483647  # 2**31 - 1 (MINSTD modulus)
_A = 48271


def _uniform_key(idCol, seed: int):
    """Deterministic pseudo-uniform in [0, m) from an integer id —
    exact int64 arithmetic, portable across engines. TWO multiplicative
    steps: ids are typically small and sequential, and one step never
    wraps the modulus for id < m/a ≈ 44k (u would then be monotone in
    id and far from uniform — every small id passes every rate
    filter); the second step wraps for every id ≥ 1. Intermediates are
    bounded by (m-1)·a < 2⁶³.

    Honest limit: the two steps collapse algebraically to ONE multiply
    by a² mod m, so u is LINEAR in the id — sequential ids form an
    arithmetic progression mod m. That is exactly what a deterministic
    RANKING or rate filter needs (a wrapping permutation uncorrelated
    with ingest order), but NOT what narrow threshold bands need:
    ``HashSplitter`` uses the nonlinear ``_mixed_uniform_key``
    instead."""
    # pmod, not %: Spark's % keeps the dividend's sign, so a negative
    # id (xxhash64-derived ids are negative half the time) would yield
    # a negative u that passes EVERY rate filter. pmod == % for
    # non-negative ids, so the engine-parity contract (and the
    # catalog oracle, which uses % on non-negative doc ids) holds.
    # cast to long FIRST: an int-typed id column would otherwise make
    # s0 * _A a 32-bit multiply, which overflows (ANSI throw) for any
    # s0 > 2^31/48271 ≈ 44k — the int64 bound below assumes 64-bit
    # intermediates.
    s0 = F.pmod(F.col(idCol).cast("long") + F.lit(seed), F.lit(_M))
    u = F.pmod(F.pmod(s0 * _A, F.lit(_M)) * _A, F.lit(_M))
    # NULL-id guard inside the expression (no pre-pass scan): a NULL
    # id would otherwise propagate u=NULL, which sorts FIRST under the
    # exact mode's window (preferentially selected!) and silently
    # fails every rate filter — both wrong, both invisible. Fail the
    # job at the first NULL instead.
    return F.when(F.col(idCol).isNull(), F.raise_error(F.lit(
        f"deterministic sampling key '{idCol}' contains a NULL id — "
        "drop or fill NULL ids first")).cast("long")).otherwise(u)


class DomainMixer(Transformer):
    """Resample a corpus to a target domain mixture.

    ``weights``: dict domain-value → relative weight (normalized over
    the dict). ``totalBudget``: number of rows the mixed corpus should
    contain. Per-domain quota = floor(normalized-weight × budget),
    capped at the domain's available rows (under-filled domains do NOT
    reallocate their slack — a mixture spec is a ceiling per domain,
    not a packing problem; re-run with a bigger budget if the total
    matters more than the ratios).

    ``idCol`` must be a unique integer id (the sampling key).

    ``temperature``: instead of explicit ``weights``, derive them from
    the observed counts as count^α (α<1 flattens the mixture toward
    rare domains — the multilingual temperature-sampling recipe from
    XLM-R/mT5; α=1 reproduces the corpus, α=0 is uniform-over-domains).
    Every observed domain participates in the weighting; a domain
    whose integer quota still floors to 0 (tiny weight share × modest
    budget) contributes no rows and is REPORTED via
    ``observedDroppedDomains`` — never silently lost. For
    engine-reproducible quotas the float weight is QUANTIZED to an
    integer — ``floor(count^α × 10⁶)`` — and the quota is the exact
    integer ``budget × w_d // Σw``: after the one quantized pow, all
    arithmetic is integral, so an oracle can replay it bit-for-bit.
    Mutually exclusive with ``weights``.
    """

    def __init__(self, domainCol: str = "source", idCol: str = "doc_id",
                 weights: dict | None = None, totalBudget: int = 1000,
                 exact: bool = True, seed: int = 42,
                 temperature: float | None = None):
        if temperature is not None and weights:
            raise ValueError(
                "pass either explicit `weights` or `temperature` "
                "(count^alpha derived weights), not both")
        if temperature is not None and not 0.0 <= temperature <= 1.0:
            raise ValueError(
                f"temperature must be in [0, 1], got {temperature}")
        super().__init__(domainCol=domainCol, idCol=idCol,
                         weights=dict(weights or {}),
                         totalBudget=totalBudget, exact=exact, seed=seed,
                         temperature=temperature)
        self.observedDroppedDomains: list = []

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.domainCol, self.idCol)
        if not self.weights and self.temperature is None:
            raise ValueError(
                "DomainMixer needs a non-empty `weights` dict (domains "
                "missing from it are DROPPED) or a `temperature`")
        if not schema[self.idCol].dataType.typeName() in (
                "integer", "long", "short"):
            raise ValueError(
                f"DomainMixer idCol '{self.idCol}' must be an integer "
                f"id column (the deterministic sampling key); got "
                f"{schema[self.idCol].dataType.simpleString()}")
        return schema

    def _quotas(self, df: DataFrame) -> tuple[dict, dict]:
        """Observed per-domain counts → quota per domain. Driver state
        is O(#domains). Quotas use exact rational arithmetic —
        ``int(w / wsum * budget)`` in floats truncates below the
        documented floor for dozens of innocent weight combos (e.g.
        29/100 × 100 → 28.999… → 28); ``Fraction(str(w))`` reads the
        weight's decimal literal exactly, so floor(w/Σw·budget) is
        exact for integer and decimal weights alike. No min() against
        the observed count: the exact mode's ``rn <= quota`` can never
        select more rows than a domain has, and the rate mode's
        keep-everything rate ≥ 1 is equally harmless."""
        from fractions import Fraction

        counts = {r[0]: r[1] for r in
                  df.groupBy(self.domainCol).count().collect()}
        if self.temperature is not None:
            # count^α quantized to an integer weight; thereafter the
            # quota is PURE integer arithmetic (budget·w // Σw), so
            # both engines land on identical quotas. math.pow is the
            # only float step; the ×10⁶ quantization makes a cross-
            # libm last-ulp difference change the weight only when
            # count^α·10⁶ sits within one ulp of an integer.
            import math

            w_int = {d: int(math.floor(
                math.pow(c, self.temperature) * 1_000_000))
                for d, c in counts.items()}
            tot = sum(w_int.values())
            quotas = {d: self.totalBudget * w // tot
                      for d, w in w_int.items()}
            # every domain participates in WEIGHTING, but a quota can
            # still floor to 0 (tiny weight share × modest budget) —
            # that domain contributes no rows, which is silent corpus
            # loss unless reported (the exact failure mode the class
            # docstring warns about)
            self.observedDroppedDomains = sorted(
                (d for d, q in quotas.items() if q == 0),
                key=lambda d: (d is None, d if d is not None else ""))
            return quotas, counts
        # NULL is a legal domain value (groupBy counts it as a group);
        # a bare sorted() would TypeError comparing None with str
        self.observedDroppedDomains = sorted(
            (d for d in counts if d not in self.weights),
            key=lambda d: (d is None, d if d is not None else ""))
        wsum = sum(Fraction(str(w)) for w in self.weights.values())
        return {
            d: int(Fraction(str(w)) / wsum * self.totalBudget)
            for d, w in self.weights.items() if d in counts
        }, counts

    def _transform(self, df: DataFrame) -> DataFrame:
        quotas, counts = self._quotas(df)
        u = _uniform_key(self.idCol, self.seed)
        if self.exact:
            w = (Window.partitionBy(self.domainCol)
                 .orderBy(u, F.col(self.idCol)))
            qcol = self._domain_case(quotas, F.lit(0))
            return (df.withColumn("__mix_rn", F.row_number().over(w))
                    .filter(F.col("__mix_rn") <= qcol)
                    .drop("__mix_rn"))
        # rate mode: quota → keep-rate over the observed count; the
        # filter is one map stage, no shuffle anywhere
        rates = {d: q / counts[d] for d, q in quotas.items()
                 if counts.get(d)}
        rcol = self._domain_case(rates, F.lit(0.0))
        return df.filter((u.cast("double") / _M) < rcol)

    def _domain_case(self, mapping: dict, default):
        # eqNullSafe, not ==: _quotas deliberately treats NULL as a
        # legal domain value, so a user-listed None key must match NULL
        # rows instead of falling through to the default quota/rate
        # (== against NULL is never true and would silently drop them).
        col = default
        for d, v in mapping.items():
            col = F.when(F.col(self.domainCol).eqNullSafe(F.lit(d)),
                         F.lit(v)).otherwise(col)
        return col


def _mixed_uniform_key(idCol, seed: int):
    """Nonlinear deterministic uniform in [0, m) — HashSplitter's key.

    The plain Lehmer key is LINEAR in the id (the two multiplicative
    steps collapse to one multiply by A² mod m), so sequential ids map
    to an arithmetic progression mod m: a lattice, fine for RANKING
    (DomainMixer needs only a deterministic permutation) but wrong for
    THRESHOLD splits, where a small batch of consecutive ids can leave
    a narrow band (a 5% test split) completely empty. Interleaving an
    xorshift between the multiplies breaks the linearity while staying
    engine-portable (integer *, %, xor, >> exist in both Spark and
    DuckDB) and ANSI-safe (intermediates < 2⁴⁷)."""
    idc = F.col(idCol).cast("long")
    h = F.pmod(idc + F.lit(seed), F.lit(_M))
    h = F.pmod(h * _A, F.lit(_M))
    h = h.bitwiseXOR(F.shiftright(h, 15))
    h = F.pmod(h * _A, F.lit(_M))
    h = h.bitwiseXOR(F.shiftright(h, 13))
    u = F.pmod(h, F.lit(_M))
    return F.when(F.col(idCol).isNull(), F.raise_error(F.lit(
        f"deterministic sampling key '{idCol}' contains a NULL id — "
        "drop or fill NULL ids first")).cast("long")).otherwise(u)


class HashSplitter(Transformer):
    """Deterministic train/val/test assignment from an integer id.

    The standard dataset-split contract for training pipelines: a
    row's split is a PURE FUNCTION of its id (a NONLINEAR variant of
    the Lehmer uniform — see ``_mixed_uniform_key`` for why threshold
    splits need one), so the assignment is reproducible
    across runs, partitionings, engines — and, critically, across
    corpus GROWTH: adding new documents never moves an existing
    document between splits (a ``randomSplit`` reshuffles everything
    every run, leaking yesterday's test set into today's train set).

    ``splits``: ordered dict name → fraction; fractions are read as
    exact decimals (``Fraction(str(f))``) and must sum to exactly 1.
    Split boundaries are exact integer thresholds on the uniform key —
    ``t_i = floor(cumulative_i × m)`` — so an oracle can replay the
    assignment bit-for-bit.

    Zero shuffles: the assignment is one CASE expression over a map
    stage. Per-split frames are ``df.filter(col(outputCol) == name)``
    — still shuffle-free.

    NULL ids FAIL the job (a ``raise_error`` branch in the same CASE —
    no extra scan or pre-pass): a NULL id has no hash, and letting it
    fall through the CASE would silently park every NULL row in the
    last split — a skewed-leakage bug that surfaces only at
    evaluation time. Drop or fill NULL ids first.

    Use a DIFFERENT ``seed`` than any id-keyed sampler upstream
    (``DomainMixer``, rate filters): both keys derive from the same
    (id+seed)·A first step, so a shared seed couples "sampled
    upstream" with the split band — observed emptying a 10% split
    entirely. The id-derived analog of reusing a PRNG seed.
    """

    def __init__(self, idCol: str = "doc_id", splits: dict | None = None,
                 outputCol: str = "split", seed: int = 42):
        from fractions import Fraction

        splits = dict(splits or
                      {"train": 0.9, "val": 0.05, "test": 0.05})
        if sum(Fraction(str(f)) for f in splits.values()) != 1:
            raise ValueError(
                f"split fractions must sum to exactly 1, got "
                f"{dict(splits)}")
        if any(Fraction(str(f)) <= 0 for f in splits.values()):
            raise ValueError("every split fraction must be > 0")
        super().__init__(idCol=idCol, splits=splits, outputCol=outputCol,
                         seed=seed)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.idCol)
        if schema[self.idCol].dataType.typeName() not in (
                "integer", "long", "short"):
            raise ValueError(
                f"HashSplitter idCol '{self.idCol}' must be an integer "
                f"id column; got "
                f"{schema[self.idCol].dataType.simpleString()}")
        return T.StructType(
            list(schema.fields)
            + [T.StructField(self.outputCol, T.StringType(), False)])

    def _transform(self, df: DataFrame) -> DataFrame:
        from fractions import Fraction

        u = _mixed_uniform_key(self.idCol, self.seed)
        names = list(self.splits)
        cum = Fraction(0)
        col = F.lit(names[-1])  # u < m always → last split is the else
        # build the CASE back-to-front so earlier splits win their
        # [t_{i-1}, t_i) interval
        thresholds = []
        for name in names[:-1]:
            cum += Fraction(str(self.splits[name]))
            thresholds.append((name, int(cum * _M)))  # floor: exact ints
        for name, t in reversed(thresholds):
            col = F.when(u < F.lit(t), F.lit(name)).otherwise(col)
        # NULL ids fail inside _uniform_key's guard — no pre-pass scan
        return df.withColumn(self.outputCol, col)
