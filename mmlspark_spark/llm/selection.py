"""Data selection via importance resampling (DSIR).

Implements the DSIR recipe (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling", arXiv:2302.03169 — public
paper): fit bag-of-hashed-ngrams unigram+bigram distributions over a
small TARGET corpus (the domain you want more of) and the RAW pool,
score every raw document by its log importance weight

    log w(x) = sum_{g in grams(x)} [ log p_target(bucket(g))
                                     - log q_raw(bucket(g)) ]

with add-one-style smoothing, then resample without replacement via
the Gumbel top-k trick (key = log w / temperature + Gumbel(0,1); the
top-k keys are a weighted sample without replacement — Vieira 2014).

Scale shape (the 100 TB story):

- FIT is two explode → groupBy(bucket) aggregations whose shuffle
  width is bounded by ``buckets`` (not the corpus), reduced to a ONE
  ROW frame holding the length-``buckets`` log-ratio array — a few KB
  regardless of input size, assembled fully declaratively (no
  ``collect``).
- SCORING is map-only: the ratio row is broadcast (single-row BNLJ,
  the same pattern the engine's one-row stat frames use) and each
  document folds ``element_at(arr, bucket(gram))`` over its own gram
  array — zero shuffle, embarrassingly parallel.
- SELECTION: ``resample(k=...)`` is a global top-k
  (TakeOrderedAndProject — no global sort); for huge k use
  ``resample(fraction=...)``, which estimates the key threshold by
  ``approxQuantile`` and FILTERS map-side, so the selected set never
  funnels through the driver.

Determinism / oracle story: buckets are the low bits of Spark
``xxhash64`` (``buckets`` must be a power of two so signed-AND and
unsigned-MOD agree), the per-document fold runs in gram position
order (unigrams then bigrams), and the Gumbel noise derives from
``xxhash64(id, seed)`` — all replayable bit-exact in DuckDB via
``plans.duckdb_xxh``; the ``dsir_select`` catalog query verifies the
whole fit → score → resample pipeline hash-exact. Tokenization is
``pinned_tokens`` (the cross-engine whitespace class).

Reference parity note: the reference repo has no data-selection
operator; this is part of the engine's training-data-pipeline
extras (SURVEY.md LLM section), alongside the dedup/mixing family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mmlspark_spark.core.base import Model, Transformer
from mmlspark_spark.functions.text_quality import pinned_tokens

_TWO64 = float(1 << 64)


def _check_buckets(buckets: int) -> None:
    """Power-of-two contract: ``h & (buckets-1)`` is only a modulo
    for powers of two — anything else aliases buckets and silently
    corrupts every importance score. A real raise, not an assert
    (asserts vanish under ``python -O``)."""
    if buckets < 2 or buckets & (buckets - 1) != 0:
        raise ValueError("buckets must be a power of two (signed "
                         "bit-AND and unsigned modulo must agree)")


def hashed_grams(text: Column | str, buckets: int) -> Column:
    """``array<long>`` of hashed-ngram bucket ids for a document, in
    the pinned fold order (all unigrams, then all bigrams, each in
    position order). Bigrams join with a single space, so the bucket
    of ``("a","b")`` is ``xxhash64("a b") & (buckets-1)`` — string
    hashing keeps the feature space identical however the gram was
    produced. Map-side only."""
    _check_buckets(buckets)
    t = pinned_tokens(text)
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(t, 1, n1), F.slice(t, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    return F.transform(
        F.concat(t, bigrams),
        lambda g: F.xxhash64(g).bitwiseAND(F.lit(buckets - 1)))


# Source-size floor for persisting the fitted bucket-count frames:
# the ≤buckets-row histogram is consumed ~4x inside the ratio-row
# broadcast (tc/rc joins, the totals agg, the lr rows), and AQE does
# not reuse the exchange across those branches, so each consumer
# re-runs the corpus tokenize+explode. Above the floor that re-run
# dominates and the persist is mandatory; below it the cache
# materialization + read path costs MORE than the re-runs (r17 A/B at
# sf0.1, interleaved best/median: persist 1.86/2.12 s vs no-persist
# 1.68/1.78 s end-to-end on dsir_select). The cutover is derived from
# the INPUT SIZE estimate, never the core count, so cluster plans are
# unchanged — a 64 MB corpus explode already costs far more than one
# 1024-row cache write.
_PERSIST_SRC_MIN_BYTES = 64 << 20


def _persist_counts_if_heavy(counts: DataFrame, src: DataFrame):
    """(frame, handles) — persist a bucket-count frame only when its
    source corpus is big enough that re-running the explode per
    consumer costs more than the cache round-trip."""
    try:
        size = int(src._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:  # pragma: no cover - stats always exist in practice
        size = None
    if size is None or size >= _PERSIST_SRC_MIN_BYTES:
        from mmlspark_spark.core.cache import persist_intermediate

        cached = persist_intermediate(counts)
        return cached, [cached]
    return counts, []


class DSIRModel(Model):
    """Fitted DSIR importance model: a one-row DataFrame holding the
    length-``buckets`` log-ratio array. ``transform`` appends
    ``scoreCol`` (the log importance weight); :meth:`resample` draws
    the weighted sample."""

    def __init__(self, ratioRow: DataFrame = None, idCol: str = "doc_id",  # noqa: D107
                 textCol: str = "text", buckets: int = 4096,
                 seed: int = 42, scoreCol: str = "dsir_score"):
        _check_buckets(buckets)  # a directly-constructed model too
        super().__init__(idCol=idCol, textCol=textCol, buckets=buckets,
                         seed=seed, scoreCol=scoreCol)
        self.ratioRow = ratioRow

    def transform_schema(self, schema):
        import pyspark.sql.types as T

        self._require_cols(schema, self.idCol, self.textCol)
        return T.StructType(
            list(schema.fields)
            + [T.StructField(self.scoreCol, T.DoubleType(), True)])

    def _score(self) -> Column:
        grams = hashed_grams(self.textCol, self.buckets)
        return F.aggregate(
            F.transform(grams, lambda b: F.element_at(
                F.col("__dsir_arr"), (b + 1).cast("int"))),
            F.lit(0.0), lambda a, x: a + x)

    def _transform(self, df: DataFrame) -> DataFrame:
        # NULL text carries no evidence either way: dropped, like the
        # dedup family (a NULL gram array would yield a NULL score
        # that then poisons every downstream rank).
        from mmlspark_spark.core.cache import propagate_intermediates

        return propagate_intermediates(
            self.ratioRow,
            df.filter(F.col(self.textCol).isNotNull())
            .crossJoin(F.broadcast(self.ratioRow))
            .withColumn(self.scoreCol, self._score())
            .drop("__dsir_arr"))

    def _gumbel_key(self, temperature: float) -> Column:
        # u in (0,1): signed xxhash64(id, seed) scaled by 2^-64 and
        # recentered — both steps exact IEEE doubles, so DuckDB
        # replays them bit-for-bit from the same hash. TWO-SIDED
        # clamp, closing both holes:
        # - floor 2^-64: h = −2^63 maps to u = 0 → −log(−log 0) =
        #   −inf (one h value; the row would sort UNDER every finite
        #   key forever);
        # - ceiling 1 − 2^-53: the 512 h values in [2^63−512, 2^63)
        #   ROUND to 2^63.0 under the int64→double cast, so u = 1.0 →
        #   −log(−log 1) = +inf in Spark while DuckDB raises on
        #   ln(0.0) — the row would win every top-k AND crash the
        #   oracle. 1 − 2^-53 is the largest double below 1; the
        #   subtraction is exact on both engines.
        # greatest/least are the same IEEE ops on both engines, so the
        # oracle replays both clamps.
        h = F.xxhash64(F.col(self.idCol), F.lit(self.seed).cast("long"))
        u = F.least(
            F.greatest(h.cast("double") / F.lit(_TWO64) + F.lit(0.5),
                       F.lit(1.0 / _TWO64)),
            F.lit(1.0 - 2.0 ** -53))
        return (F.col(self.scoreCol) / F.lit(float(temperature))
                - F.log(-F.log(u)))

    def resample(self, df: DataFrame, k: int | None = None,
                 fraction: float | None = None,
                 temperature: float = 1.0) -> DataFrame:
        """Weighted sample without replacement (Gumbel top-k).

        ``k``: exact top-k — TakeOrderedAndProject, for k that fits a
        driver-bounded result. ``fraction``: scale lane — the key
        threshold is estimated with ``approxQuantile`` and applied as
        a map-side FILTER (selected count is approximate, selection
        never leaves the executors). Keys round to 6dp BEFORE ranking
        (ties broken by id) so float noise at the boundary cannot
        flip membership between engines."""
        if (k is None) == (fraction is None):
            raise ValueError("exactly one of k / fraction required")
        from mmlspark_spark.core.cache import propagate_intermediates

        scored = self._transform(df)
        keyed = propagate_intermediates(scored, (
            scored
            .withColumn(self.scoreCol, F.round(self.scoreCol, 6))
            .withColumn("gumbel_key",
                        F.round(self._gumbel_key(temperature), 6))))
        if k is not None:
            return propagate_intermediates(
                keyed, keyed.orderBy(F.desc("gumbel_key"),
                                     F.col(self.idCol)).limit(k))
        # approxQuantile is an eager action over the full scored
        # frame and the returned filter re-reads it: without a
        # persist the tokenize+hash+fold pipeline (the dominant cost)
        # would run TWICE. Handle attached for the caller to release.
        from mmlspark_spark.core.cache import (
            attach_intermediates,
            persist_intermediate,
        )

        keyed = persist_intermediate(keyed)
        qs = keyed.stat.approxQuantile(
            "gumbel_key", [1.0 - fraction], 0.001)
        if not qs:  # empty frame: no quantile, nothing to select
            return attach_intermediates(
                propagate_intermediates(keyed, keyed.filter(F.lit(False))),
                keyed)
        return attach_intermediates(
            propagate_intermediates(
                keyed, keyed.filter(F.col("gumbel_key") >= F.lit(qs[0]))),
            keyed)


class DSIRSelector(Transformer):
    """Fits :class:`DSIRModel` from a target corpus and a raw pool.

    Not a single-frame Estimator: like ``IncrementalDeduplicator``,
    the operator's contract is inherently two-frame —
    ``fit(target, raw)``. ``transform`` on the bare selector is the
    identity (it exists so the class slots into pipeline position
    declarations); use ``fit`` then the model.
    """

    def __init__(self, idCol: str = "doc_id", textCol: str = "text",  # noqa: D107
                 buckets: int = 4096, smoothing: float = 1.0,
                 seed: int = 42, scoreCol: str = "dsir_score"):
        _check_buckets(buckets)
        super().__init__(idCol=idCol, textCol=textCol, buckets=buckets,
                         smoothing=smoothing, seed=seed, scoreCol=scoreCol)

    def transform_schema(self, schema):
        return schema

    def _transform(self, df: DataFrame) -> DataFrame:
        return df

    def feature_counts(self, df: DataFrame) -> DataFrame:
        """(bucket, cnt) hashed-ngram histogram — shuffle width is
        ``buckets``-bounded whatever the corpus size."""
        return (df.filter(F.col(self.textCol).isNotNull())
                .select(F.explode(hashed_grams(self.textCol, self.buckets))
                        .alias("bucket"))
                .groupBy("bucket").agg(F.count("*").alias("cnt")))

    def fit(self, target: DataFrame, raw: DataFrame) -> DSIRModel:
        # Each histogram feeds BOTH `tot` and the ratio array below
        # (and the ratio row is rebuilt per broadcast): without a
        # persist every consumer re-runs the corpus explode+groupBy.
        # The frames are ≤ buckets rows; the persist is gated on the
        # SOURCE size (see _PERSIST_SRC_MIN_BYTES) — for a small corpus
        # the cache round-trip costs more than the re-runs it saves.
        tc, h1 = _persist_counts_if_heavy(
            self.feature_counts(target).withColumnRenamed("cnt", "tc"),
            target)
        rc, h2 = _persist_counts_if_heavy(
            self.feature_counts(raw).withColumnRenamed("cnt", "rc"), raw)
        return self._fit_from_counts(target.sparkSession, tc, rc, h1 + h2)

    def fit_with_indicator(self, raw: DataFrame, targetCond) -> DSIRModel:
        """Fit where the target corpus is ``raw.filter(targetCond)`` —
        the common in-pool case (select English-like docs from the
        pool). ``fit(raw.filter(cond), raw)`` tokenizes and
        bucket-hashes the pool twice (once for the target histogram,
        once for the raw histogram); this path computes BOTH
        histograms from ONE explode+groupBy pass, carrying a 0/1
        indicator per exploded gram — at 100 TB that is one corpus
        scan instead of two. Counts (and therefore the fitted
        log-ratio array) are identical to
        ``fit(raw.filter(targetCond), raw)`` by construction:
        ``tc = Σ indicator`` over the same grams the target pass
        would have exploded."""
        counts, handles = _persist_counts_if_heavy(
            raw.filter(F.col(self.textCol).isNotNull())
            .select(F.explode(hashed_grams(self.textCol, self.buckets))
                    .alias("bucket"),
                    F.when(targetCond, F.lit(1)).otherwise(F.lit(0))
                    .alias("__t"))
            .groupBy("bucket")
            .agg(F.count("*").alias("rc"), F.sum("__t").alias("tc")),
            raw)
        return self._fit_from_counts(
            raw.sparkSession, counts.select("bucket", "tc"),
            counts.select("bucket", "rc"), handles)

    def _fit_from_counts(self, spark, tc: DataFrame, rc: DataFrame,
                         handles: list | None = None) -> DSIRModel:
        B, s = self.buckets, float(self.smoothing)
        base = spark.range(B).select(F.col("id").alias("bucket"))
        full = (base
                .join(tc, "bucket", "left")
                .join(rc, "bucket", "left")
                .select("bucket",
                        F.coalesce("tc", F.lit(0)).alias("tc"),
                        F.coalesce("rc", F.lit(0)).alias("rc")))
        tot = full.agg(F.sum("tc").alias("__T"), F.sum("rc").alias("__R"))
        lr = (F.log((F.col("tc") + F.lit(s))
                    / (F.col("__T").cast("double") + F.lit(s * B)))
              - F.log((F.col("rc") + F.lit(s))
                      / (F.col("__R").cast("double") + F.lit(s * B))))
        # one row, array ordered by bucket — sort_array on (bucket, lr)
        # structs pins the order regardless of partitioning
        ratio_row = (full.crossJoin(F.broadcast(tot))
                     .select(F.struct("bucket", lr.alias("lr")).alias("s"))
                     .agg(F.array_sort(F.collect_list("s")).alias("ss"))
                     .select(F.transform("ss", lambda x: x["lr"])
                             .alias("__dsir_arr")))
        if handles:
            from mmlspark_spark.core.cache import attach_intermediates

            ratio_row = attach_intermediates(ratio_row, *handles)
        return DSIRModel(ratioRow=ratio_row, idCol=self.idCol,
                         textCol=self.textCol, buckets=B,
                         seed=self.seed, scoreCol=self.scoreCol)
